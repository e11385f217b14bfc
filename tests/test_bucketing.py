"""Bucketed co-located joins (io/bucketing.py): the written-once-bucketed
layout must plan its equi-join with NO Exchange on either side (the
shuffle was paid at write time), and produce exactly the shuffled join's
rows."""
from __future__ import annotations

import re

import pytest

from post_ocr_corretion_spark.io.bucketing import cobucketed_join, write_bucketed
from post_ocr_corretion_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.01"


def test_cobucketed_join_is_shuffle_free_and_exact(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(orders, "t_orders_b", "o_orderkey", buckets=8, path=str(tmp_path / "o"))
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", buckets=8, path=str(tmp_path / "l"))

    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the merge path
    try:
        j = cobucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert not re.search(r"^\(\d+\) Exchange\b", plan, re.M), (
            "bucketed join still shuffles:\n" + plan
        )
        got = sorted(map(tuple, j.collect()))
        want = sorted(map(tuple, orders.join(lineitem, "o_orderkey").collect()))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_write_bucketed_validates_bucket_count(spark):
    with pytest.raises(ValueError, match="buckets"):
        write_bucketed(spark.range(1), "t_x", "id", buckets=0)
