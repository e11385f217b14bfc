"""Skew handling: salted repartition balances a host-skewed url space;
two-phase salted aggregation matches the naive groupBy."""
from __future__ import annotations

from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.skew import (
    host_of,
    salted_repartition,
    two_phase_count_by_host,
)
from post_ocr_corretion_spark.sources.webpages import webpages


def _pages(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return webpages(docs).select("url")


def test_host_skew_exists_and_salting_balances(spark):
    pages = _pages(spark).cache()
    by_host = pages.groupBy(host_of(F.col("url")).alias("h")).count().collect()
    top = max(r["count"] for r in by_host)
    total = sum(r["count"] for r in by_host)
    assert top / total > 0.4  # the synthetic corpus IS host-skewed

    # partitioning BY HOST pins the hot host to one partition…
    by_host_parts = (
        pages.repartition(16, host_of(F.col("url")))
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    worst_host = max(r["count"] for r in by_host_parts)
    # …salted (url-hash) repartition spreads it uniformly
    salted_parts = (
        salted_repartition(pages, "url", 16)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    worst_salted = max(r["count"] for r in salted_parts)
    assert worst_salted < worst_host
    assert worst_salted <= total / 16 * 1.5  # near-uniform


def test_two_phase_salted_agg_matches_naive(spark):
    pages = _pages(spark)
    naive = {
        r.host: r.n
        for r in pages.groupBy(host_of(F.col("url")).alias("host"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.host: r.n_pages
        for r in two_phase_count_by_host(pages, ["h0.example.com"], buckets=8).collect()
    }
    assert salted == naive
