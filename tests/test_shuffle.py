"""Deterministic training-shard shuffle (operators/shuffle.py): seeded
md5 placement is reproducible, dense per shard, partitioning-independent,
and actually permutes."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.shuffle import deterministic_shuffle


def _layout(df):
    return sorted((r.doc_id, r.shard, r.pos_in_shard) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(0, 300)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat_ws("-", F.lit("t"), "doc_id"))
    )


def test_positions_dense_and_shards_in_range(spark, docs):
    out = deterministic_shuffle(docs, n_shards=8, seed="a")
    rows = out.select("shard", "pos_in_shard").collect()
    assert {r.shard for r in rows} <= set(range(8))
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), f"shard {shard} not dense"
    assert sum(len(v) for v in by_shard.values()) == 300


def test_same_seed_reproduces_and_partitioning_independent(spark, docs):
    a = _layout(deterministic_shuffle(docs, n_shards=8, seed="s1"))
    b = _layout(deterministic_shuffle(docs.repartition(13), n_shards=8, seed="s1"))
    assert a == b


def test_different_seed_permutes(spark, docs):
    a = _layout(deterministic_shuffle(docs, n_shards=8, seed="s1"))
    b = _layout(deterministic_shuffle(docs, n_shards=8, seed="s2"))
    assert a != b


def test_single_shard_is_a_total_order(spark, docs):
    out = deterministic_shuffle(docs, n_shards=1, seed="x")
    rows = out.select("shard", "pos_in_shard").collect()
    assert {r.shard for r in rows} == {0}
    assert sorted(r.pos_in_shard for r in rows) == list(range(300))


def test_validation():
    with pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(None, n_shards=0)


def test_null_ids_are_explicitly_unplaced(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c"), (None, "d")],
        "doc_id long, text string",
    )
    out = {r.text: (r.shard, r.pos_in_shard) for r in deterministic_shuffle(docs, n_shards=4, seed="z").collect()}
    assert out["b"] == (None, None) and out["d"] == (None, None)
    placed = [v for k, v in out.items() if k in ("a", "c")]
    assert all(s is not None and p is not None for s, p in placed)
