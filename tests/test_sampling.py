"""stratified_sample_exact + pack_greedy (operators/sampling.py) edge
cases; the row-for-row oracle parity runs in test_entry_queries."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.operators.sampling import pack_greedy, stratified_sample_exact


def test_stratified_counts_are_exact(spark):
    rows = [(f"s{i % 3}", i) for i in range(100)]  # strata of 34/33/33
    df = spark.createDataFrame(rows, "stratum string, id long")
    out = stratified_sample_exact(df, "stratum", 0.5, "id")
    counts = {r.stratum: r.n for r in out.groupBy("stratum").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"s0": 17, "s1": 16, "s2": 16}  # floor(0.5·n) exactly
    # deterministic: same choice every run
    a = sorted(r.id for r in out.collect())
    b = sorted(r.id for r in stratified_sample_exact(df, "stratum", 0.5, "id").collect())
    assert a == b
    assert stratified_sample_exact(df, "stratum", 0.0, "id").count() == 0
    assert stratified_sample_exact(df, "stratum", 1.0, "id").count() == 100
    with pytest.raises(ValueError, match="frac"):
        stratified_sample_exact(df, "stratum", 1.5, "id")


def test_pack_greedy_semantics(spark):
    rows = [
        ("a", 1, 400), ("a", 2, 500),   # batch 1 (900)
        ("a", 3, 200),                   # batch 2 (would be 1100)
        ("a", 4, 5000),                  # oversized → own batch 3
        ("a", 5, 100),                   # batch 4 (after the oversized one)
        ("b", 1, 1000),                  # exactly the budget → batch 1
        ("b", 2, 1),                     # batch 2
    ]
    df = spark.createDataFrame(rows, "shard string, ord long, sz long")
    got = {
        (r.shard, r.ord): r.batch_id
        for r in pack_greedy(df, "shard", "ord", "sz", budget=1000).collect()
    }
    assert got == {
        ("a", 1): 1, ("a", 2): 1, ("a", 3): 2, ("a", 4): 3, ("a", 5): 4,
        ("b", 1): 1, ("b", 2): 2,
    }
    with pytest.raises(ValueError, match="budget"):
        pack_greedy(df, "shard", "ord", "sz", budget=0)
