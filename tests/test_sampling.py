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


def test_salted_sample_identical_rows_and_hot_stratum_parallel(spark):
    """VERDICT r4 item 7: a 50%-hot stratum must not serialize the
    sample. The salted form returns byte-identical rows (same md5 total
    order, recovered via per-bucket offsets) while its heavy window
    partitions by (stratum, hex-prefix bucket) — the hot stratum's sort
    spreads over 16 tasks instead of one."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.sampling import stratified_sample_exact_salted

    # 50%-hot stratum: 'hot' has 2000 of 4000 rows
    rows = [("hot" if i < 2000 else f"s{i % 7}", i) for i in range(4000)]
    df = spark.createDataFrame(rows, "stratum string, id long").repartition(8)
    plain = sorted((r.stratum, r.id) for r in stratified_sample_exact(df, "stratum", 0.3, "id").collect())
    salted = sorted(
        (r.stratum, r.id)
        for r in stratified_sample_exact_salted(df, "stratum", 0.3, "id").collect()
    )
    assert salted == plain
    assert sum(1 for s, _ in plain if s == "hot") == 600  # floor(0.3·2000) exactly
    # parallelism evidence: the window's partition key (stratum, bucket)
    # splits the hot stratum into ≥8 non-trivial groups, each ≤ ~1/8 of
    # the stratum — no single task ever sorts the whole hot stratum
    key = F.md5(F.col("id").cast("string"))
    sizes = [
        r.n
        for r in df.filter(F.col("stratum") == "hot")
        .groupBy(F.substring(key, 1, 1).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 16 and max(sizes) < 2000 / 16 * 1.6

    # the plan itself: the big window runs over (stratum, _bkt), never
    # stratum alone
    plan = stratified_sample_exact_salted(df, "stratum", 0.3, "id")._jdf.queryExecution().executedPlan().toString()
    import re

    row_number_windows = [
        ln for ln in plan.splitlines() if "row_number" in ln and "windowspecdefinition" in ln
    ]
    assert row_number_windows and all(
        re.search(r"windowspecdefinition\([^)]*_bkt", ln) for ln in row_number_windows
    ), f"expected the row_number window partitioned by (stratum, _bkt) in:\n{plan[:2000]}"


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


def test_salted_sample_null_stratum_row_identity(spark):
    """ADVICE r5 (low): NULL strata (and a NULL id → NULL md5 bucket)
    form their own partition in the plain windowed form; the salted
    join must be null-safe on both keys or those rows silently vanish.
    Row identity must hold including the NULL stratum."""
    from post_ocr_corretion_spark.operators.sampling import (
        stratified_sample_exact,
        stratified_sample_exact_salted,
    )

    rows = [(None if i % 4 == 0 else f"s{i % 3}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "stratum string, id long")
    key = lambda t: (t[0] is not None, t[0] or "", t[1])  # None-safe total order
    plain = sorted(
        ((r.stratum, r.id) for r in stratified_sample_exact(df, "stratum", 0.5, "id").collect()),
        key=key,
    )
    salted = sorted(
        ((r.stratum, r.id) for r in stratified_sample_exact_salted(df, "stratum", 0.5, "id").collect()),
        key=key,
    )
    assert salted == plain
    assert sum(1 for s, _ in plain if s is None) == 25  # floor(0.5·50): NULL stratum sampled, not dropped
