"""Bit-parity of the unrolled (codegen-able) dot products against the
HOF left-fold forms (r9 optimization: similarity.dot(dim=…), _dot_lits,
_centroid_scores(unroll=True)).

The unrolled expressions must produce BIT-identical doubles — the ANN
family's gated hashes round cosines to 4 decimals, so any float drift
could flip a rounding tie. The contract: the unroll is the identical
IEEE-754 add sequence (left-assoc, seeded 0.0), and a per-row size guard
falls back to the HOF fold whenever the array width mismatches.
"""
from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.similarity import (
    _centroid_scores,
    _dot_lits,
    brute_force_topk,
    dot,
    hyperplanes,
    lsh_bucket,
)


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(200):
        a = [rnd.uniform(-1, 1) for _ in range(8)]
        b = [rnd.uniform(-1, 1) for _ in range(8)]
        rows.append((i, a, b))
    # adversarial rows: negative zeros, exact zeros, subnormals, huge/tiny
    rows.append((200, [-0.0] * 8, [0.0] * 8))
    rows.append((201, [1e-310] * 8, [1e308 / 8] * 8))
    rows.append((202, [0.1] * 8, [-0.1] * 8))
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>")


def test_dot_unrolled_bit_identical(vecs):
    got = vecs.select(
        dot(F.col("a"), F.col("b")).alias("hof"),
        dot("a", "b", dim=8).alias("unr"),
    ).collect()
    assert len(got) == 203
    for r in got:
        assert _bits(r.hof) == _bits(r.unr), (r.hof, r.unr)


def test_dot_guard_falls_back_on_width_mismatch(vecs):
    # declare dim=12 against 8-wide arrays: the guard must route every
    # row through the HOF fold — results equal the plain HOF, no nulls
    # introduced, no ANSI error raised
    got = vecs.select(
        dot(F.col("a"), F.col("b")).alias("hof"),
        dot("a", "b", dim=12).alias("unr"),
    ).collect()
    for r in got:
        assert _bits(r.hof) == _bits(r.unr)


def test_dot_lits_and_centroid_scores_bit_identical(vecs):
    consts = [round(x, 4) for x in hyperplanes(1, 8, seed=99)[0]]
    cents = [[round(x, 4) for x in p] for p in hyperplanes(3, 8, seed=42)]
    # zero-norm / subnormal-norm rows are excluded: _centroid_scores
    # divides by the norm and ANSI mode raises DIVIDE_BY_ZERO in BOTH
    # forms (callers only score non-degenerate vectors)
    got = vecs.filter(~F.col("id").isin(200, 201)).select(
        _dot_lits(F.col("a"), consts, False).alias("hof"),
        _dot_lits("a", consts, True).alias("unr"),
        _centroid_scores(F.col("a"), cents, False).alias("cs_hof"),
        _centroid_scores("a", cents, True).alias("cs_unr"),
        lsh_bucket(F.col("a"), cents, False).alias("bkt_hof"),
        lsh_bucket("a", cents, True).alias("bkt_unr"),
    ).collect()
    for r in got:
        assert _bits(r.hof) == _bits(r.unr)
        assert [_bits(x) for x in r.cs_hof] == [_bits(x) for x in r.cs_unr]
        assert r.bkt_hof == r.bkt_unr


def test_null_and_nan_handling_matches(spark):
    rows = [
        (0, None, [1.0, 2.0]),
        (1, [1.0, None], [1.0, 2.0]),
        (2, [float("nan"), 1.0], [1.0, 2.0]),
        (3, [1.0], [1.0, 2.0]),  # width mismatch between a and b
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    got = df.select(
        dot(F.col("a"), F.col("b")).alias("hof"),
        dot("a", "b", dim=2).alias("unr"),
    ).collect()
    for r in got:
        if r.hof is None or (isinstance(r.hof, float) and math.isnan(r.hof)):
            assert r.unr is None or math.isnan(r.unr)
        else:
            assert _bits(r.hof) == _bits(r.unr)


def test_brute_force_topk_rows_identical_with_dim(spark):
    from tests.conftest import SF_CORRECTNESS

    emb = (
        spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    base = sorted(map(tuple, brute_force_topk(emb, q, k=5).collect()))
    unr = sorted(map(tuple, brute_force_topk(emb, q, k=5, dim=64).collect()))
    assert base == unr


def test_round4_boundary_equivalence(spark):
    """_round4_ge(raw, t) must keep EXACTLY the rows
    round(raw,4) >= t keeps — swept over boundary-adjacent doubles and
    several thresholds (incl. non-multiples of 1e-4 and negatives)."""
    from post_ocr_corretion_spark.operators.similarity import _round4_ge

    vals = []
    for base in (0.34995, 0.35005, 0.9, -1.0, 0.35125, -0.00005, 0.0):
        for k in range(-3, 4):
            vals.append(base + k * 5e-17)  # ulp-scale jitter
            vals.append(base + k * 1e-5)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for t in (0.35, 0.9, -1.0, 0.351234, 0.0, -0.5, 1e-4, -1e-4):
        got = df.select(
            (F.round(F.col("x"), 4) >= t).alias("via_round"),
            _round4_ge(F.col("x"), t).alias("via_bound"),
        ).collect()
        for r, v in zip(got, vals):
            assert r.via_round == r.via_bound, (t, repr(v), r)
