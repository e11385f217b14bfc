"""BM25 retrieval (operators/bm25.py): hand-computed scores with the
exact rounding chain, ranking/limit semantics, validation."""
from __future__ import annotations

import math
from decimal import Decimal

import pytest

from post_ocr_corretion_spark.operators.bm25 import bm25_topk

K1, B = 1.5, 0.75


def _score(tf: int, dl: int, n: int, df: int, avgdl: float) -> Decimal:
    idf = float(
        Decimal(str(round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 8)))
    )
    tf_part = (tf * (K1 + 1.0)) / (tf + K1 * ((1.0 - B) + B * (dl / avgdl)))
    return Decimal(str(round(idf * tf_part, 8)))


def test_hand_computed_scores(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark join x"),     # tf(spark)=2, tf(join)=1, dl=4
            (2, "spark y z"),              # tf(spark)=1, dl=3
            (3, "a b c d e"),              # no terms, dl=5
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["spark", "join"], k=10).collect()}
    assert set(out) == {1, 2}  # doc 3 matches nothing
    n, avgdl = 3, 12 / 3
    want1 = float(_score(2, 4, n, 2, avgdl) + _score(1, 4, n, 1, avgdl))
    want2 = float(_score(1, 3, n, 2, avgdl))
    assert abs(out[1].score - round(want1, 6)) < 1e-12
    assert abs(out[2].score - round(want2, 6)) < 1e-12
    assert out[1].rnk == 1 and out[2].rnk == 2  # two terms beat one


def test_k_limits_and_tie_break(spark):
    docs = spark.createDataFrame(
        [(i, "spark") for i in range(30)], "doc_id long, text string"
    )
    rows = bm25_topk(docs, ["spark"], k=5).collect()
    # identical scores: ties break by doc_id ascending
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rnk)] == [0, 1, 2, 3, 4]


def test_empty_terms_rejected(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="terms"):
        bm25_topk(docs, [])
