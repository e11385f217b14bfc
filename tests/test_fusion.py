"""Reciprocal-rank fusion (operators/fusion.py): hand-computed RRF
scores, single-list membership, tie handling, and the top-k contract."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.fusion import rrf_fuse


def _lists(spark):
    sparse = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rnk int"
    )
    dense = spark.createDataFrame(
        [(11, 1), (10, 2), (13, 3)], "doc_id long, rnk int"
    )
    return sparse, dense


def test_rrf_hand_computed(spark):
    sparse, dense = _lists(spark)
    out = {r["doc_id"]: r for r in rrf_fuse([sparse, dense], rrf_k=60, k=10).collect()}
    # doc 10: 1/61 + 1/62 ; doc 11: 1/62 + 1/61 — identical fused scores
    both = round(round(1 / 61, 8) + round(1 / 62, 8), 8)
    assert out[10]["rrf_score"] == pytest.approx(both, abs=1e-9)
    assert out[11]["rrf_score"] == pytest.approx(both, abs=1e-9)
    assert out[10]["n_lists"] == 2 and out[11]["n_lists"] == 2
    # single-list docs: one reciprocal term only
    assert out[12]["rrf_score"] == pytest.approx(round(1 / 63, 8), abs=1e-9)
    assert out[12]["n_lists"] == 1
    # tie between 10 and 11 breaks by id: 10 ranks ahead
    assert out[10]["rnk"] < out[11]["rnk"]
    # ranks are 1..4 dense over the fused set
    assert sorted(r["rnk"] for r in out.values()) == [1, 2, 3, 4]


def test_rrf_topk_truncates(spark):
    sparse, dense = _lists(spark)
    out = rrf_fuse([sparse, dense], rrf_k=60, k=2).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [10, 11]


def test_rrf_single_list_is_rank_order(spark):
    sparse, _ = _lists(spark)
    out = rrf_fuse([sparse], rrf_k=60, k=10).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [10, 11, 12]
    assert all(r["n_lists"] == 1 for r in out)


def test_rrf_rejects_empty_input():
    with pytest.raises(ValueError):
        rrf_fuse([])
