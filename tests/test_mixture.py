"""Deterministic temperature mixture sampling (operators/mixture.py):
hand-computed keep probabilities, md5-replicated selection decisions,
determinism and partitioning independence."""
from __future__ import annotations

import hashlib

import pytest

from post_ocr_corretion_spark.operators.mixture import TWO_52, mixture_sample


def _u(seed: str, doc_id: int) -> float:
    h = hashlib.md5(f"{seed}#{doc_id}".encode()).hexdigest()
    return int(h[:13], 16) / TWO_52


def _fixture(spark):
    rows = [(i, "big") for i in range(4)] + [(100, "small")]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_hand_computed_probabilities_and_selection(spark):
    docs = _fixture(spark)
    # alpha=0.5: w_big = 2, w_small = 1, W = 3; target 3:
    # p_big = min(1, 3*(2/3)/4) = 0.5 ; p_small = min(1, 3*(1/3)/1) = 1.0
    out = {r.doc_id: r for r in mixture_sample(docs, target_rows=3, seed="t").collect()}
    assert 100 in out and out[100].p_keep == 1.0  # saturated source always kept
    for i in range(4):
        assert (i in out) == (_u("t", i) < 0.5), i
        if i in out:
            assert out[i].p_keep == 0.5 and out[i].n_source == 4


def test_alpha_one_reproduces_raw_proportions(spark):
    docs = _fixture(spark)
    rows = mixture_sample(docs, target_rows=2, alpha=1.0, seed="t").collect()
    # alpha=1: p = target/total for every source (2/5 here)
    assert {round(r.p_keep, 9) for r in rows} == {0.4}


def test_deterministic_and_partitioning_independent(spark):
    docs = _fixture(spark)
    a = sorted(r.doc_id for r in mixture_sample(docs, 3, seed="s1").collect())
    b = sorted(r.doc_id for r in mixture_sample(docs, 3, seed="s1").collect())
    c = sorted(
        r.doc_id for r in mixture_sample(docs.repartition(7), 3, seed="s1").collect()
    )
    assert a == b == c


def test_target_rows_validated(spark):
    with pytest.raises(ValueError, match="target_rows"):
        mixture_sample(_fixture(spark), target_rows=0)


def test_expected_sample_size_tracks_target(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 10}") for i in range(1000)], "doc_id long, source string"
    )
    kept = mixture_sample(docs, target_rows=200, seed="size").count()
    # binomial around 200 (10 sources x 100 rows, p = 0.2 each):
    # 5 sigma ~ 63 rows
    assert 137 <= kept <= 263
