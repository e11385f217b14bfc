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


def test_token_budget_expectation_and_whole_doc_keep(spark):
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.mixture import mixture_sample_tokens

    # two sources: 'big' 200 docs × 10 tokens, 'small' 20 docs × 10 tokens
    rows = [(i, " ".join(["w"] * 10), "big") for i in range(200)]
    rows += [(1000 + i, " ".join(["w"] * 10), "small") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mixture_sample_tokens(docs, target_tokens=600, seed="tb").collect()
    # alpha=0.5: w_big=sqrt(2000), w_small=sqrt(200); p_small/p_big =
    # (w_s/t_s)/(w_b/t_b) = sqrt(t_b/t_s) = sqrt(10) — small is UP-weighted
    p = {r["source"]: r["p_keep"] for r in out}
    assert p["small"] / p["big"] == pytest.approx(10 ** 0.5, rel=1e-9)
    # every kept row is a whole doc with its source's single p_keep
    assert all(r["t_source"] in (2000, 200) for r in out)
    # kept token total is near the budget (law of large numbers at n=220)
    kept_tokens = 10 * len(out)
    assert 250 < kept_tokens < 1100
    # deterministic re-run
    again = mixture_sample_tokens(docs, target_tokens=600, seed="tb").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_token_budget_saturation_clamps_to_one(spark):
    from post_ocr_corretion_spark.operators.mixture import mixture_sample_tokens

    docs = spark.createDataFrame(
        [(i, "a b c", "only") for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = mixture_sample_tokens(docs, target_tokens=10_000).collect()
    assert len(out) == 10 and all(r["p_keep"] == 1.0 for r in out)
