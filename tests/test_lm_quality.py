"""Bigram-LM quality scoring (operators/lm_quality.py): hand-computed
probabilities, unseen-gram fallback, partitioning independence."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.lm_quality import bigram_lm_fit, lm_nll_score


def _fixture(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )


def test_hand_computed_nll(spark):
    docs = _fixture(spark)
    bigrams, unigrams, vocab = bigram_lm_fit(docs)
    assert vocab == 3  # {a, b, c}
    out = {r.doc_id: r for r in lm_nll_score(docs, bigrams, unigrams, vocab).collect()}
    # counts: bigrams ab:3, ba:1, bc:1; prefix counts a:3, b:2
    # doc1 bigrams: ab, ba, ab → p = 4/6, 2/5, 4/6 (alpha=1, V=3)
    p_ab, p_ba, p_bc = 4 / 6, 2 / 5, 2 / 5
    want1 = (
        round(-math.log(p_ab), 8) + round(-math.log(p_ba), 8) + round(-math.log(p_ab), 8)
    ) / 3
    assert out[1].n_bigrams == 3
    assert abs(out[1].avg_nll - round(want1, 6)) < 1e-9
    # doc2: ab, bc → p = 4/6, 2/5
    want2 = (round(-math.log(p_ab), 8) + round(-math.log(p_bc), 8)) / 2
    assert out[2].n_bigrams == 2
    assert abs(out[2].avg_nll - round(want2, 6)) < 1e-9


def test_unseen_grams_fall_back(spark):
    docs = _fixture(spark)
    bigrams, unigrams, vocab = bigram_lm_fit(docs)
    foreign = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    out = lm_nll_score(foreign, bigrams, unigrams, vocab).collect()[0]
    # unseen everywhere: p = (0+1)/(0+3) = 1/3
    assert out.n_bigrams == 1
    assert abs(out.avg_nll - round(round(-math.log(1 / 3), 8), 6)) < 1e-9


def test_partitioning_independent(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bigrams, unigrams, vocab = bigram_lm_fit(docs)
    a = sorted(
        (r.doc_id, r.n_bigrams, r.avg_nll)
        for r in lm_nll_score(docs, bigrams, unigrams, vocab).collect()
    )
    b = sorted(
        (r.doc_id, r.n_bigrams, r.avg_nll)
        for r in lm_nll_score(
            docs.repartition(13), bigrams, unigrams, vocab
        ).collect()
    )
    assert a == b and len(a) > 0


def test_fit_folds_vocab_into_the_unigram_scan(spark):
    """VERDICT r6 item 5: |V| and the unigram counts come from ONE
    token pass — the unigram frame the score consumes must read the
    materialized (localCheckpointed) vocab-sized artifact, never
    rescan the corpus parquet; |V| and the unigram rows must equal the
    retired two-scan formulation exactly."""
    from post_ocr_corretion_spark.operators.lm_quality import _doc_bigrams
    from post_ocr_corretion_spark.plans.audit import formatted_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bigrams, unigrams, vocab = bigram_lm_fit(docs)
    naive_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w")).distinct().count()
    )
    assert vocab == naive_vocab
    old = {
        (r.w1, r.c1)
        for r in _doc_bigrams(docs, "text", "doc_id")
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .collect()
    }
    new = {(r.w1, r.c1) for r in unigrams.collect()}
    assert new == old and len(new) > 0
    assert "parquet" not in formatted_plan(unigrams).lower()


def test_ccnet_buckets_thirds_and_tie_semantics(spark):
    from post_ocr_corretion_spark.operators.lm_quality import (
        bigram_lm_fit,
        ccnet_perplexity_buckets,
        lm_nll_score,
    )

    # 9 distinct two-word docs per lang → 9 scores per lang, clean thirds
    rows = []
    did = 0
    for lang in ("en", "de"):
        for i in range(9):
            # vary fluency: repeat a common bigram i+1 times (more
            # repeats of the corpus-frequent pair → lower NLL)
            rows.append((did, " ".join(["alpha beta"] * (i + 1)) + f" w{i}", lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bigrams, unigrams, vocab = bigram_lm_fit(docs)
    out = ccnet_perplexity_buckets(docs, lm_nll_score(docs, bigrams, unigrams, vocab))
    got = out.collect()
    assert len(got) == 18
    for lang in ("en", "de"):
        sub = sorted((r for r in got if r["lang"] == lang), key=lambda r: r["avg_nll"])
        labels = [r["bucket"] for r in sub]
        assert labels == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # bucket is a function of (lang, avg_nll): equal scores share a bucket
    by_key = {}
    for r in got:
        by_key.setdefault((r["lang"], r["avg_nll"]), set()).add(r["bucket"])
    assert all(len(v) == 1 for v in by_key.values())
