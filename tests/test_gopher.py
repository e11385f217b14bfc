"""Gopher repetition-quality rules (operators/gopher.py): hand-computed
n-gram masses, degenerate short docs, pass-flag thresholds."""
from __future__ import annotations

from post_ocr_corretion_spark.operators.gopher import (
    gopher_dup_ngrams,
    gopher_repetition,
)


def _run(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in gopher_repetition(docs).collect()}


def test_hand_computed_repetition(spark):
    out = _run(spark, ["a a a", "a b a b a b"])
    r = out[0]  # bigrams: 'a a' x2 -> top2=2/2, dup2=1/2; trigram 'a a a' x1
    assert r.n_words == 3
    assert r.top2_frac == 1.0 and r.dup2_frac == 0.5
    assert r.top3_frac == 1.0 and r.dup3_frac == 0.0
    assert not r.gopher_pass  # top2 1.0 > 0.20
    r = out[1]  # bigrams: 'a b' x3, 'b a' x2 (5 total); trigrams: aba x2, bab x2
    assert r.top2_frac == 0.6 and r.dup2_frac == 0.6
    assert r.top3_frac == 0.5 and r.dup3_frac == 0.5
    assert not r.gopher_pass


def test_distinct_text_passes(spark):
    words = " ".join(f"w{i}" for i in range(12))
    r = _run(spark, [words])[0]
    assert r.top2_frac == 1 / 11 and r.dup2_frac == 0.0
    assert r.top3_frac == 0.1 and r.dup3_frac == 0.0
    assert r.gopher_pass


def test_short_docs_pass_through_with_zero_mass(spark):
    out = _run(spark, ["solo", "two words"])
    r = out[0]  # 1 word: no bigrams, no trigrams
    assert r.n_words == 1
    assert (r.top2_frac, r.dup2_frac, r.top3_frac, r.dup3_frac) == (0.0, 0.0, 0.0, 0.0)
    assert r.gopher_pass
    r = out[1]  # 2 words: one bigram, no trigram -> top2 = 1.0
    assert r.top2_frac == 1.0 and r.top3_frac == 0.0
    assert not r.gopher_pass


def test_every_input_row_emitted(spark):
    texts = ["a a a", "x", "p q r s t u v w"]
    assert len(_run(spark, texts)) == len(texts)


def _run_dup(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in gopher_dup_ngrams(docs).collect()}


def test_dup_ngrams_hand_computed(spark):
    # "a b c d e" repeats at positions 1 and 6: ONE duplicate 5-gram
    # occurrence of 9 chars over a 19-char doc; every wider window is
    # distinct, so only the n=5 rule fires.
    out = _run_dup(spark, ["a b c d e a b c d e"])[0]
    assert out.dup5_frac == 9 / 19
    assert (out.dup6_frac, out.dup7_frac, out.dup8_frac, out.dup9_frac, out.dup10_frac) == (
        0.0, 0.0, 0.0, 0.0, 0.0,
    )
    assert not out.dup_ngram_pass  # 9/19 > 0.15


def test_dup_ngrams_distinct_text_passes(spark):
    words = " ".join(f"w{i}" for i in range(15))
    out = _run_dup(spark, [words])[0]
    assert all(
        getattr(out, f"dup{n}_frac") == 0.0 for n in range(5, 11)
    ) and out.dup_ngram_pass


def test_dup_ngrams_short_docs_pass_with_zero_mass(spark):
    out = _run_dup(spark, ["a b c", "a b c d e"])
    assert out[0].dup_ngram_pass and out[0].dup5_frac == 0.0
    # exactly one 5-gram: nothing can repeat
    assert out[1].dup_ngram_pass and out[1].dup5_frac == 0.0


def test_dup_ngrams_overlap_can_exceed_one(spark):
    # documented resolution: overlapping duplicate grams each count
    # their full span, so pathological repetition exceeds 1.0 and
    # (correctly) fails the cap.
    out = _run_dup(spark, [" ".join(["a"] * 10)])[0]
    assert out.dup5_frac == 45 / 19  # 5 extra occurrences x 9 chars
    assert out.dup10_frac == 0.0  # single 10-gram, nothing repeats
    assert not out.dup_ngram_pass


def test_dup_ngrams_every_row_emitted(spark):
    texts = ["a a a", "x", " ".join(["p q r s t u"] * 3)]
    assert len(_run_dup(spark, texts)) == len(texts)
