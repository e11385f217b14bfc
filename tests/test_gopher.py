"""Gopher repetition-quality rules (operators/gopher.py): hand-computed
n-gram masses, degenerate short docs, pass-flag thresholds."""
from __future__ import annotations

from post_ocr_corretion_spark.operators.gopher import gopher_repetition


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
