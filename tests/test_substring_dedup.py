"""Exact-substring dedup (operators/substring_dedup.py): planted-span
fixtures pin the Lee-et-al. semantics (a substring of >= k tokens is
duplicated iff all its k-windows are), the xxhash64 scale path is
asserted span-identical to the oracle-exact 'exact' fingerprint, and
the scrub form is checked token-for-token."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.operators.substring_dedup import (
    remove_repeated_spans,
    repeated_ngram_spans,
    token_ngram_windows,
)


def _w(i: int) -> str:
    return f"u{i}"


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = " ".join(f"s{i}" for i in range(25))  # 25-token planted duplicate


@pytest.fixture(scope="module")
def planted(spark):
    # doc 0: 10 unique + SHARED + 10 unique; doc 1: 7 unique + SHARED +
    # 3 unique; doc 2: all unique; doc 3: internal repeat (12-token block
    # twice, back to back); doc 4: shorter than k
    block = " ".join(f"r{i}" for i in range(12))
    return _mkdocs(
        spark,
        [
            (0, " ".join(_w(i) for i in range(10)) + " " + SHARED + " " + " ".join(_w(i) for i in range(100, 110))),
            (1, " ".join(_w(i) for i in range(200, 207)) + " " + SHARED + " " + " ".join(_w(i) for i in range(300, 303))),
            (2, " ".join(_w(i) for i in range(400, 450))),
            (3, block + " " + block + " " + " ".join(_w(i) for i in range(500, 520))),
            (4, "a b c"),
        ],
    )


def test_cross_doc_planted_span_exact_boundaries(spark, planted):
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_ngram_spans(planted, k=10).collect()
        if r.doc_id in (0, 1)
    }
    # the shared 25 tokens start at pos 10 in doc 0 and pos 7 in doc 1;
    # every length-10 window inside them (and only those) is duplicated
    assert (0, 10, 35) in spans
    assert (1, 7, 32) in spans
    assert not any(d == 2 for d, _, _ in spans)


def test_within_doc_repeat_counts(spark, planted):
    # doc 3 = block(12) + block(12) + unique(20): with k=10 the window
    # at start i equals the one at i+12 exactly when both sit fully in
    # the periodic 24-token prefix → duplicated starts {0,1,2} and
    # {12,13,14}, merging to the two TOUCHING spans [0,12) and [12,24).
    # Touching spans share no token, so they stay separate — this pins
    # the merge-only-on-overlap rule.
    spans = sorted(
        (r.span_start, r.span_end, r.n_windows)
        for r in repeated_ngram_spans(planted, k=10).collect()
        if r.doc_id == 3
    )
    assert spans == [(0, 12, 3), (12, 24, 3)]


def test_short_doc_has_no_windows(spark, planted):
    assert token_ngram_windows(planted, k=10).filter("doc_id = 4").count() == 0


def test_hash_and_exact_fingerprints_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in repeated_ngram_spans(docs, k=15).collect()
    )
    b = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in repeated_ngram_spans(docs, k=15, fingerprint="exact").collect()
    )
    assert a == b and len(a) > 0


def test_remove_repeated_spans_token_exact(spark, planted):
    out = {r.doc_id: r for r in remove_repeated_spans(planted, k=10).collect()}
    # doc 0 loses exactly the 25 shared tokens
    assert out[0].n_removed_tokens == 25
    assert out[0].text == " ".join(_w(i) for i in range(10)) + " " + " ".join(
        _w(i) for i in range(100, 110)
    )
    # doc 2 (no duplicates) and doc 4 (below k) pass through verbatim
    assert out[2].n_removed_tokens == 0
    assert out[2].text == " ".join(_w(i) for i in range(400, 450))
    assert out[4].n_removed_tokens == 0 and out[4].text == "a b c"
    # doc 3 keeps only its unique tail
    assert out[3].n_removed_tokens == 24
    assert out[3].text == " ".join(_w(i) for i in range(500, 520))


def test_extra_columns_survive_scrub(spark):
    docs = spark.createDataFrame(
        [(1, "x " * 30 + "tail", "en"), (2, "x " * 30 + "other", "de")],
        "doc_id long, text string, lang string",
    )
    out = remove_repeated_spans(docs, k=5).collect()
    assert {r.lang for r in out} == {"en", "de"}
    assert set(out[0].asDict()) == {"doc_id", "text", "lang", "n_removed_tokens"}


def test_validation():
    with pytest.raises(ValueError, match="k must be"):
        token_ngram_windows(None, k=1)
    with pytest.raises(ValueError, match="fingerprint"):
        token_ngram_windows(None, k=5, fingerprint="md5")
