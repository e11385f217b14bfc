"""Substring-arithmetic gram construction (r9): brute-force equivalence.

The r9 rewrite builds every n-gram window with ONE substring over a
staged token-offset array instead of concat_ws over an array slice —
byte-identical strings because split(' ')'s separators are exactly one
space. These tests pin that equivalence against a pure-Python
reimplementation on pathological inputs (runs of spaces → empty tokens,
leading/trailing spaces, empty text, single token, non-ASCII chars,
maximal repetition).
"""
from __future__ import annotations

import collections

import pytest

ROWS = [
    (1, "a b c d e f g h i j"),
    (2, "x  y   z  x  y   z  x  y"),
    (3, " leading and trailing "),
    (4, ""),
    (5, "one"),
    (6, "ü ñ é ü ñ é ü ñ é ü ñ é"),
    (7, "r r r r r r r r r r r r r r r r"),
    (8, "a b " * 50),
]


def _grams(text: str, n: int) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_dup_ngrams_matches_bruteforce(spark, df):
    from post_ocr_corretion_spark.operators.gopher import gopher_dup_ngrams

    texts = dict(ROWS)
    for r in gopher_dup_ngrams(df).collect():
        t = texts[r.doc_id]
        for n in range(5, 11):
            c = collections.Counter(_grams(t, n))
            dup = sum((v - 1) * len(g) for g, v in c.items())
            want = (dup / len(t)) if len(t) else 0.0
            assert getattr(r, f"dup{n}_frac") == want, (r.doc_id, n)


def test_repetition_matches_bruteforce(spark, df):
    from post_ocr_corretion_spark.operators.gopher import gopher_repetition

    texts = dict(ROWS)
    for r in gopher_repetition(df).collect():
        t = texts[r.doc_id]
        for n in (2, 3):
            c = collections.Counter(_grams(t, n))
            tot = sum(c.values())
            top = max(c.values()) if c else 0
            dup = sum(v - 1 for v in c.values())
            assert getattr(r, f"top{n}_frac") == ((top / tot) if tot else 0.0)
            assert getattr(r, f"dup{n}_frac") == ((dup / tot) if tot else 0.0)
