"""simhash_signatures: brute-force equivalence + single-exchange plan.

The r9 rewrite replaced the explode-per-bit → groupBy(doc, b) →
collect_list chain with one groupBy(doc) carrying ``bits`` sum columns.
These tests pin (a) the exact signature semantics against a pure-Python
reimplementation of the pinned definition (bit b = sign of the sum over
distinct cleaned words of ±1 by the parity of md5(w)'s b-th hex char),
and (b) the plan shape: exactly TWO Exchanges (the distinct over
(doc, word) and the one signature aggregation) — the old chain's third
exchange (groupBy(doc, b) then a second groupBy(doc)) must not come
back.
"""
from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.dedup import simhash_signatures

DOCS = [
    (1, "the Quick brown fox, jumped over the lazy dog!"),
    (2, "the quick brown fox jumped over the lazy dog"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "  padded   spacing   and  UPPER case WORDS  "),
    (5, "punctuation-heavy: text; with? lots! of, marks."),
]


def _clean(text: str) -> str:
    # mirror functions.text.clean_text: P2 — drop backslashes, lowercase
    return text.replace("\\", "").lower()


def _py_simhash(text: str, bits: int = 16) -> str:
    words = {w for w in _clean(text).split(" ") if w}
    out = []
    for b in range(bits):
        s = 0
        for w in words:
            hexc = hashlib.md5(w.encode()).hexdigest()[b]
            s += 1 if ord(hexc) % 2 == 1 else -1
        out.append("1" if s > 0 else "0")
    return "".join(out)


def test_simhash_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    want = {i: _py_simhash(t) for i, t in DOCS}
    assert got == want


def test_simhash_two_exchanges(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = simhash_signatures(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan
