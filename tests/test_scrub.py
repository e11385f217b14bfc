"""operators/scrub.py: PII redaction + benchmark decontamination edge
cases; full oracle parity runs in test_entry_queries (pii_redact /
decontaminate)."""
from __future__ import annotations

from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.scrub import decontaminate, redact_pii


def test_redact_pii_counts_and_sentinels(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e.org from 192.168.0.1 call +44 20 7946 0958"),
            (2, "no pii here at all"),
            (3, "1.2.3.4 5.6.7.8 twice"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (2, 1, 1)
    assert "<EMAIL>" in out[1].text_redacted and "<IP>" in out[1].text_redacted
    assert "<PHONE>" in out[1].text_redacted
    assert "a@b.co" not in out[1].text_redacted and "192.168" not in out[1].text_redacted
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 0)
    assert out[2].text_redacted == "no pii here at all"  # untouched
    assert out[3].n_ipv4 == 2 and out[3].text_redacted == "<IP> <IP> twice"
    # original text column is preserved alongside (audit contract)
    assert out[1].text.startswith("mail a@b.co")


def test_decontaminate_flag_and_drop_modes(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # shares a 4-gram
            (2, "totally unrelated text about spark jobs here"),
            (3, "ALPHA BETA GAMMA DELTA different tail"),  # case-folded hit
            (4, "one two"),                                # shorter than n → safe
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the eval set says alpha beta gamma delta and more",)], "text string"
    )
    flagged = {r.doc_id: r for r in decontaminate(docs, bench, n=4).collect()}
    assert flagged[1].contaminated and flagged[1].n_hit_grams >= 1
    assert flagged[3].contaminated  # lowercasing applied on both sides
    assert not flagged[2].contaminated and flagged[2].n_hit_grams == 0
    assert not flagged[4].contaminated  # sequence(0,-1) guard: no bogus grams
    kept = {r.doc_id for r in decontaminate(docs, bench, n=4, mode="drop").collect()}
    assert kept == {2, 4}
    import pytest

    with pytest.raises(ValueError, match="mode"):
        decontaminate(docs, bench, mode="purge")


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same overlapping gram appearing TWICE in a doc counts once
    docs = spark.createDataFrame(
        [(1, "a b c d junk a b c d"), (2, "a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    out = {r.doc_id: r.n_hit_grams for r in decontaminate(docs, bench, n=4).collect()}
    assert out[1] == 1  # 'a b c d' twice in the doc → one distinct gram
    assert out[2] == 2  # 'a b c d' and 'b c d e'
