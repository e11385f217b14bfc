"""Composite quality filter (operators/quality_filter.py): per-rule
verdicts fire independently, rows are never dropped, NULL NLL maps to
nll_ok=False, and keep is the exact conjunction."""
from __future__ import annotations

from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.quality_filter import quality_filter

EN = "the cat sat on the mat and it was a fine day for all of the cats to sit"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rows_never_dropped_and_keep_is_conjunction(spark):
    rows = [
        (1, EN),                                   # healthy english doc
        (2, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"),  # no stopwords
        (3, "spam " * 30 + "spam"),                # repetitive -> gopher fail
        (4, "short text here"),                    # < min_words
        (5, "solo"),                               # 1 token -> NULL avg_nll
    ]
    out = {
        r.doc_id: r
        for r in quality_filter(
            _docs(spark, rows), min_words=10, nll_max=1e9
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}  # nothing dropped
    assert out[1].keep and out[1].gopher_pass and out[1].lang_ok
    assert not out[2].lang_ok and not out[2].stop_ok and not out[2].keep
    assert not out[3].gopher_pass and not out[3].keep
    assert not out[4].wc_ok and not out[4].keep
    # single-token doc: no bigrams -> NULL avg_nll -> nll_ok False, keep
    # False (never NULL)
    assert out[5].avg_nll is None and out[5].nll_ok is False
    assert out[5].keep is False
    # keep == conjunction of the per-rule columns, row by row
    for r in out.values():
        want = bool(
            r.gopher_pass and r.lang_ok and r.stop_ok and r.punct_ok
            and r.nll_ok and r.wc_ok
        )
        assert r.keep == want, r


def test_nll_threshold_fires(spark):
    rows = [(i, EN) for i in range(4)] + [(9, "aa bb " * 10 + "cc")]
    out = quality_filter(_docs(spark, rows), min_words=5, nll_max=-1.0)
    assert [r.nll_ok for r in out.collect()] == [False] * 5  # all above -1


def test_threshold_knobs_are_live(spark):
    rows = [(1, EN)]
    strict = quality_filter(
        _docs(spark, rows), min_words=1000
    ).collect()[0]
    assert not strict.wc_ok and not strict.keep
    lax = quality_filter(
        _docs(spark, rows), min_words=1, min_stop_ratio=0.0, nll_max=1e9
    ).collect()[0]
    assert lax.wc_ok and lax.stop_ok
