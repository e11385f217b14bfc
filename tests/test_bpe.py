"""BPE fit/segment (operators/bpe.py) against the hand-derived Sennrich
et al. 2016 worked example, plus greedy-overlap semantics, early stop,
and segmentation order."""
from __future__ import annotations

from post_ocr_corretion_spark.operators.bpe import bpe_fit, bpe_segment


def _corpus(spark):
    # word frequencies: low×5, lower×2, newest×6, widest×3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_fit_matches_hand_derivation(spark):
    out = [tuple(r) for r in bpe_fit(_corpus(spark), n_merges=4).collect()]
    # step 1: (e,s)=9 ties (s,t)=9 → lexicographic; then est=9, lo=7, low=7
    assert out == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_segment_applies_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(7, "lowest widest low")], "doc_id long, text string"
    )
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    rows = bpe_segment(docs, merges).collect()
    assert len(rows) == 1
    # word order preserved; 'lowest' → [low, est], 'widest' → [w,i,d,est]
    assert rows[0]["tokens"] == ["low", "est", "w", "i", "d", "est", "low"]


def test_greedy_left_to_right_overlap(spark):
    # 'llll' with merge (l,l): greedy non-overlapping → [ll, ll]
    docs = spark.createDataFrame([(0, "llll lll")], "doc_id long, text string")
    rows = bpe_segment(docs, [("l", "l")]).collect()
    assert rows[0]["tokens"] == ["ll", "ll", "ll", "l"]


def test_fit_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    out = bpe_fit(docs, n_merges=5).collect()
    assert out == []  # all words are single symbols from the start


def test_fit_weighted_by_frequency_not_types(spark):
    # 'xy' appears 3× vs 'zq' once — (x,y) must win despite equal type count
    docs = spark.createDataFrame([(0, "xy xy xy zq")], "doc_id long, text string")
    out = [tuple(r) for r in bpe_fit(docs, n_merges=1).collect()]
    assert out == [(1, "x", "y", "xy", 3)]
