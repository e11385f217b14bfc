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


def test_angle_bracket_words_excluded_from_fit_and_passed_through(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab a<b a<b a<b x>y")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_fit(docs, n_merges=1).collect()]
    # the 3× 'a<b' and 'x>y' words are excluded: (a,b) from 'ab' wins
    assert out == [(1, "a", "b", "ab", 2)]
    rows = bpe_segment(docs, [("a", "b")]).collect()
    assert rows[0]["tokens"] == ["ab", "ab", "a<b", "a<b", "a<b", "x>y"]


def _py_bpe(word_freqs, n_merges):
    """Pure-Python reference BPE (greedy left-to-right merge; argmax by
    count desc then pair lexicographic asc)."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_fit_and_segment_match_pure_python_reference(spark):
    import random

    rng = random.Random(20260818)
    words = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + rng.randint(1, 9)
    text = " ".join(w for w, f in sorted(freqs.items()) for _ in range(f))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    expect_merges, expect_syms = _py_bpe(freqs, 8)
    got = [tuple(r) for r in bpe_fit(docs, n_merges=8).collect()]
    assert got == expect_merges
    seg = bpe_segment(docs, [(m[1], m[2]) for m in expect_merges]).collect()
    expect_tokens = [
        tok for w, f in sorted(freqs.items()) for _ in range(f) for tok in expect_syms[w]
    ]
    assert seg[0]["tokens"] == expect_tokens
