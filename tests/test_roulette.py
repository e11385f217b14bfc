"""W2 seeded roulette-wheel selection (flag-gated; deterministic top-k
stays the pinned default).  Draw-for-draw fidelity to the reference's
RouletteWheel (correctionSentences.py:302-330): sorted-desc sample,
per-draw renormalization, cumulative scan, first cum > r wins, sampling
without replacement."""
from __future__ import annotations

import random

from post_ocr_corretion_spark.core.beam import (
    correct_sentence,
    roulette_rng,
    roulette_select,
)


def _reference_wheel(k, sample, eval_fn, rng):
    """Independent transcription of the reference's algorithm for the
    draw-for-draw oracle (with the same last-element fallback for the
    r→1 float edge the reference would crash on)."""
    sample = sorted(sample[:], key=eval_fn, reverse=True)
    selected = []
    while len(selected) < k and sample:
        total = sum(eval_fn(e) for e in sample)
        cumulative = []
        s = 0.0
        for e in sample:
            s += eval_fn(e) / total
            cumulative.append((s, e))
        r = rng.random()
        pick = next((e for v, e in cumulative if v > r), sample[-1])
        selected.append(pick)
        sample.remove(pick)
    return selected


def test_roulette_matches_reference_draw_for_draw():
    items = [("a", 5.0), ("b", 1.0), ("c", 3.0), ("d", 3.0), ("e", 0.25)]
    for seed in range(25):
        got = roulette_select(items, 3, lambda t: t[1], random.Random(seed))
        want = _reference_wheel(3, items, lambda t: t[1], random.Random(seed))
        assert got == want, seed


def test_roulette_exhausts_small_samples():
    items = [("x", 1.0), ("y", 2.0)]
    out = roulette_select(items, 5, lambda t: t[1], random.Random(0))
    assert sorted(out) == sorted(items)  # without replacement, all taken


def test_roulette_ties_keep_list_order():
    # equal weights: the sort is stable, so list order is the tie order
    items = [("first", 1.0), ("second", 1.0), ("third", 1.0)]
    rng = random.Random(7)
    out = roulette_select(items, 3, lambda t: t[1], rng)
    assert set(out) == set(items)


def test_correct_sentence_roulette_deterministic_given_seed(fixture_scorer, fixture_lexicon):
    text = "the dis0ric! is in the cit."
    a = correct_sentence(text, fixture_scorer, fixture_lexicon, rng=roulette_rng(42, text))
    b = correct_sentence(text, fixture_scorer, fixture_lexicon, rng=roulette_rng(42, text))
    c = correct_sentence(text, fixture_scorer, fixture_lexicon, rng=roulette_rng(43, text))
    assert a == b
    assert len(a) == 6
    # a different seed may or may not change the draw; both must be valid
    assert len(c) == 6


def test_spark_roulette_matches_python_oracle(spark, docs_rows, fixture_lexicon, fixture_scorer):
    """Flag-on Spark output equals the seeded single-node oracle
    draw-for-draw (VERDICT r1 item 5)."""
    from post_ocr_corretion_spark.operators.correction import run_beam_udf

    texts = [r["text"] for r in docs_rows[:20]]
    df = spark.createDataFrame([(t,) for t in texts], "extracted_text string")
    scorer_bc = spark.sparkContext.broadcast(fixture_scorer)
    lex_bc = spark.sparkContext.broadcast(fixture_lexicon)
    rows = run_beam_udf(df, scorer_bc, lex_bc, roulette_seed=123).collect()
    by_text = {r.extracted_text: r.corrected_words for r in rows}
    for t in texts:
        want = correct_sentence(t, fixture_scorer, fixture_lexicon, rng=roulette_rng(123, t))
        assert by_text[t] == want, t


def test_roulette_all_zero_weights_no_crash():
    """ADVICE r2: all-zero weights must not divide by zero — remaining
    items come back in sorted(list-order-stable) order."""
    items = [("b", 0.0), ("a", 0.0), ("c", 0.0)]
    out = roulette_select(items, 2, lambda t: t[1], random.Random(3))
    assert out == [("b", 0.0), ("a", 0.0)]  # stable sort keeps list order


def test_roulette_weights_decay_to_zero_mid_selection():
    """One positive weight then zeros: the positive item is always drawn
    first (it is the whole mass), the rest follow in stable order."""
    items = [("z1", 0.0), ("hot", 2.0), ("z2", 0.0)]
    for seed in range(10):
        out = roulette_select(items, 3, lambda t: t[1], random.Random(seed))
        assert out == [("hot", 2.0), ("z1", 0.0), ("z2", 0.0)], seed
