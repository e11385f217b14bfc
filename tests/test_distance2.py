"""Distance-2 candidate expansion (flag-gated; the report's max-lev-2
configuration — default stays 1, the code's pinned value)."""
from __future__ import annotations

from post_ocr_corretion_spark.core.candidates import (
    P_DEL,
    P_INS,
    P_SUB,
    get_alternative_word,
    one_op_strings,
)

LEX = frozenset({"query", "the", "cat", "cart", "scan"})


def test_distance1_paths_agree(fixture_lexicon):
    for w in ["ken", "cit.", "dis0ric!", "scn", "the"]:
        direct = get_alternative_word(w, fixture_lexicon, max_distance=1)
        # force the frontier implementation with a 0-candidate guard off:
        frontier = get_alternative_word(w, fixture_lexicon, max_distance=2, words_for_generation=10**9)
        d1_only = {(t, s) for t, s in frontier if _min_ops(s) <= 1}
        assert direct <= frontier
        assert direct == {(t, s) for t, s in frontier if s in (1.0, P_SUB, P_DEL, P_INS)}
        assert d1_only == direct


def _min_ops(score: float) -> int:
    return 0 if score == 1.0 else (1 if score in (P_SUB, P_DEL, P_INS) else 2)


def test_distance2_finds_two_edit_words():
    # 'quy' → 'query' needs TWO interior insertions (e before 2, r before
    # 3) — unreachable at d1 (and note: end-insertion never exists, so
    # e.g. 'qer'→'query' stays unreachable even at d2)
    d1 = get_alternative_word("quy", LEX, max_distance=1)
    assert all(w != "query" for w, _ in d1)
    d2 = get_alternative_word("quy", LEX, max_distance=2, words_for_generation=10**9)
    scores = {s for w, s in d2 if w == "query"}
    assert P_INS * P_INS in scores  # insert+insert path
    # 'qxery' → 'query': one substitution (d1) — also derivable at d2
    # with a sub·sub score
    d2_sub = get_alternative_word("qxxry", LEX, max_distance=2, words_for_generation=10**9)
    assert ("query", P_SUB * P_SUB) in d2_sub
    # d1 candidates remain present at d2 with their d1 scores
    d2_cat = get_alternative_word("cat", LEX, max_distance=2, words_for_generation=10**9)
    assert ("cart", P_INS) in d2_cat


def test_count_guard_stops_second_round(fixture_lexicon):
    # a word with >= 15 distance-1 candidates must NOT expand to d2
    # (loop guard, correctionSentences.py:280-282)
    w = "scn"
    d1 = get_alternative_word(w, fixture_lexicon, max_distance=1)
    d2 = get_alternative_word(w, fixture_lexicon, max_distance=2)
    if len(d1) >= 15:
        assert d2 == d1
    else:
        assert d1 <= d2


def test_one_op_strings_shape():
    ops = one_op_strings("ab")
    assert ("b", P_DEL) in ops and ("a", P_DEL) in ops
    assert ("xb", P_SUB) in ops and ("ax", P_SUB) in ops
    assert ("xab", P_INS) in ops and ("axb", P_INS) in ops
    assert all(not t.endswith("ab_appended") for t, _ in ops)
    # no end-insertion: 'abx' only reachable as a SUB of... it is not:
    assert ("abx", P_INS) not in ops


def test_beam_with_distance2(fixture_scorer, fixture_lexicon):
    from post_ocr_corretion_spark.core.beam import correct_sentence

    out1 = correct_sentence("the scn is fast", fixture_scorer, fixture_lexicon, max_distance=1)
    out2 = correct_sentence("the scn is fast", fixture_scorer, fixture_lexicon, max_distance=2)
    assert len(out1) == len(out2) == 4


def test_spark_udf_distance2_matches_core(spark, docs_rows, fixture_lexicon, fixture_scorer):
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.core.beam import correct_sentence
    from post_ocr_corretion_spark.operators.correction import run_beam_udf

    texts = [r["text"] for r in docs_rows[:15]]
    df = spark.createDataFrame([(t,) for t in texts], "extracted_text string")
    scorer_bc = spark.sparkContext.broadcast(fixture_scorer)
    lex_bc = spark.sparkContext.broadcast(fixture_lexicon)
    rows = run_beam_udf(df, scorer_bc, lex_bc, max_distance=2).collect()
    by_text = {r.extracted_text: r.corrected_words for r in rows}
    for t in texts:
        want = correct_sentence(t, fixture_scorer, fixture_lexicon, max_distance=2)
        assert by_text[t] == want


def test_catalyst_pairs_d2_match_core(spark, fixture_lexicon):
    """VERDICT r1 item 4: the pure-Catalyst frontier formulation of
    distance-2 candidate pairs equals core get_alternative_word(2) —
    including the words_for_generation loop guard — for every probe word."""
    from post_ocr_corretion_spark.operators.candidates import candidate_pairs_d2

    probes = ["quy", "qxxry", "ken", "cit.", "dis0ric!", "scn", "the", "a", "...."]
    lex_df = spark.createDataFrame([(w,) for w in sorted(fixture_lexicon)], "word string")
    err = spark.createDataFrame([(w.lower(),) for w in probes], "err_word string")
    got: dict[str, set] = {w.lower(): set() for w in probes}
    for r in candidate_pairs_d2(err, lex_df).collect():
        got[r.err_word].add((r.word, r.score))
    for w in probes:
        w = w.lower()
        want = get_alternative_word(w, fixture_lexicon, max_distance=2)
        assert got[w] == want, (w, got[w] ^ want)


def test_pipeline_modes_agree_at_distance2(spark, docs_rows):
    """Both pipeline modes stay byte-identical at max_distance=2."""
    from post_ocr_corretion_spark.pipeline import run_pipeline_from_docs

    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in docs_rows[:30]],
        "doc_id long, text string, lang string",
    )
    cols = ["url", "corrected_text"]
    udf = {r.url: r for r in run_pipeline_from_docs(spark, docs, mode="udf", max_distance=2).select(cols).collect()}
    cat = {r.url: r for r in run_pipeline_from_docs(spark, docs, mode="catalyst", max_distance=2).select(cols).collect()}
    assert udf == cat
