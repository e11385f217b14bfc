"""J3 band-join labels ≡ reference loop; W6 alignment; A9-A14 metrics."""
from __future__ import annotations

from post_ocr_corretion_spark.operators.labels import (
    PAD_LABEL,
    first_subtoken_alignment,
    reference_labels_py,
    window_containment_labels,
)

CASES = [
    (1, ["a", "b", "c"], ["a", "b", "c"]),
    (2, ["a", "b", "c", "d"], ["a", "c"]),            # len differs by 2
    (3, ["x", "x", "y"], ["y", "x"]),                  # duplicates
    (4, ["w1", "w2"], ["w3", "w4", "w5", "w6", "w7"]),
    (5, ["far", "away"], ["away", "zz", "zz", "zz", "zz", "zz", "far"]),
    (6, ["only"], ["only"]),
]


def test_j3_band_join_matches_reference(spark):
    df = spark.createDataFrame(CASES, "doc_id long, input_words array<string>, output_words array<string>")
    got = {r.doc_id: list(r.labels) for r in window_containment_labels(df).collect()}
    for doc_id, inp, out in CASES:
        assert got[doc_id] == reference_labels_py(inp, out), (doc_id, got[doc_id])


def test_w6_first_subtoken_alignment(spark):
    rows = [
        (1, 0, None, 0),   # special token
        (1, 1, 0, 1),      # first subtoken of word 0 → keeps label
        (1, 2, 0, 1),      # continuation → -100
        (1, 3, 1, 0),      # first subtoken of word 1
        (1, 4, None, 0),   # special
    ]
    df = spark.createDataFrame(rows, "doc_id long, tok_pos int, word_idx int, word_label int")
    got = {r.tok_pos: r.aligned_label for r in first_subtoken_alignment(df).collect()}
    assert got == {0: PAD_LABEL, 1: 1, 2: PAD_LABEL, 3: 0, 4: PAD_LABEL}


def test_confusion_and_metrics(spark):
    from post_ocr_corretion_spark.operators.metrics import (
        avg_std,
        confusion_counts,
        global_confusion,
        per_doc_metrics,
    )

    rows = [(1, 1, 1), (1, 1, 0), (1, 0, 1), (1, 0, 0), (2, 1, 1), (2, 1, 1)]
    df = spark.createDataFrame(rows, "doc_id long, label int, pred int")
    cm = {r.doc_id: (r.tp, r.fp, r.fn, r.tn) for r in confusion_counts(df).collect()}
    assert cm == {1: (1, 1, 1, 1), 2: (2, 0, 0, 0)}

    m = {r.doc_id: r for r in per_doc_metrics(confusion_counts(df)).collect()}
    assert m[1].precision == 0.5 and m[1].recall == 0.5 and m[1].accuracy == 0.5 and m[1].f1 == 0.5
    assert m[2].precision == 1.0 and m[2].f1 == 1.0

    g = global_confusion(confusion_counts(df)).collect()[0]
    assert (g.tp, g.fp, g.fn, g.tn) == (3, 1, 1, 1)

    import numpy as np

    s = avg_std(per_doc_metrics(confusion_counts(df)), "precision").collect()[0]
    assert abs(s.avg_precision - 0.75) < 1e-12
    assert abs(s.std_precision - float(np.std([0.5, 1.0]))) < 1e-12  # population std


def test_a12_levenshtein_aggregate(spark):
    from post_ocr_corretion_spark.core.levenshtein import avg_levenshtein_ratio as core_avg
    from post_ocr_corretion_spark.operators.metrics import avg_levenshtein_ratio

    pairs = [("abc", "abd"), ("Same", "same"), ("kitten", "sitting")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = avg_levenshtein_ratio(df, "a", "b").collect()[0]
    want_avg, want_std = core_avg([a for a, _ in pairs], [b for _, b in pairs])
    assert abs(got.avg_ratio - want_avg) < 1e-12
    assert abs(got.std_ratio - want_std) < 1e-12


def test_a14_word_difference(spark):
    from post_ocr_corretion_spark.operators.metrics import word_difference_count

    rows = [(1, ["a", "b", "b"], ["b"]), (2, ["x"], ["x"])]
    df = spark.createDataFrame(rows, "doc_id long, input_words array<string>, output_words array<string>")
    got = {r.doc_id: r.n_diff for r in word_difference_count(df).collect()}
    assert got == {1: 1, 2: 0}  # duplicates of present words count as present


def test_entity_spans_and_seqeval_f1_hand_case(spark):
    """M6: spans from a tiny hand-checked token stream, and the exact-match
    F1 arithmetic."""
    from post_ocr_corretion_spark.operators.metrics import entity_spans, seqeval_entity_f1

    # doc 1: [LONG LONG] [MID] O [LONG]  → 3 gold spans
    gold_tok = spark.createDataFrame(
        [(1, 0, "LONG"), (1, 1, "LONG"), (1, 2, "MID"), (1, 3, None), (1, 4, "LONG")],
        "doc_id long, pos int, etype string",
    )
    gold = entity_spans(gold_tok)
    assert {(r.doc_id, r.s, r.e, r.etype) for r in gold.collect()} == {
        (1, 0, 1, "LONG"),
        (1, 2, 2, "MID"),
        (1, 4, 4, "LONG"),
    }
    # pred: first span truncated to [0,0], MID span exact, third missed,
    # plus a spurious MID at 3 → matches = 1
    pred_tok = spark.createDataFrame(
        [(1, 0, "LONG"), (1, 1, None), (1, 2, "MID"), (1, 3, "MID"), (1, 4, None)],
        "doc_id long, pos int, etype string",
    )
    pred = entity_spans(pred_tok)
    # note: pos 2 and 3 are ADJACENT same-type tokens → one span (2,3),
    # so the exact MID match disappears too: matches = 0... verify:
    got = {(r.s, r.e, r.etype) for r in pred.collect()}
    assert got == {(0, 0, "LONG"), (2, 3, "MID")}
    row = seqeval_entity_f1(gold, pred).collect()[0]
    assert (row.n_gold, row.n_pred, row.n_match) == (3, 2, 0)
    assert row.precision == 0.0 and row.recall == 0.0 and row.f1 == 0.0
    # identical streams → perfect score
    perfect = seqeval_entity_f1(gold, entity_spans(gold_tok)).collect()[0]
    assert (perfect.precision, perfect.recall, perfect.f1) == (1.0, 1.0, 1.0)
