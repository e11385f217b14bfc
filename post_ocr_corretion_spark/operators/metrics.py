"""Evaluation metrics as DataFrame operators (A9-A15, metrics.py +
analisys.py + seq2seqEvaluation.py of the reference).

All per-document: the reference computes a 2×2 confusion matrix per doc
(metrics.py:25-29), per-doc precision/recall/accuracy/F1 (:32-47,
f1 at :22), then averages with POPULATION std (analisys.py:30-32 uses
np.std).  The global matrix is the element-wise sum (A13,
analisys.py:24-27)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import indel_ratio_udf


def confusion_counts(labels: DataFrame, id_col="doc_id", label_col="label", pred_col="pred") -> DataFrame:
    """A9 — per-doc 2×2 counts: (doc_id, tp, fp, fn, tn). Inputs: one row
    per (doc, position) with effective label and computed pred."""
    lab, pred = F.col(label_col), F.col(pred_col)
    return labels.groupBy(id_col).agg(
        F.sum(F.when((lab == 1) & (pred == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((lab == 0) & (pred == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((lab == 1) & (pred == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((lab == 0) & (pred == 0), 1).otherwise(0)).alias("tn"),
    )


def per_doc_metrics(cm: DataFrame) -> DataFrame:
    """A10 — per-doc precision/recall/accuracy/f1 from confusion counts.
    Divisions by zero yield null, like the reference's NaN."""
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return cm.select(
        "*",
        p.alias("precision"),
        r.alias("recall"),
        ((tp + tn) / (tp + tn + fp + fn)).alias("accuracy"),
        (2 * p * r / (p + r)).alias("f1"),
    )


def avg_std(df: DataFrame, col: str) -> DataFrame:
    """A11 — mean + POPULATION std (np.std semantics → stddev_pop)."""
    return df.agg(
        F.avg(col).alias(f"avg_{col}"),
        F.stddev_pop(col).alias(f"std_{col}"),
    )


def global_confusion(cm: DataFrame) -> DataFrame:
    """A13 — element-wise sum of the per-doc matrices."""
    return cm.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"), F.sum("tn").alias("tn")
    )


def avg_levenshtein_ratio(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """A12/M5 — mean ± population std of the exact indel ratio
    (seq2seqEvaluation.py:63-72) over (produced, correct) pairs."""
    scored = pairs.select(indel_ratio_udf(F.col(a_col), F.col(b_col)).alias("ratio"))
    return scored.agg(
        F.avg("ratio").alias("avg_ratio"), F.stddev_pop("ratio").alias("std_ratio")
    )


def word_difference_count(pairs: DataFrame, in_col="input_words", out_col="output_words", id_col="doc_id") -> DataFrame:
    """A14 (analisys.py:53-59) — per doc, count of input words absent from
    the paired output word list (multiset NOT respected: membership test,
    duplicates of a present word all count as present)."""
    return pairs.select(
        id_col,
        F.size(F.filter(F.col(in_col), lambda w: ~F.array_contains(F.col(out_col), w))).alias(
            "n_diff"
        ),
    )


def entity_spans(tokens: DataFrame, id_col="doc_id", pos_col="pos", type_col="etype") -> DataFrame:
    """M6 (seqeval-style): contiguous runs of same-typed tokens become
    entity spans (doc_id, s, e, etype). BIO semantics pinned to the
    run-grouping form: a span starts where the type appears after a
    different (or null) type — equivalent to seqeval's default scheme
    when tags are derived from token types. Pure Catalyst: one window
    (lag + running sum of span starts), one groupBy."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(pos_col)
    is_start = (
        F.col(type_col).isNotNull()
        & (
            F.lag(type_col).over(w).isNull()
            | (F.lag(type_col).over(w) != F.col(type_col))
        )
    ).cast("int")
    grp = F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        tokens.withColumn("_grp", grp)
        .filter(F.col(type_col).isNotNull())
        .groupBy(id_col, "_grp", type_col)
        .agg(F.min(pos_col).alias("s"), F.max(pos_col).alias("e"))
        .select(id_col, "s", "e", type_col)
    )


def seqeval_entity_f1(gold_spans: DataFrame, pred_spans: DataFrame, id_col="doc_id") -> DataFrame:
    """Entity-level exact-match P/R/F1 (seqeval semantics: an entity
    counts iff (start, end, type) all agree). ONE distributed job: a full
    outer join on the span key with presence markers, then a single
    aggregate — no driver-side counting. One row:
    (n_gold, n_pred, n_match, precision, recall, f1)."""
    g = gold_spans.withColumn("_g", F.lit(1))
    p = pred_spans.withColumn("_p", F.lit(1))
    j = g.join(p, [id_col, "s", "e", "etype"], "full")
    agg = j.agg(
        F.coalesce(F.sum("_g"), F.lit(0)).alias("n_gold"),
        F.coalesce(F.sum("_p"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.sum(F.col("_g") * F.col("_p")), F.lit(0)).alias("n_match"),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_match") / F.col("n_pred")).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_gold") > 0, F.col("n_match") / F.col("n_gold")).otherwise(F.lit(0.0))
    return (
        agg.withColumn("precision", F.round(prec, 6))
        .withColumn("recall", F.round(rec, 6))
        .withColumn(
            "f1",
            F.round(
                F.when(
                    prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )
