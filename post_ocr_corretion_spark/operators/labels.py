"""Detector-label generation (J3 window-containment band join) and
first-subtoken alignment (W6) — BERTpreprocessing.py re-expressed as
DataFrame ops.

J3 (BERTpreprocessing.py:67-80): word i of the input sentence is labeled
1 iff the same word occurs in the output sentence within the position
window [i-Δ-1, i+Δ+1), Δ = |len(in) - len(out)|.  Reference is a per-row
Python loop; here it is a posexplode of both word arrays and a range
(band) join on (doc_id, word, position window) + groupBy max — the
classic Spark band-join shape (SURVEY.md §2.3 J3).

W6 (BERTpreprocessing.py:106-120): given sub-token rows with a word index,
only the FIRST sub-token of each word keeps its label; the rest get -100
— a lag() window comparison.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

PAD_LABEL = -100


def window_containment_labels(
    pairs: DataFrame,
    in_col: str = "input_words",
    out_col: str = "output_words",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, input_words, output_words) → (doc_id, labels:array<int>).

    Exact reference semantics including the asymmetric window: python's
    ``output[max(0, i-Δ-1) : min(len, i+Δ+1)]`` is inclusive left,
    EXCLUSIVE right → out_pos ∈ [i-Δ-1, i+Δ]."""
    delta = F.abs(F.size(in_col) - F.size(out_col))
    base = pairs.select(id_col, in_col, out_col, delta.alias("delta"))

    inp = base.select(
        id_col, "delta", F.size(in_col).alias("n_in"), F.posexplode(in_col).alias("pos", "word")
    )
    # rename the join-key on the build side: both legs descend from the
    # same plan, and a self-join on identically-named lineage columns
    # resolves to a trivially-true predicate
    outp = base.select(
        F.col(id_col).alias("_odoc"), F.posexplode(out_col).alias("opos", "oword")
    )

    joined = inp.join(
        outp,
        (F.col(id_col) == F.col("_odoc"))
        & (F.col("word") == F.col("oword"))
        & (F.col("opos") >= F.col("pos") - F.col("delta") - 1)
        & (F.col("opos") <= F.col("pos") + F.col("delta")),
        "left",
    )
    per_pos = joined.groupBy(id_col, "pos").agg(
        F.max(F.when(F.col("opos").isNotNull(), 1).otherwise(0)).alias("hit")
    )
    return (
        per_pos.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "hit"))).alias("ph"))
        .select(id_col, F.col("ph")["hit"].alias("labels"))
    )


def first_subtoken_alignment(
    tokens: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "tok_pos",
    word_idx_col: str = "word_idx",
    label_col: str = "word_label",
) -> DataFrame:
    """W6 — adds ``aligned_label``: the word label on the first sub-token
    of each word, PAD_LABEL (-100) on continuation sub-tokens and on
    special tokens (null word_idx)."""
    w = W.partitionBy(id_col).orderBy(pos_col)
    prev = F.lag(word_idx_col).over(w)
    aligned = (
        F.when(F.col(word_idx_col).isNull(), F.lit(PAD_LABEL))
        .when(prev.isNotNull() & (prev == F.col(word_idx_col)), F.lit(PAD_LABEL))
        .otherwise(F.col(label_col))
    )
    return tokens.withColumn("aligned_label", aligned)


def reference_labels_py(input_words: list[str], output_words: list[str]) -> list[int]:
    """The reference loop verbatim (BERTpreprocessing.py:67-80) — the
    oracle for window_containment_labels tests."""
    out = []
    diff = abs(len(input_words) - len(output_words))
    for i, word in enumerate(input_words):
        lo = max(0, i - diff - 1)
        hi = min(len(output_words), i + diff + 1)
        out.append(1 if word in output_words[lo:hi] else 0)
    return out
