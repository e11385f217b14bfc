"""Segmentation-dataset ETL (the seq2seq preprocessing dataflow, SURVEY.md
§3.2) — pure Catalyst expressions end-to-end, zero UDFs.

Reference: seq2seqPreprocessing.py. The torch training itself is out of
engine scope (SURVEY.md §3.2); what we rebuild is the dataflow that feeds
it: clean (P2) → iterative split-to-fit ≤256 chars (D2/W7) → de-space
input (P4) → char split with '#' space marker (P3/P5) → vocabulary (A1)
→ bos/eos wrap (D3) → pad (D4/A4) → integer encode (D5).

The D2 fixpoint is a driver-side loop over DataFrames: each round splits
every too-long row at its most-central space (W7) and unions the halves;
depth is bounded by log2(maxlen/256) (SURVEY.md §2.8 D2), and sequences
with no space are dropped (the reference's over-long-single-word rule,
seq2seqPreprocessing.py:132).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.textops import BOS, EOS, MAX_SEQUENCE_LEN, PAD, SPECIAL_SYMBOLS, UNK
from ..functions.text import char_array, clean_text, despace, mark_spaces


def split_to_fit(df: DataFrame, text_col: str = "seq", max_len: int = MAX_SEQUENCE_LEN) -> DataFrame:
    """D2 — iterative split at the most-central space until every sequence
    fits. Driver loop with a bounded number of rounds; each round is one
    narrow Catalyst job over only the still-too-long rows."""
    from pyspark.sql import Window as W

    c = F.col(text_col)
    ok = df.filter(F.length(c) <= max_len)
    pending = df.filter(F.length(c) > max_len)
    while not pending.isEmpty():
        # a unique row id so duplicate sequences split independently
        tagged = pending.withColumn("_rid", F.monotonically_increasing_id())
        # W7: space position minimizing |pos - len/2| (first on ties)
        pos = tagged.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.length(c) - 1)).alias("pos"),
        ).filter(F.substring(c, F.col("pos") + 1, 1) == " ")
        metric = F.abs(F.col("pos") - F.length(c) / F.lit(2.0))
        w = W.partitionBy("_rid").orderBy(metric.asc(), F.col("pos").asc())
        best = pos.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        halves = best.select(
            *[x for x in df.columns if x != text_col],
            F.explode(
                F.array(
                    F.substring(c, 1, F.col("pos")),
                    c.substr(F.col("pos") + 2, F.length(c) - F.col("pos") - 1),
                )
            ).alias(text_col),
        ).select(*df.columns)
        # sequences with NO space never appear in `best` → dropped, the
        # reference's over-long-single-word rule (:132)
        ok = ok.unionByName(halves.filter(F.length(c) <= max_len))
        pending = halves.filter(F.length(c) > max_len).localCheckpoint(eager=True)
    return ok


def prepare_sequences(docs: DataFrame, text_col: str = "text", max_len: int = MAX_SEQUENCE_LEN) -> DataFrame:
    """P2 clean → D2 split-to-fit → (input = de-spaced, output = original).
    Returns (seq_id, output_seq, input_seq)."""
    cleaned = docs.select(clean_text(F.col(text_col)).alias("seq"))
    fitted = split_to_fit(cleaned, "seq", max_len)
    return fitted.select(
        F.monotonically_increasing_id().alias("seq_id"),
        F.col("seq").alias("output_seq"),
        despace(F.col("seq")).alias("input_seq"),
    )


def char_vocabulary(seqs: DataFrame, seq_col: str = "output_seq") -> DataFrame:
    """A1 — distinct chars of the '#'-marked sequences, sorted, indexed
    after the 4 special symbols (seq2seqPreprocessing.py:45-51).
    Columns: token, idx."""
    from pyspark.sql import Window as W

    chars = (
        seqs.select(F.explode(char_array(mark_spaces(F.col(seq_col)))).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    indexed = chars.select(
        "token", (F.row_number().over(W.orderBy("token")) + len(SPECIAL_SYMBOLS) - 1).alias("idx")
    )
    specials = seqs.sparkSession.createDataFrame(
        [(s, i) for i, s in enumerate(SPECIAL_SYMBOLS)], "token string, idx int"
    )
    return specials.unionByName(indexed)


def encode_sequences(
    seqs: DataFrame,
    vocab: DataFrame,
    seq_col: str,
    out_col: str,
    pad_to: int | None = None,
) -> DataFrame:
    """P3+P5 char split → D3 bos/eos wrap → D4 pad to batch max (A4) →
    D5 integer-encode via a map literal built from the vocab (broadcast
    once, applied with F.transform — no UDF, unk fallback via coalesce)."""
    rows = vocab.collect()
    mapping = F.create_map(*[x for r in rows for x in (F.lit(r.token), F.lit(r.idx))])
    unk_idx = next(r.idx for r in rows if r.token == UNK)
    pad_idx = next(r.idx for r in rows if r.token == PAD)
    bos_idx = next(r.idx for r in rows if r.token == BOS)
    eos_idx = next(r.idx for r in rows if r.token == EOS)

    chars = F.filter(char_array(mark_spaces(F.col(seq_col))), lambda x: x != "")
    body = F.transform(chars, lambda ch: F.coalesce(mapping[ch], F.lit(unk_idx)))
    wrapped = F.concat(F.array(F.lit(bos_idx)), body, F.array(F.lit(eos_idx)))
    df = seqs.withColumn("_enc", wrapped)
    if pad_to is None:
        pad_to_val = df.agg(F.max(F.size("_enc"))).collect()[0][0]  # A4 global max
    else:
        pad_to_val = pad_to
    padded = F.concat(
        F.col("_enc"),
        F.array_repeat(F.lit(pad_idx), F.lit(pad_to_val) - F.size("_enc")),
    )
    return df.withColumn(out_col, padded).drop("_enc")


def decode_sequence(col, vocab_rows, eos_first: bool = True):
    """P13/P14 — decode helper used in tests: truncate at <eos>, drop
    specials, join. Expression-only."""
    inv = F.create_map(*[x for r in vocab_rows for x in (F.lit(r.idx), F.lit(r.token))])
    toks = F.transform(col, lambda i: inv[i])
    pos = F.array_position(toks, EOS)
    trunc = F.when(pos > 0, F.slice(toks, 1, (pos - 1).cast("int"))).otherwise(toks)
    specials = F.array(*[F.lit(s) for s in SPECIAL_SYMBOLS])
    return F.concat_ws("", F.filter(trunc, lambda t: ~F.array_contains(specials, t)))
