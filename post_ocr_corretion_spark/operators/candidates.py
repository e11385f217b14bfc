"""Distance-1 candidate generation as SymSpell-style equi-joins (D7/D8 +
J1/J2, correctionSentences.py:108-151,265-275) — pinned semantics in
core/candidates.py.

The reference compiles a regex per edit pattern and scans Arrow buckets
(a nested-loop theta join). Here the same set algebra is THREE equi-joins
against the lexicon's deletion-neighborhood table (operators/lexicon.py):

- substitution: err-deletion-key ⋈ lex-deletion-key on (delkey, pos) where
  the lexicon char at pos is a word char;
- deletion: err-deletion-key ⋈ lexicon word;
- insertion: err base word ⋈ lex-deletion-key on delkey where the deleted
  char is a word char (insert positions 0..len-1 — the reference never
  inserts at the end, correctionSentences.py:143-145);

plus the unconditional (w, 1.0) / (w_nopunct, 1.0) candidates
(correctionSentences.py:269).  Everything is Catalyst; the only Python is
the word-prob pandas UDF over DISTINCT candidate words.

Output ``cand_agg``: one row per error word with the pinned ORDERED batch
(sorted base candidates, then +punct variants in the same order — see
core/beam.py float-parity contract) and its left-fold score normalizer:

    err_word: string               (lowercased error word, as keyed)
    cands:    array<struct<word, score, p>>
    w_total:  double

Scale: err-side is DISTINCT error words (vocabulary-bounded — dedup before
generation is the big win at 10^12 docs); lex_del is the big side,
hash-partitioned on its join keys. Catalyst broadcasts whichever side is
small; with AQE the skew-join splitter handles hot delkeys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.candidates import P_DEL, P_INS, P_SUB, WORDCHAR
from ..functions.text import add_last_punctuation, remove_punctuation
from ..functions.udfs import make_word_prob_udf

_WORDCHARS = list(WORDCHAR)


def _deletion_keys(bases: DataFrame) -> DataFrame:
    """(err_word, base) → (err_word, base, pos, delkey) for each position."""
    b = F.col("base")
    return bases.select(
        "err_word",
        "base",
        F.explode(F.sequence(F.lit(0), F.length(b) - 1)).alias("pos"),
    ).select(
        "err_word",
        "base",
        "pos",
        F.concat(
            F.substring(b, 1, F.col("pos")),
            b.substr(F.col("pos") + 2, F.length(b) - F.col("pos") - 1),
        ).alias("delkey"),
    )


def candidate_pairs(err_words: DataFrame, lexicon: DataFrame, lex_del: DataFrame) -> DataFrame:
    """(err_word) → distinct (err_word, word, score) candidate pairs."""
    bases = (
        err_words.select("err_word", F.col("err_word").alias("base"))
        .union(err_words.select("err_word", remove_punctuation(F.col("err_word")).alias("base")))
        .filter(F.length("base") > 0)
        .distinct()
    )
    err_del = _deletion_keys(bases)

    lex_del_w = lex_del.filter(F.col("ch").isin(_WORDCHARS))
    sub = (
        err_del.join(lex_del_w, ["delkey", "pos"])
        .select("err_word", "word", F.lit(P_SUB).alias("score"))
    )
    # insertion before i covers i = 0..len(base)-1 only — the reference
    # never inserts at the END (correctionSentences.py:143-145), so the
    # inserted char must not be the lexicon word's last char.
    ins = (
        bases.join(
            lex_del_w,
            (bases.base == lex_del_w.delkey) & (lex_del_w.pos < F.length(lex_del_w.word) - 1),
        )
        .select("err_word", "word", F.lit(P_INS).alias("score"))
    )
    dele = (
        err_del.filter(F.length("delkey") > 0)
        .join(lexicon.select("word"), err_del.delkey == F.col("word"))
        .select("err_word", "word", F.lit(P_DEL).alias("score"))
    )
    unconditional = (
        err_words.select("err_word", F.col("err_word").alias("word"), F.lit(1.0).alias("score"))
        .union(
            err_words.select(
                "err_word", remove_punctuation(F.col("err_word")).alias("word"), F.lit(1.0).alias("score")
            )
        )
    )
    return sub.unionByName(ins).unionByName(dele).unionByName(unconditional).distinct()


def candidate_batches(err_words: DataFrame, lexicon: DataFrame, lex_del: DataFrame, scorer_bc) -> DataFrame:
    """Assemble the pinned ordered batch per error word (see module doc)."""
    pairs = candidate_pairs(err_words, lexicon, lex_del)
    punct = err_words.select("err_word", add_last_punctuation(F.col("err_word")).alias("punct"))
    variants = (
        pairs.join(punct.filter(F.col("punct") != ""), "err_word")
        .select("err_word", F.concat(F.col("word"), F.col("punct")).alias("word"), "score")
    )
    base_tagged = pairs.withColumn("is_variant", F.lit(False))
    var_tagged = variants.withColumn("is_variant", F.lit(True))
    all_rows = base_tagged.unionByName(var_tagged)

    word_prob = make_word_prob_udf(scorer_bc)
    probs = (
        all_rows.select("word").distinct().withColumn("p", word_prob(F.col("word")))
    )
    scored = all_rows.join(probs, "word")

    entry = F.struct(F.col("word"), F.col("score"), F.col("p"))
    agg = (
        scored.groupBy("err_word")
        .agg(
            F.sort_array(F.collect_list(F.when(~F.col("is_variant"), entry))).alias("base_arr"),
            F.sort_array(F.collect_list(F.when(F.col("is_variant"), entry))).alias("var_arr"),
        )
        .select(
            "err_word",
            F.concat(F.col("base_arr"), F.col("var_arr")).alias("cands"),
        )
        .withColumn(
            "w_total",
            F.aggregate(F.col("cands"), F.lit(0.0), lambda acc, c: acc + c["score"]),
        )
    )
    return agg
