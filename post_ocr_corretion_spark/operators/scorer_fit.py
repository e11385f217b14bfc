"""Cluster-scale scorer construction (PLANS.md / ROADMAP item 1).

The default pipeline collects the lexicon and fits the bigram model on
the driver — fine up to ~10^7 words. These operators produce the SAME two
artifacts distributively, so scorer construction scales with the corpus:

- ``bigram_counts``: character-pair counts as a DataFrame aggregation
  (explode pairs → groupBy → count), using the exact index encoding of
  core/scoring.py (boundary=1, OTHER=0, alphabet offset +2) — the
  resulting count matrix is BIT-IDENTICAL to the numpy fit (tested);
- ``distributed_bloom_positions``: Bloom bit positions hashed in the
  executors (md5-salted, identical to core/bloom.py), collapsed with
  distinct — the driver only materializes set bits, never the word list;
- ``scorer_from_spark``: assembles an NGramScorer from both.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.bloom import BloomFilter
from ..core.scoring import ALPHABET, V, NGramScorer
from ..functions.text import char_array


def bigram_counts(lexicon: DataFrame) -> DataFrame:
    """(a, b, cnt) over boundary-padded char-index pairs of every lexicon
    word. instr() against the alphabet literal reproduces _CHAR_INDEX:
    1-based position + 1 = index, 0 (absent) = OTHER, boundary = 1."""
    idx = F.transform(
        char_array(F.col("word")),
        lambda c: F.when(F.instr(F.lit(ALPHABET), c) > 0, F.instr(F.lit(ALPHABET), c) + 1).otherwise(
            F.lit(0)
        ),
    )
    padded = F.concat(F.array(F.lit(1)), idx, F.array(F.lit(1)))
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(padded) - 2),
        lambda i: F.struct(
            F.element_at(padded, i + 1).alias("a"), F.element_at(padded, i + 2).alias("b")
        ),
    )
    return (
        lexicon.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def counts_matrix(counts_df: DataFrame) -> np.ndarray:
    """Add-one-smoothed (V, V) matrix from the aggregated counts —
    same construction as NGramScorer's local fit."""
    m = np.ones((V, V), dtype=np.float64)
    for r in counts_df.collect():
        m[r.a, r.b] += r.cnt
    return m


def distributed_bloom_positions(lexicon: DataFrame, m_bits: int, k: int) -> DataFrame:
    """(pos) — distinct Bloom bit positions, hashed executor-side with the
    exact core/bloom.py scheme: md5(word + '#' + i)[:8] % m."""
    # exact reproduction of int.from_bytes(md5[:8], 'big') % m: the first
    # 16 hex chars as an UNSIGNED 64-bit value — conv() gives its decimal
    # string, pmod over decimal(38,0) avoids signed-long overflow
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.col("word"), F.lit("#"), i.cast("string"))), 1, 16),
                16,
                10,
            ).cast("decimal(38,0)"),
            F.lit(m_bits),
        ).cast("long"),
    )
    return lexicon.select(F.explode(hashes).alias("pos")).distinct()


def scorer_from_spark(
    spark: SparkSession, lexicon: DataFrame, use_bloom: bool = False, fpp: float = 0.001
) -> NGramScorer:
    counts = counts_matrix(bigram_counts(lexicon))
    if not use_bloom:
        words = frozenset(r.word for r in lexicon.select("word").collect())
        return NGramScorer(words, counts=counts)
    n = lexicon.count()
    import math

    m_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m_bits / n * math.log(2)))
    bf = BloomFilter(m_bits, k)
    bf.set_positions(r.pos for r in distributed_bloom_positions(lexicon, m_bits, k).collect())
    return NGramScorer(frozenset(), membership=bf, counts=counts)
