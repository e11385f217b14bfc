"""Deterministic corpus shuffle + shard assignment — the step between a
scrubbed training table and the trainer's data loader: every document
gets a pseudo-random but fully reproducible (seed, shard, position)
placement, so a 1000-worker training job can each read exactly one
shard in a stable order, and re-running the build bit-reproduces the
epoch layout.

Hash scheme: md5(seed + '#' + id) — the repo-wide oracle-replayable
choice (DuckDB computes the identical hex; xxhash64 would be
Spark-only, see operators/sampling.py:34). Shard = first 16 hex chars
as an unsigned 64-bit value mod n_shards (the scorer_fit.py conv/pmod
decimal idiom, no signed-long overflow); position = rank of the full
hash within the shard.

Scale shape: one shuffle, partitioned BY SHARD — the per-shard
row_number window is the only sort, and n_shards is the parallelism
unit (a real training corpus uses hundreds to thousands of shards, so
tasks stay small; a global total-order sort is never planned). Skew is
structurally impossible: md5 spreads ids uniformly, so shards differ
by O(sqrt(n/shards)).

Reference scope note: no analog in the OCR reference (single-node,
50-doc corpus) — this is round-1-brief training-pipeline surface.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deterministic_shuffle(
    docs: DataFrame,
    n_shards: int,
    seed: str = "0",
    id_col: str = "doc_id",
) -> DataFrame:
    """All input columns plus (shard, pos_in_shard): a seeded,
    reproducible random permutation of the corpus, materialized as
    shard assignment + dense 0-based position within each shard.
    Distinct ids can never tie (md5 order, id tiebreak is therefore
    only defensive), so the layout is partitioning-independent.

    Rows with a NULL id cannot be placed reproducibly (every NULL
    hashes identically, so their relative order would be
    partitioning-dependent) — they are emitted with NULL
    shard/pos_in_shard instead of a silently nondeterministic
    placement; assign ids upstream or filter them."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    nn = F.col(id_col).isNotNull()
    h = F.when(
        nn, F.md5(F.concat_ws("#", F.lit(str(seed)), F.col(id_col).cast("string")))
    )
    shard = F.pmod(
        F.conv(F.substring(F.col("_h"), 1, 16), 16, 10).cast("decimal(38,0)"),
        F.lit(n_shards),
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        docs.withColumn("_h", h)
        .withColumn("shard", F.when(nn, shard))
        .withColumn(
            "pos_in_shard",
            F.when(nn, (F.row_number().over(w) - 1).cast("long")),
        )
        .drop("_h")
    )
