"""Training-data sampling + batch-packing operators.

``stratified_sample_exact``: per-stratum sampling with EXACT counts —
``df.sampleBy`` is Bernoulli (±√n wobble per stratum and seed-dependent
across Spark versions), which breaks reproducible training mixes. Here
each stratum keeps exactly ``floor(frac · n)`` rows, chosen by a
deterministic pseudo-random hash order (md5 of the id rendered as text
— reproducible bit-for-bit in ANY engine, which is what lets DuckDB
oracle it). One shuffle on the stratum key, one window; at 100 TB the
per-stratum ordering is the same sort a groupBy would pay, and skewed
strata fall under AQE.

``pack_greedy``: sequence packing — the LLM-training step that fills
fixed token budgets with consecutive documents. Greedy first-fit in a
deterministic order is inherently SEQUENTIAL per shard, so it runs as
one ``applyInPandas`` pass per shard (Arrow-batched, the sanctioned
Python escape for order-dependent per-group logic — SURVEY §2.10 M7);
shards are independent, so the parallelism unit is the shard, exactly
how a 100 TB corpus would be packed (thousands of shards, one linear
scan each). Documents larger than the budget get their own batch. The
DuckDB oracle replays the same recursion as a recursive CTE, so the
gate proves the sequential semantics, not just row counts.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def _hash_order(id_col: Column) -> Column:
    # md5 over the DECIMAL string rendering: identical in DuckDB
    # (md5(CAST(x AS VARCHAR))), unlike xxhash64 which only Spark has
    return F.md5(id_col.cast("string"))


def stratified_sample_exact(
    df: DataFrame, stratum_col: str, frac: float, id_col: str
) -> DataFrame:
    """Exactly floor(frac·n) rows per stratum, deterministically chosen
    by md5(id) order (ties impossible for distinct ids)."""
    if not (0.0 <= frac <= 1.0):
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    w = W.partitionBy(stratum_col).orderBy(_hash_order(F.col(id_col)), F.col(id_col))
    wn = W.partitionBy(stratum_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .filter(F.col("_rk") <= F.floor(F.col("_n") * F.lit(frac)))
        .drop("_rk", "_n")
    )


def stratified_sample_exact_salted(
    df: DataFrame, stratum_col: str, frac: float, id_col: str, prefix_len: int = 1
) -> DataFrame:
    """Row-identical to ``stratified_sample_exact`` but skew-proof
    (VERDICT r4 item 7): the plain form windows over the stratum alone,
    so a 50%-hot stratum sorts in ONE task. Here the global-per-stratum
    rank is recovered from per-(stratum, bucket) local ranks — the same
    offsets trick as the distributed dictionary encode (d5,
    operators/lexicon.py): the selection key is the md5 hex string, and
    its first ``prefix_len`` hex chars are a RANGE prefix of that very
    order, so rank(stratum) = offset(stratum, bucket) + rank(stratum,
    bucket). The offsets come from a tiny (strata × 16^prefix_len)-row
    aggregate joined back by broadcast; the heavy window partitions by
    (stratum, bucket), bounding any task at ~1/16^prefix_len of the
    hottest stratum. One extra cheap aggregation buys hot-stratum
    parallelism; output rows are byte-identical (tested)."""
    if not (0.0 <= frac <= 1.0):
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    key = _hash_order(F.col(id_col))
    bucketed = df.withColumn("_bkt", F.substring(key, 1, prefix_len))
    counts = (
        bucketed.groupBy(stratum_col, "_bkt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    woff = W.partitionBy(stratum_col).orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    wtot = W.partitionBy(stratum_col)
    offsets = counts.select(
        stratum_col,
        "_bkt",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
        F.sum("_c").over(wtot).alias("_n"),
    )
    wloc = W.partitionBy(stratum_col, "_bkt").orderBy(_hash_order(F.col(id_col)), F.col(id_col))
    # null-safe join (ADVICE r5): the plain windowed form keeps a NULL
    # stratum (or NULL id → NULL md5 bucket) as its own partition, so an
    # equi-join here would silently drop those rows and break the
    # row-identity contract — eqNullSafe on both keys preserves them.
    b, o = bucketed.alias("_b"), offsets.alias("_o")
    cond = F.col(f"_b.{stratum_col}").eqNullSafe(F.col(f"_o.{stratum_col}")) & F.col(
        "_b._bkt"
    ).eqNullSafe(F.col("_o._bkt"))
    return (
        b.join(F.broadcast(o), cond)
        .select("_b.*", F.col("_o._off").alias("_off"), F.col("_o._n").alias("_n"))
        .withColumn("_rk", F.row_number().over(wloc) + F.col("_off"))
        .filter(F.col("_rk") <= F.floor(F.col("_n") * F.lit(frac)))
        .drop("_bkt", "_off", "_n", "_rk")
    )


def pack_greedy(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Greedy first-fit packing: scan each shard in ``order_col`` order,
    accumulate ``size_col`` into the current batch, open a new batch when
    the next row would exceed ``budget``. Output = input columns +
    ``batch_id`` (1-based per shard)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out_schema = T.StructType(df.schema.fields + [T.StructField("batch_id", T.LongType(), False)])
    cols = df.columns

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        batch, acc, out = 0, 0, []
        for size in pdf[size_col]:
            s = int(size)
            if batch == 0 or acc + s > budget:
                batch += 1
                acc = s
            else:
                acc += s
            out.append(batch)
        pdf = pdf[cols].copy()
        pdf["batch_id"] = out
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, out_schema)
