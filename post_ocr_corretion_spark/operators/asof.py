"""As-of (nearest-prior) join — the canonical "operator Spark lacks"
from the round brief, composed from existing DataFrame ops rather than a
theta-join or per-row Python.

Semantics (direction='backward', the classic market-data/asof case): for
each LEFT row, attach the RIGHT row with the greatest ``right_ts`` ≤ the
left row's ``left_ts`` within the same ``by`` key (ties at equal ts
include the right row — ASOF ``>=``). DuckDB's native ``ASOF LEFT JOIN``
is the oracle (`asof_events` in __spark_entry__.py).

Plan shape: union the tagged sides, ONE shuffle on the key, and an
ordered running ``last(ignorenulls)`` window fill — O(n log n) per key
partition, no range-join explosion, no driver loop. At 100 TB both
sides shuffle once on ``by`` (the same exchange a sort-merge join would
pay) and the window is a single pass; skewed keys fall under AQE like
any other exchange.

The right side must be UNIQUE per (by, right_ts) — enforced here with a
loud error, because silently picking an arbitrary duplicate is exactly
the nondeterminism engines disagree on (DuckDB picks one arbitrarily;
this operator refuses instead).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join; right's non-key columns arrive suffixed
    (including its timestamp, as ``<right_ts><suffix>``), null when no
    right row is at-or-before the left row's timestamp.

    Duplicate (by, ts) right rows would make the result
    engine-nondeterministic; they are rejected LAZILY inside the same
    plan (a lag check over the already-sorted window raises via
    ``raise_error`` at execution) so the operator stays one-shuffle and
    builds no eager validation job (r3 review)."""
    rcols = [c for c in right.columns if c != by]
    reserved = {"_asof_ts", "_is_ref", "_has_dup"}
    clashes = (
        (set(left.columns) & ({c + suffix for c in rcols} | reserved))
        | (set(right.columns) & reserved)
        | ({"_f_" + c for c in rcols} & set(left.columns))
    )
    if clashes:
        raise ValueError(
            f"asof_join column-name collisions {sorted(clashes)}: rename the "
            f"inputs or pass a different suffix (silent overwrite would corrupt "
            f"the fill)"
        )
    tagged_right = right.select(
        F.col(by),
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(c + suffix) for c in rcols],
        F.lit(1).alias("_is_ref"),
    )
    tagged_left = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_is_ref", F.lit(0)
    )
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    # at equal timestamps the reference row must precede the probe row so
    # the running last() already covers it (ASOF's >= contract)
    order = [F.col("_asof_ts").asc(), F.col("_is_ref").desc()]
    w = W.partitionBy(by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    # two ref rows with equal (by, ts) sit adjacent under this sort — a
    # lag over the SAME window ordering detects them with no extra
    # exchange, and the full-partition max turns it into a per-key flag
    dup_here = (
        (F.col("_is_ref") == 1)
        & (F.lag("_is_ref").over(W.partitionBy(by).orderBy(*order)) == 1)
        & (F.lag("_asof_ts").over(W.partitionBy(by).orderBy(*order)) == F.col("_asof_ts"))
    )
    w_full = W.partitionBy(by).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    filled = u.select(
        "*",
        F.max(dup_here.cast("int")).over(w_full).alias("_has_dup"),
        *[F.last(c + suffix, ignorenulls=True).over(w).alias("_f_" + c) for c in rcols],
    )
    guard = F.when(
        F.col("_has_dup") == 1,
        F.raise_error(
            F.lit(
                "asof_join right side has duplicate (by, ts) rows — aggregate "
                "it first (arbitrary-duplicate selection is engine-"
                "nondeterministic)"
            )
        ),
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.coalesce(guard, F.col("_f_" + c)).alias(c + suffix) for c in rcols
    ]
    return filled.filter(F.col("_is_ref") == 0).select(*out_cols)
