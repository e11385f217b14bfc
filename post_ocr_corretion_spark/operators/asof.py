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
    right row is at-or-before the left row's timestamp."""
    rcols = [c for c in right.columns if c != by]
    dup = (
        right.groupBy(by, right_ts).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            "asof_join right side has duplicate (by, ts) rows — aggregate it "
            "first (arbitrary-duplicate selection is engine-nondeterministic)"
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
    w = (
        W.partitionBy(by)
        .orderBy(F.col("_asof_ts").asc(), F.col("_is_ref").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "*", *[F.last(c + suffix, ignorenulls=True).over(w).alias("_f_" + c) for c in rcols]
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("_f_" + c).alias(c + suffix) for c in rcols
    ]
    return filled.filter(F.col("_is_ref") == 0).select(*out_cols)
