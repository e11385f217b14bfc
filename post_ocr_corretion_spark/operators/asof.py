"""As-of (nearest-in-time) join — the canonical "operator Spark lacks"
from the round brief, composed from existing DataFrame ops rather than a
theta-join or per-row Python.

Directions (the three-way contract users of market/event data expect,
VERDICT r3 item 6):

- ``backward`` (default, the classic asof): for each LEFT row, the RIGHT
  row with the greatest ``right_ts`` <= the left ts within the same
  ``by`` key (ties at equal ts include the right row — ASOF ``>=``).
- ``forward``: the right row with the SMALLEST ``right_ts`` >= the left
  ts (ties included — ASOF ``<=``).
- ``nearest``: whichever of the two candidates is closer in absolute
  time; exact ties go BACKWARD (the documented convention — DuckDB has
  no native nearest, so the oracle composes its backward+forward ASOF).

``tolerance`` (seconds for timestamp columns, plain difference for
numeric ts columns) bounds the fill distance: a match farther than the
tolerance is nulled, exactly pandas.merge_asof's contract.

DuckDB's native ``ASOF LEFT JOIN`` oracles backward (`asof_events`) and
forward (`asof_events_forward`); tolerance is a residual CASE over the
fill distance (`asof_events_tolerance`) — if a nearest-prior row exists
but sits beyond the tolerance, no closer one can exist either, so the
post-filter is exact, not approximate.

Plan shape: union the tagged sides, ONE shuffle on the key, and ordered
running window fills (``last(ignorenulls)`` looking back and/or
``first(ignorenulls)`` looking forward — both frames ride the SAME sort,
so ``nearest`` still pays one exchange) — O(n log n) per key partition,
no range-join explosion, no driver loop. At 100 TB both sides shuffle
once on ``by`` (the same exchange a sort-merge join would pay) and the
window is a single pass; skewed keys fall under AQE like any other
exchange.

The right side must be UNIQUE per (by, right_ts) — enforced here with a
loud error, because silently picking an arbitrary duplicate is exactly
the nondeterminism engines disagree on (DuckDB picks one arbitrarily;
this operator refuses instead).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join; right's non-key columns arrive suffixed (including its
    timestamp, as ``<right_ts><suffix>``), null when no right row matches
    the direction (or none within ``tolerance``).

    Duplicate (by, ts) right rows would make the result
    engine-nondeterministic; they are rejected LAZILY inside the same
    plan (a lag check over the already-sorted window raises via
    ``raise_error`` at execution) so the operator stays one-shuffle and
    builds no eager validation job (r3 review)."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance!r}")
    rcols = [c for c in right.columns if c != by]
    reserved = {"_asof_ts", "_is_ref", "_has_dup"}
    clashes = (
        (set(left.columns) & ({c + suffix for c in rcols} | reserved))
        | (set(right.columns) & reserved)
        | ({"_b_" + c for c in rcols} & set(left.columns))
        | ({"_fw_" + c for c in rcols} & set(left.columns))
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
    # tie placement encodes the >= / <= contracts: backward needs the
    # equal-ts ref BEFORE the probe (running last() covers it), forward
    # needs it AFTER (running first() covers it). nearest needs BOTH
    # fills — refs-first ordering keeps backward exact, and the forward
    # fill skips an equal-ts ref only to have the backward fill pick it
    # up at distance 0, which nearest's backward-tie rule prefers anyway.
    refs_first = direction in ("backward", "nearest")
    order = [
        F.col("_asof_ts").asc(),
        F.col("_is_ref").desc() if refs_first else F.col("_is_ref").asc(),
    ]
    w_sort = W.partitionBy(by).orderBy(*order)
    w_back = w_sort.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = w_sort.rowsBetween(W.currentRow, W.unboundedFollowing)
    # two ref rows with equal (by, ts) sit adjacent under this sort — a
    # lag over the SAME window ordering detects them with no extra
    # exchange, and the full-partition max turns it into a per-key flag
    dup_here = (
        (F.col("_is_ref") == 1)
        & (F.lag("_is_ref").over(w_sort) == 1)
        & (F.lag("_asof_ts").over(w_sort) == F.col("_asof_ts"))
    )
    w_full = w_sort.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    fills = []
    if direction in ("backward", "nearest"):
        fills += [F.last(c + suffix, ignorenulls=True).over(w_back).alias("_b_" + c) for c in rcols]
    if direction in ("forward", "nearest"):
        fills += [F.first(c + suffix, ignorenulls=True).over(w_fwd).alias("_fw_" + c) for c in rcols]
    filled = u.select(
        "*",
        F.max(dup_here.cast("int")).over(w_full).alias("_has_dup"),
        *fills,
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

    # fill-distance arithmetic: timestamps via fractional epoch seconds
    # (cast-to-double keeps sub-second precision, unlike unix_timestamp).
    # TIMESTAMP_NTZ has no direct double cast — route it through the
    # session-tz timestamp first; the tz shift is identical on both
    # operands and cancels in the difference.
    ts_type = dict(u.dtypes)["_asof_ts"]

    def _secs(col):
        if ts_type == "timestamp_ntz":
            return col.cast("timestamp").cast("double")
        if ts_type.startswith("timestamp"):
            return col.cast("double")
        return col

    def dist(fill_ts_col):
        return F.abs(_secs(F.col("_asof_ts")) - _secs(fill_ts_col))

    ts_key = right_ts  # the suffixed right ts rides in rcols
    if direction == "backward":
        picked = {c: F.col("_b_" + c) for c in rcols}
        pick_dist = dist(F.col("_b_" + ts_key))
    elif direction == "forward":
        picked = {c: F.col("_fw_" + c) for c in rcols}
        pick_dist = dist(F.col("_fw_" + ts_key))
    else:
        b_dist = dist(F.col("_b_" + ts_key))
        f_dist = dist(F.col("_fw_" + ts_key))
        # null-safe closer-of-two; exact tie → backward
        use_back = F.when(F.col("_b_" + ts_key).isNull(), F.lit(False)).otherwise(
            F.col("_fw_" + ts_key).isNull() | (b_dist <= f_dist)
        )
        picked = {
            c: F.when(use_back, F.col("_b_" + c)).otherwise(F.col("_fw_" + c)) for c in rcols
        }
        pick_dist = F.when(use_back, b_dist).otherwise(f_dist)
    if tolerance is not None:
        in_tol = pick_dist <= F.lit(tolerance)
        picked = {c: F.when(in_tol, v) for c, v in picked.items()}
    out_cols = [F.col(c) for c in left.columns] + [
        F.coalesce(guard, picked[c]).alias(c + suffix) for c in rcols
    ]
    return filled.filter(F.col("_is_ref") == 0).select(*out_cols)
