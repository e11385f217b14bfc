"""Native stream-stream interval join (§2.11 breadth): Spark's built-in
watermarked stream-stream equi-join with an event-time band predicate —
the engine feature for correlating two live feeds (clicks↔views,
crawl-fetch↔robots-fetch) without custom state.

One code path serves BATCH and STREAM: ``withWatermark`` is a no-op on a
batch DataFrame, so the parity test literally calls this function on
both and compares rows (tests/test_streaming_joins.py).

Semantics: inner-join rows (l, r) with ``l.by == r.by`` and ``r_ts ∈
[l_ts − lookback, l_ts]`` — "each left event with every right event in
its trailing window". State retention: Spark derives each side's
state-expiry from the OTHER side's watermark plus the band, so state is
bounded by ``watermark_delay + lookback``; rows older than that are
evicted by the engine, not by operator code. ``how='left_outer'`` also
emits unmatched left rows — but only once the right watermark passes
their band (so outer results trail the watermark; the test drives this
with clock rows, exactly like the stateful-asof suite).

At 100 TB-feed scale this plans as a single keyed state-store join: one
shuffle per side on ``by``, per-key state bounded by the time band —
the same shape a batch range join would shuffle, amortized continuously.

Timestamps are LONG epoch seconds (consistent with the other streaming
operators here); right's non-key columns arrive suffixed.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 3600,
    watermark_seconds: int = 0,
    suffix: str = "_right",
    how: str = "inner",
) -> DataFrame:
    """Band-join two (possibly streaming) DataFrames on ``by`` with
    ``right_ts`` in ``[left_ts − lookback_seconds, left_ts]``. Output:
    left columns + right's non-key columns suffixed."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    rcols = [c for c in right.columns if c != by]
    clashes = set(left.columns) & ({c + suffix for c in rcols} | {"_l_evt", "_r_evt", "_r_by"})
    if clashes:
        raise ValueError(f"interval_stream_join column collisions: {sorted(clashes)}")
    l = left.withColumn("_l_evt", F.timestamp_seconds(F.col(left_ts).cast("long")))
    r = right.select(
        F.col(by).alias("_r_by"),
        F.timestamp_seconds(F.col(right_ts).cast("long")).alias("_r_evt"),
        *[F.col(c).alias(c + suffix) for c in rcols],
    )
    if watermark_seconds is not None:
        l = l.withWatermark("_l_evt", f"{watermark_seconds} seconds")
        r = r.withWatermark("_r_evt", f"{watermark_seconds} seconds")
    cond = (
        (F.col(by) == F.col("_r_by"))
        & (F.col("_r_evt") >= F.col("_l_evt") - F.expr(f"interval {int(lookback_seconds)} seconds"))
        & (F.col("_r_evt") <= F.col("_l_evt"))
    )
    joined = l.join(r, cond, how)
    return joined.select(*left.columns, *[c + suffix for c in rcols])
