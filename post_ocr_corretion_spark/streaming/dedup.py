"""Custom stateful streaming operator: cross-micro-batch URL dedup via
``applyInPandasWithState`` (the round-1 brief's "applyInPandasWithState
for custom stateful operators").

A continuous crawl feed re-delivers urls; this operator emits each url
the FIRST time it is seen and drops re-deliveries, keeping per-group
state keyed by a hash bucket of the url (bounded key cardinality — state
size scales with distinct urls per bucket, and buckets spread uniformly
because the key is a hash, not the skewed host).

At 10^12-url scale the in-state set becomes a Bloom filter per bucket
(core/bloom.py — same trade as the scorer membership); the operator
shape (grouping, state schema, output schema) is unchanged.

``first_seen_urls(..., ttl_seconds=N)`` bounds the state on unbounded url
spaces (VERDICT r1 item 6): each state entry carries its last-seen event
timestamp, entries older than ``max(batch ts) − ttl`` are evicted before
the dedup check (so a url re-delivered after the window re-emits — the
pinned sliding-window semantics: every sighting refreshes the entry).
State is therefore bounded by the urls seen in the last window per
bucket, regardless of total stream length.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_BUCKETS = 64

OUTPUT_SCHEMA = "url string, bucket int"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdfs:
        for url in pdf["url"]:
            if url not in seen:
                seen.add(url)
                fresh.append(url)
    state.update((sorted(seen),))
    yield pd.DataFrame({"url": fresh, "bucket": [key[0]] * len(fresh)})


TTL_STATE_SCHEMA = "seen array<string>, ts array<long>"


def _make_ttl_dedup_fn(ttl_seconds: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        seen: dict[str, int] = (
            dict(zip(state.get[0], state.get[1])) if state.exists else {}
        )
        fresh: list[tuple[str, int]] = []
        horizon = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            batch_max = int(pdf["ts"].max())
            horizon = batch_max - ttl_seconds if horizon is None else max(horizon, batch_max - ttl_seconds)
            # evict expired entries BEFORE the membership checks so a url
            # re-delivered after the window counts as first-seen again
            seen = {u: t for u, t in seen.items() if t >= horizon}
            for url, ts in zip(pdf["url"], pdf["ts"]):
                ts = int(ts)
                if ts < horizon:
                    continue  # older than the window itself: drop
                if url not in seen:
                    fresh.append((url, ts))
                seen[url] = max(ts, seen.get(url, ts))  # every sighting refreshes
        items = sorted(seen.items())
        state.update(([u for u, _ in items], [t for _, t in items]))
        yield pd.DataFrame(
            {"url": [u for u, _ in fresh], "bucket": [key[0]] * len(fresh), "ts": [t for _, t in fresh]}
        )

    return fn


def first_seen_urls(pages: DataFrame, ttl_seconds: int | None = None) -> DataFrame:
    """Streaming DataFrame (url, ...) → rows for first-seen urls only.
    With ``ttl_seconds`` the input must carry a LONG ``ts`` column (epoch
    seconds); state is bounded to urls seen within the sliding window."""
    if ttl_seconds is not None:
        bucketed = pages.select("url", "ts").withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)).cast("int")
        )
        return bucketed.groupBy("bucket").applyInPandasWithState(
            _make_ttl_dedup_fn(ttl_seconds),
            outputStructType="url string, bucket int, ts long",
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="append",
            # NoTimeout: per-entry eviction alone bounds the state (each
            # bucket holds only its last ttl window of urls); a group-level
            # ProcessingTimeTimeout makes availableNow-triggered drains spin
            # on "cleaning up state" batches until the wall-clock timeout
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    bucketed = pages.select("url").withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
