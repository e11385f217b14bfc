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


def first_seen_urls(pages: DataFrame) -> DataFrame:
    """Streaming DataFrame (url, ...) → rows for first-seen urls only."""
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
