"""Streaming exact-substring duplicate detection: the Lee-et-al.
repeated-k-window rule (operators/substring_dedup.py) applied to a
document STREAM — every length-k token window whose fingerprint was
already seen (earlier micro-batch, or earlier within the batch by
(ts, doc_id, pos) order) emits as a duplicate; first occurrences are
retained silently. This is the keep-first semantics a continuous
ingestion pipeline wants: the first copy of a boilerplate block enters
the corpus, every later copy is flagged while its source doc is still
in flight.

Shape: window enumeration is the same pure-Catalyst projection as the
batch operator (split → transform → posexplode — text bytes never
reach Python); state is keyed by a HASH BUCKET of the fingerprint
(bounded key cardinality, uniform because the key is a hash), holding
gram → last-seen-ts per bucket. ``ttl_seconds`` bounds state on
unbounded streams exactly like streaming/dedup.first_seen_urls: every
sighting refreshes its entry (per-entry sliding window — a gap larger
than ttl starts a new "first"), and a whole bucket self-expires via
EventTimeTimeout once the watermark passes its newest entry's expiry.
Without ttl the state grows with distinct grams (absolute dedup) —
callers on unbounded corpora should set ttl.

Batch/stream parity: operators.substring_dedup.duplicated_windows_ordered
is the exact batch twin (same (ts, id, pos) order, same per-entry
sliding-ttl rule) — tests/test_streaming_substring_dedup.py drains the
stream against it.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_BUCKETS = 64

OUTPUT_SCHEMA = "doc_id long, pos int, ts long"
STATE_SCHEMA = "grams array<long>, tss array<long>"


def _make_dup_windows_fn(ttl_seconds: int | None):
    """Per-bucket state function. Chunks are buffered and combined, and
    rows are processed in (ts, doc_id, pos) order, so the emitted set is
    a pure function of the micro-batch row multiset (checkpoint replays
    reproduce it) — the streaming/dedup.py determinism rule."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if getattr(state, "hasTimedOut", False):
            state.remove()
            return
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "doc_id", "pos"], kind="mergesort"
        )
        seen: dict[int, int] = (
            dict(zip(state.get[0], state.get[1])) if state.exists else {}
        )
        out = []
        for row in batch.itertuples(index=False):
            g, t = int(row.gh), int(row.ts)
            prev = seen.get(g)
            is_dup = prev is not None and (ttl_seconds is None or t - prev <= ttl_seconds)
            if is_dup:
                out.append((int(row.doc_id), int(row.pos), t))
            seen[g] = t  # every sighting refreshes the entry (sliding)
        if ttl_seconds is not None:
            try:
                wm = state.getCurrentWatermarkMs() / 1000.0
            except AttributeError:  # unit-test harness
                wm = 0.0
            seen = {g: t for g, t in seen.items() if t + ttl_seconds >= wm}
        if seen:
            grams = sorted(seen)
            state.update((grams, [seen[g] for g in grams]))
            if ttl_seconds is not None:
                try:
                    wm_ms = state.getCurrentWatermarkMs()
                    set_timeout = state.setTimeoutTimestamp
                except AttributeError:
                    pass
                else:
                    expiry_ms = (max(seen.values()) + ttl_seconds) * 1000
                    set_timeout(max(expiry_ms, wm_ms + 1000))
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "pos", "ts"])

    return fn


BLOOM_STATE_SCHEMA = "gen long, cur binary, prev binary"


def _bloom_positions(gh: int, m_bits: int, n_hashes: int) -> list[int]:
    """n probe positions from the 64-bit gram fingerprint via splitmix64
    finalization per probe — deterministic, no RNG, no md5 per probe."""
    out = []
    x = gh & 0xFFFFFFFFFFFFFFFF
    for i in range(n_hashes):
        z = (x + (i + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out.append((z ^ (z >> 31)) % m_bits)
    return out


def _make_bloom_dup_windows_fn(ttl_seconds: int, m_bits: int, n_hashes: int):
    """Bloom-backed per-bucket state (the ROADMAP 'bounded state under
    adversarial gram diversity' variant): instead of gram → last-ts
    dicts (state linear in distinct grams), each bucket holds TWO fixed
    Bloom generations of width ttl — insert into the current
    generation, a window is flagged when its fingerprint probes present
    in current ∪ previous. One-sided contract: a true within-ttl
    duplicate is NEVER missed — for event-time-monotone rows (the only
    kind Spark delivers when delay_seconds=0: the watermark drops
    anything older than the running max, and each micro-batch is sorted
    here) the previous sighting at gap <= ttl landed in the same or the
    immediately previous generation, both checked; a LATE row
    (row_gen < gen, possible only with delay_seconds > 0) cannot be
    checked against filters that may already have rotated away, so it
    is flagged CONSERVATIVELY and its probes are inserted into the
    previous generation so in-order rows within ttl of it still hit.
    Either way the error is one-sided: Bloom collisions,
    (ttl, 2·ttl]-gap chains, and late rows may OVER-flag, never miss.
    State per bucket is exactly 2·m_bits/8 bytes + a generation
    counter, independent of gram diversity."""

    empty = bytes(m_bits // 8)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if getattr(state, "hasTimedOut", False):
            state.remove()
            return
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "doc_id", "pos"], kind="mergesort"
        )
        if state.exists:
            gen, cur, prev = state.get
            cur, prev = bytearray(cur), bytearray(prev)
        else:
            gen, cur, prev = None, bytearray(empty), bytearray(empty)
        out = []
        for row in batch.itertuples(index=False):
            g, t = int(row.gh), int(row.ts)
            row_gen = t // ttl_seconds
            if gen is None:
                gen = row_gen
            elif row_gen == gen + 1:
                prev, cur = cur, bytearray(empty)
                gen = row_gen
            elif row_gen > gen + 1:
                prev, cur = bytearray(empty), bytearray(empty)
                gen = row_gen
            pos_bits = _bloom_positions(g, m_bits, n_hashes)
            if row_gen < gen:
                # LATE row (delay_seconds > 0 only; the sort above makes
                # in-batch rows monotone, and with delay_seconds=0 the
                # watermark drops anything older than the running max).
                # The filters covering its generation may have rotated
                # away, so it is un-checkable: flag conservatively
                # (one-sided contract — over-flag, never miss) and
                # insert into PREV, the closest surviving generation not
                # newer than gen, so in-order rows within ttl of this
                # sighting still probe present.
                out.append((int(row.doc_id), int(row.pos), t))
                for p in pos_bits:
                    prev[p >> 3] |= 1 << (p & 7)
                continue
            hit = all(
                (cur[p >> 3] | prev[p >> 3]) & (1 << (p & 7)) for p in pos_bits
            )
            if hit:
                out.append((int(row.doc_id), int(row.pos), t))
            for p in pos_bits:
                cur[p >> 3] |= 1 << (p & 7)
        state.update((int(gen), bytes(cur), bytes(prev)))
        try:
            wm_ms = state.getCurrentWatermarkMs()
            set_timeout = state.setTimeoutTimestamp
        except AttributeError:  # unit-test harness
            pass
        else:
            # the newest entry is in generation `gen`; everything the
            # bucket can still flag expires 2 generations later
            set_timeout(max((gen + 2) * ttl_seconds * 1000, wm_ms + 1000))
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "pos", "ts"])

    return fn


def streaming_duplicated_windows(
    docs: DataFrame,
    k: int = 20,
    ttl_seconds: int | None = None,
    time_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    delay_seconds: int = 0,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, pos, ts) for every duplicated window of the document
    stream, keep-first order (ts, doc_id, pos). ``time_col`` must be a
    timestamp column (the stream's event time); emitted ts is its epoch
    second."""
    keyed = _windows_keyed(docs, k, time_col, text_col, id_col, delay_seconds, n_buckets)
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_dup_windows_fn(ttl_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_duplicated_windows_bloom(
    docs: DataFrame,
    k: int = 20,
    ttl_seconds: int = 3600,
    m_bits: int = 1 << 17,
    n_hashes: int = 4,
    time_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
    delay_seconds: int = 0,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """The BOUNDED-state form of streaming_duplicated_windows: per-bucket
    rotating Bloom generations of width ttl instead of gram→ts dicts,
    so total state is n_buckets · 2 · m_bits/8 bytes (2 MiB at the
    defaults) no matter how many distinct grams the stream carries —
    the defense against adversarial gram diversity. One-sided accuracy
    contract (tested): output ⊇ the exact operator's output; the
    over-flagging excess is Bloom FP (≈ (1-e^(-kn/m))^k per probe set),
    chains whose gap falls in (ttl, 2·ttl], and — when delay_seconds>0
    admits out-of-order rows — LATE rows (event time older than the
    bucket's newest generation), which are un-checkable against
    possibly-rotated filters and therefore flagged conservatively. With
    delay_seconds=0 delivery is event-time-monotone and the late branch
    never fires. ttl is REQUIRED — the generations are what bound the
    state."""
    if ttl_seconds is None or ttl_seconds <= 0:
        raise ValueError("ttl_seconds must be a positive int (it bounds the state)")
    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    keyed = _windows_keyed(docs, k, time_col, text_col, id_col, delay_seconds, n_buckets)
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_bloom_dup_windows_fn(ttl_seconds, m_bits, n_hashes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _windows_keyed(
    docs: DataFrame,
    k: int,
    time_col: str,
    text_col: str,
    id_col: str,
    delay_seconds: int,
    n_buckets: int,
) -> DataFrame:
    """Shared projection: k-window enumeration → (doc_id, ts, pos, gh)
    with the uniform hash bucket and the event-time watermark."""
    from ..operators.substring_dedup import token_ngram_windows

    w = token_ngram_windows(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(time_col).alias("_evt"),
            F.col(text_col).alias("text"),
        ).withColumn("_row", F.struct("doc_id", "_evt", "text")),
        k,
        text_col="text",
        id_col="_row",
        # staged=False: the staging Generate breaks streaming watermark
        # attribute binding (see token_ngram_windows docstring)
        staged=False,
    ).select(
        F.col("_row.doc_id").alias("doc_id"),
        F.unix_timestamp(F.col("_row._evt")).alias("ts"),
        F.col("_row._evt").alias("_evt"),
        "pos",
        "gh",
    )
    return (
        w.withColumn("bucket", F.pmod(F.col("gh"), F.lit(n_buckets)).cast("int"))
        .withWatermark("_evt", f"{delay_seconds} seconds")
    )
