"""streaming_asof_join (streaming/asof.py): batch/stream parity — the
stateful watermark-gated operator must emit exactly the batch
asof_join's rows once the watermark closes each probe (VERDICT r3
item 7), including the forward-by-negation composition the module
docstring promises."""
from __future__ import annotations

from post_ocr_corretion_spark.operators.asof import asof_join
from post_ocr_corretion_spark.streaming.asof import streaming_asof_join

L_SCHEMA = "user_id string, ts long, lval double"
R_SCHEMA = "user_id string, ts long, rval double"

LEFT_ROWS = [
    ("a", 100, 1.0),
    ("a", 205, 2.0),   # between refs
    ("a", 400, 3.0),   # after the last ref
    ("a", 50, 4.0),    # before any ref → nulls
    ("a", 200, 5.0),   # exactly equal to a ref ts → includes it
    ("b", 150, 6.0),
    ("c", 500, 7.0),   # key with no refs at all
]
RIGHT_ROWS = [
    ("a", 80, 10.0),
    ("a", 200, 20.0),
    ("a", 300, 30.0),
    ("b", 150, 40.0),
    ("b", 149, 41.0),
]
# a ref under an unused key far in the future: advances the global
# watermark past every probe without producing any output row
CLOCK = [("zz", 1_000_000, 0.0)]


def _drain(spark, src_l, src_r, ckpt, sink, negate=False, ref_ttl=None):
    left = spark.readStream.schema(L_SCHEMA).parquet(src_l)
    right = spark.readStream.schema(R_SCHEMA).parquet(src_r)
    q = (
        streaming_asof_join(left, right, by="user_id", ref_ttl=ref_ttl)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_streaming_asof_matches_batch(spark, tmp_path):
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    _write(spark, LEFT_ROWS, L_SCHEMA, src_l)
    _write(spark, RIGHT_ROWS, R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink)
    # first drain: watermark starts at 0 → everything buffered, nothing lost
    _write(spark, CLOCK, R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink)
    # a second clock tick runs one more batch so timeouts armed against
    # the first tick's watermark fire for every quiet key
    _write(spark, [("zz", 1_000_100, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink)

    got = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in spark.read.parquet(sink).collect()
    )
    batch_left = spark.createDataFrame(LEFT_ROWS, L_SCHEMA)
    batch_right = spark.createDataFrame(RIGHT_ROWS + CLOCK, R_SCHEMA)
    want = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in asof_join(batch_left, batch_right, by="user_id").collect()
    )
    assert got == want


def test_streaming_asof_forward_by_negation(spark, tmp_path):
    """Tolerance-bounded FORWARD asof streams by reflecting event time
    (t' = BASE − t; pure negation would sit below Spark's initial
    epoch-0 watermark and be dropped as late — see module docstring):
    streaming backward over reflected ts equals batch forward."""
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    BASE = 10_000

    refl = lambda rows: [(u, BASE - t, v) for u, t, v in rows]
    _write(spark, refl(LEFT_ROWS), L_SCHEMA, src_l)
    _write(spark, refl(RIGHT_ROWS), R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink)
    _write(spark, [("zz", 1_000_000, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink)
    _write(spark, [("zz", 1_000_100, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink)

    got = sorted(
        (
            r.user_id,
            BASE - r.ts,
            r.lval,
            BASE - r.ts_right if r.ts_right is not None else None,
            r.rval_right,
        )
        for r in spark.read.parquet(sink).collect()
    )
    batch_left = spark.createDataFrame(LEFT_ROWS, L_SCHEMA)
    batch_right = spark.createDataFrame(RIGHT_ROWS, R_SCHEMA)
    want = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in asof_join(batch_left, batch_right, by="user_id", direction="forward").collect()
    )
    assert got == want


def test_state_fn_chunk_order_independent():
    """The state fn's emissions and resulting state are a pure function
    of (state, batch multiset, watermark) — Arrow chunk order never
    matters (checkpoint-replay determinism, same contract as the dedup
    operator's fn)."""
    import json

    import pandas as pd

    from post_ocr_corretion_spark.streaming.asof import _make_asof_state_fn

    class FakeState:
        def __init__(self):
            self.exists, self.value = False, None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value, self.exists = v, True

        def remove(self):
            self.value, self.exists = None, False

        def getCurrentWatermarkMs(self):
            return 2_000_000  # wm = 2000 s — all fixture probes ready

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    rows = [
        # (_ts, _is_ref, _data)
        (100, 1, {"ts": 100, "rval": 1.0}),
        (150, 0, {"user_id": "k", "ts": 150, "lval": 9.0}),
        (120, 1, {"ts": 120, "rval": 2.0}),
        (110, 0, {"user_id": "k", "ts": 110, "lval": 8.0}),
    ]

    def run(order):
        fn = _make_asof_state_fn("user_id", ["user_id", "ts", "lval"], ["ts", "rval"], "_right",
                                 ["user_id", "ts", "lval", "ts_right", "rval_right"])
        st = FakeState()
        chunks = [
            pd.DataFrame(
                [{"_ts": t, "_is_ref": r, "_data": json.dumps(d)} for t, r, d in part],
                columns=["_ts", "_is_ref", "_data"],
            )
            for part in order
        ]
        out = list(fn(("k",), iter(chunks), st))
        emitted = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
        return emitted.to_dict("records"), st.value

    a = run([rows[:2], rows[2:]])
    b = run([rows[::-1][:1], rows[::-1][1:]])
    c = run([rows])
    assert a == b == c
    # both probes answered with their nearest-prior ref
    recs = {r["ts"]: r for r in a[0]}
    assert recs[110]["rval_right"] == 1.0 and recs[150]["rval_right"] == 2.0


def test_ref_ttl_expires_retained_reference(spark, tmp_path):
    """VERDICT r4 item 6: with ref_ttl, a probe within ttl of its
    reference fills normally, but once the watermark passes ref_ts + ttl
    the retained last-reference is dropped — a later probe on the same
    (now quiet) key fills null, the documented bounded-state trade."""
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    TTL = 1000

    _write(spark, [("a", 150, 1.0)], L_SCHEMA, src_l)
    _write(spark, [("a", 100, 10.0), ("zz", 3000, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink, ref_ttl=TTL)
    # wm → 3000: probe 150 emits (ref still in state this batch), then
    # compaction drops the ref (100 + 1000 < 3000)
    _write(spark, [("zz", 3100, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink, ref_ttl=TTL)
    # a late probe on the quiet key: its nearest-prior ref has expired
    _write(spark, [("a", 5000, 2.0)], L_SCHEMA, src_l)
    _write(spark, [("zz", 1_000_000, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink, ref_ttl=TTL)
    _write(spark, [("zz", 1_000_100, 0.0)], R_SCHEMA, src_r)
    _drain(spark, src_l, src_r, ckpt, sink, ref_ttl=TTL)

    got = {r.ts: (r.ts_right, r.rval_right) for r in spark.read.parquet(sink).collect() if r.user_id == "a"}
    assert got[150] == (100, 10.0)   # within ttl: normal backward fill
    assert got[5000] == (None, None)  # past ttl: reference expired


def test_ref_ttl_state_removed_for_quiet_key():
    """Unit-level: once the watermark passes ref_ts + ttl and no probes
    are pending, the key's state is REMOVED entirely (bounded state);
    without ttl the retained ref keeps the state entry alive."""
    import json

    import pandas as pd

    from post_ocr_corretion_spark.streaming.asof import _make_asof_state_fn

    class FakeState:
        def __init__(self):
            self.exists, self.value = False, None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value, self.exists = v, True

        def remove(self):
            self.value, self.exists = None, False

        def getCurrentWatermarkMs(self):
            return 5_000_000  # wm = 5000 s

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    def run(ref_ttl):
        fn = _make_asof_state_fn(
            "user_id", ["user_id", "ts", "lval"], ["ts", "rval"], "_right",
            ["user_id", "ts", "lval", "ts_right", "rval_right"], ref_ttl=ref_ttl,
        )
        st = FakeState()
        batch = pd.DataFrame(
            [{"_ts": 100, "_is_ref": 1, "_data": json.dumps({"ts": 100, "rval": 1.0})}]
        )
        list(fn(("k",), iter([batch]), st))
        return st

    assert run(ref_ttl=None).exists          # retained forever by default
    assert not run(ref_ttl=1000).exists      # 100 + 1000 < 5000 → swept


def test_ref_ttl_arms_timeout_for_refs_only_state():
    """ADVICE r5 (medium): a refs-only state with ref_ttl must arm an
    EventTimeTimeout at the ref's expiry — otherwise a permanently-quiet
    key is only swept lazily on its next batch, which never comes, and
    state stays unbounded on unbounded key spaces. Without ref_ttl no
    timeout is armed (retention is the documented semantic default)."""
    import json

    import pandas as pd

    from post_ocr_corretion_spark.streaming.asof import _make_asof_state_fn

    class FakeState:
        def __init__(self):
            self.exists, self.value, self.timeout = False, None, None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value, self.exists = v, True

        def remove(self):
            self.value, self.exists = None, False

        def getCurrentWatermarkMs(self):
            return 500_000  # wm = 500 s — ref at 100 is retained, not expired

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    def run(ref_ttl):
        fn = _make_asof_state_fn(
            "user_id", ["user_id", "ts", "lval"], ["ts", "rval"], "_right",
            ["user_id", "ts", "lval", "ts_right", "rval_right"], ref_ttl=ref_ttl,
        )
        st = FakeState()
        batch = pd.DataFrame(
            [{"_ts": 100, "_is_ref": 1, "_data": json.dumps({"ts": 100, "rval": 1.0})}]
        )
        list(fn(("k",), iter([batch]), st))
        return st

    armed = run(ref_ttl=1000)
    assert armed.exists and armed.timeout == (100 + 1000) * 1000  # expiry in ms
    assert run(ref_ttl=None).timeout is None  # no ttl → no sweep timeout


def test_streaming_asof_refuses_duplicate_refs(spark, tmp_path):
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    _write(spark, [("a", 100, 1.0)], L_SCHEMA, src_l)
    _write(spark, [("a", 80, 1.0), ("a", 80, 2.0)], R_SCHEMA, src_r)
    import pytest

    with pytest.raises(Exception, match="duplicate"):
        _drain(spark, src_l, src_r, ckpt, sink)


def test_streaming_asof_forward_native_matches_batch(spark, tmp_path):
    """NATIVE tolerance-bounded forward (VERDICT r5 item 9): the
    stateful operator emits exactly the batch
    asof_join(direction='forward', tolerance=TOL) rows — fills inside
    the window, nulls beyond it, equal-ts tie includes the ref."""
    from post_ocr_corretion_spark.streaming.asof import streaming_asof_join_forward

    TOL = 100
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    _write(spark, LEFT_ROWS, L_SCHEMA, src_l)
    _write(spark, RIGHT_ROWS, R_SCHEMA, src_r)

    def drain():
        left = spark.readStream.schema(L_SCHEMA).parquet(src_l)
        right = spark.readStream.schema(R_SCHEMA).parquet(src_r)
        q = (
            streaming_asof_join_forward(left, right, by="user_id", tolerance=TOL)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    _write(spark, CLOCK, R_SCHEMA, src_r)
    drain()
    _write(spark, [("zz", 1_000_200, 0.0)], R_SCHEMA, src_r)
    drain()

    got = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in spark.read.parquet(sink).collect()
    )
    batch_left = spark.createDataFrame(LEFT_ROWS, L_SCHEMA)
    batch_right = spark.createDataFrame(RIGHT_ROWS + CLOCK, R_SCHEMA)
    want = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in asof_join(
            batch_left, batch_right, by="user_id", direction="forward", tolerance=TOL
        ).collect()
    )
    assert got == want
    # the fixture exercises every branch: in-window fill, beyond-window
    # null, equal-ts tie, keyless probe
    filled = {(u, t): rt for u, t, _, rt, _ in got}
    assert filled[("a", 200)] == 200      # equal-ts tie includes the ref
    assert filled[("a", 400)] is None     # no ref within [400, 500]
    assert filled[("a", 50)] == 80        # forward fill where backward was null
    assert filled[("c", 500)] is None     # keyless probe


def test_forward_state_self_expires_without_ttl():
    """The forward operator's state is bounded BY CONSTRUCTION: refs
    older than wm − tolerance compact away and a refs-only state arms
    its own sweep timeout, so quiet keys fully expire with no ttl knob
    (contrast the backward operator's retained last-reference)."""
    import json

    import pandas as pd

    from post_ocr_corretion_spark.streaming.asof import _make_asof_forward_state_fn

    class FakeState:
        def __init__(self, wm_ms):
            self.exists, self.value, self.timeout, self._wm = False, None, None, wm_ms

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value, self.exists = v, True

        def remove(self):
            self.value, self.exists = None, False

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    def run(wm_ms, batch_rows):
        fn = _make_asof_forward_state_fn(
            "user_id", ["user_id", "ts", "lval"], ["ts", "rval"], "_right",
            ["user_id", "ts", "lval", "ts_right", "rval_right"], tolerance=100,
        )
        st = FakeState(wm_ms)
        batch = pd.DataFrame(batch_rows)
        list(fn(("k",), iter([batch]), st))
        return st

    ref = {"_ts": 100, "_is_ref": 1, "_data": json.dumps({"ts": 100, "rval": 1.0})}
    # wm = 50: ref live (100 >= 50-100), sweep armed at t + tolerance
    st = run(50_000, [ref])
    assert st.exists and st.timeout == (100 + 100) * 1000
    # wm past ref ts + tolerance: ref compacted, state REMOVED — no
    # retained-forever row, no ttl needed
    assert not run(300_000, [ref]).exists


def test_streaming_asof_nearest_native_matches_batch(spark, tmp_path):
    """NATIVE tolerance-bounded nearest: closer-of-two pick (exact tie →
    backward) then tolerance-null — exactly the batch
    asof_join(direction='nearest', tolerance=TOL) order."""
    from post_ocr_corretion_spark.streaming.asof import streaming_asof_join_nearest

    TOL = 60
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    _write(spark, LEFT_ROWS, L_SCHEMA, src_l)
    _write(spark, RIGHT_ROWS, R_SCHEMA, src_r)

    def drain():
        left = spark.readStream.schema(L_SCHEMA).parquet(src_l)
        right = spark.readStream.schema(R_SCHEMA).parquet(src_r)
        q = (
            streaming_asof_join_nearest(left, right, by="user_id", tolerance=TOL)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    _write(spark, CLOCK, R_SCHEMA, src_r)
    drain()
    _write(spark, [("zz", 1_000_200, 0.0)], R_SCHEMA, src_r)
    drain()

    got = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in spark.read.parquet(sink).collect()
    )
    batch_left = spark.createDataFrame(LEFT_ROWS, L_SCHEMA)
    batch_right = spark.createDataFrame(RIGHT_ROWS + CLOCK, R_SCHEMA)
    want = sorted(
        (r.user_id, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in asof_join(
            batch_left, batch_right, by="user_id", direction="nearest", tolerance=TOL
        ).collect()
    )
    assert got == want
    filled = {(u, t): rt for u, t, _, rt, _ in got}
    assert filled[("a", 205)] == 200   # closer-of-two: 200 (d=5) beats 300 (d=95)
    assert filled[("a", 200)] == 200   # exact tie at distance 0 → backward pick
    assert filled[("a", 400)] is None  # nearest (300, d=100) beyond TOL → null
    assert filled[("a", 50)] == 80     # forward-only candidate inside TOL


def test_nearest_state_horizon_is_two_tolerances():
    """Refs compact to t >= wm − 2·tolerance (output-invariant vs batch,
    see the state-fn docstring); a refs-only state past the horizon is
    removed — bounded with no ttl knob."""
    import json

    import pandas as pd

    from post_ocr_corretion_spark.streaming.asof import _make_asof_nearest_state_fn

    class FakeState:
        def __init__(self, wm_ms):
            self.exists, self.value, self.timeout, self._wm = False, None, None, wm_ms

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value, self.exists = v, True

        def remove(self):
            self.value, self.exists = None, False

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    def run(wm_ms, batch_rows):
        fn = _make_asof_nearest_state_fn(
            "user_id", ["user_id", "ts", "lval"], ["ts", "rval"], "_right",
            ["user_id", "ts", "lval", "ts_right", "rval_right"], tolerance=100,
        )
        st = FakeState(wm_ms)
        list(fn(("k",), iter([pd.DataFrame(batch_rows)]), st))
        return st

    ref = {"_ts": 100, "_is_ref": 1, "_data": json.dumps({"ts": 100, "rval": 1.0})}
    # wm=250: 100 >= 250-200 → kept; sweep armed at t + 2·tol = 300 s
    st = run(250_000, [ref])
    assert st.exists and st.timeout == (100 + 200) * 1000
    # wm past t + 2·tol → compacted away, state removed
    assert not run(301_000, [ref]).exists
