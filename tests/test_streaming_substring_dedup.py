"""Streaming duplicated-window detection vs its batch twin
(operators.substring_dedup.duplicated_windows_ordered), plus the ttl
sliding-window state rules."""
from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from post_ocr_corretion_spark.operators.substring_dedup import duplicated_windows_ordered
from post_ocr_corretion_spark.streaming.substring_dedup import (
    _make_dup_windows_fn,
    streaming_duplicated_windows,
)

SCHEMA = "doc_id long, ts timestamp, text string"
RAW = "doc_id long, ts string, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, RAW).withColumn("ts", F.to_timestamp("ts"))
BLOCK = " ".join(f"b{i}" for i in range(8))  # repeated 8-token block

ROWS_B1 = [
    (1, "2024-01-01 00:00:10", BLOCK + " x1 x2 x3"),
    (2, "2024-01-01 00:00:20", "y1 y2 " + BLOCK + " y3"),
    (3, "2024-01-01 00:00:30", "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
]
ROWS_B2 = [
    (4, "2024-01-01 00:01:10", BLOCK + " w1 w2"),
    (5, "2024-01-01 00:01:20", "z1 z2 z3 z4 z5 z6 z7 z8 q1"),
]


def _write(spark, rows, path):
    _df(spark, rows).write.mode("append").parquet(path)


def test_streaming_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            streaming_duplicated_windows(stream, k=5)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write(spark, ROWS_B1, src)
    drain()
    _write(spark, ROWS_B2, src)
    drain()

    got = sorted((r.doc_id, r.pos, r.ts) for r in spark.read.parquet(sink).collect())
    batch = _df(spark, ROWS_B1 + ROWS_B2).withColumn("ts", F.unix_timestamp("ts"))
    want = sorted(
        (r.doc_id, r.pos, r.ts)
        for r in duplicated_windows_ordered(batch, k=5).collect()
    )
    assert got == want and len(got) > 0
    # the planted block re-occurrences are flagged, the z-prefix overlap too
    dup_docs = {d for d, _, _ in got}
    assert dup_docs == {2, 4, 5}


def test_ttl_sliding_window_semantics(spark):
    """Per-entry sliding ttl in the state fn: inside-ttl re-occurrence
    emits and refreshes; a gap larger than ttl starts a new first."""

    class FakeState:
        def __init__(self):
            self.exists, self.value, self._wm = False, None, 0

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

    fn = _make_dup_windows_fn(ttl_seconds=60)
    st = FakeState()

    def run(rows):
        return [
            tuple(r)
            for pdf in fn((0,), iter([pd.DataFrame(rows, columns=["doc_id", "pos", "ts", "gh"])]), st)
            for r in pdf.itertuples(index=False)
        ]

    # first sighting retained, second (within 60s) emits and refreshes
    assert run([(1, 0, 100, 77)]) == []
    assert run([(2, 3, 150, 77)]) == [(2, 3, 150)]
    # 150+60 >= 205: still inside the REFRESHED window → emits again
    assert run([(3, 1, 205, 77)]) == [(3, 1, 205)]
    # gap > ttl from the last sighting → new first, no emission
    assert run([(4, 2, 300, 77)]) == []
    # within-batch ordering: first by (ts, doc, pos) retained, rest emit
    st2 = FakeState()
    out = [
        tuple(r)
        for pdf in _make_dup_windows_fn(None)(
            (0,),
            iter(
                [
                    pd.DataFrame(
                        [(9, 5, 20, 5), (8, 0, 10, 5), (9, 9, 20, 5)],
                        columns=["doc_id", "pos", "ts", "gh"],
                    )
                ]
            ),
            st2,
        )
        for r in pdf.itertuples(index=False)
    ]
    assert out == [(9, 5, 20), (9, 9, 20)]


def test_batch_twin_ttl_rule(spark):
    """duplicated_windows_ordered with ttl: chain refresh semantics via
    lag — 3 occurrences 40s apart with ttl=60 all chain (2 dups); the
    4th at +120s starts a new first."""
    rows = [
        (1, "2024-01-01 00:00:00", BLOCK),
        (2, "2024-01-01 00:00:40", BLOCK),
        (3, "2024-01-01 00:01:20", BLOCK),
        (4, "2024-01-01 00:03:20", BLOCK),
    ]
    docs = _df(spark, rows).withColumn("ts", F.unix_timestamp("ts"))
    dup_docs = sorted(
        {r.doc_id for r in duplicated_windows_ordered(docs, k=8, ttl=60).collect()}
    )
    assert dup_docs == [2, 3]


def _brute_ordered(rows, k, ttl):
    """Single-machine reference for the keep-first chain rule: per gram,
    sort occurrences by (ts, doc_id, pos); an occurrence is a duplicate
    iff its immediate predecessor exists (ttl=None) or lies within ttl."""
    occ = {}
    for doc_id, ts, text in rows:
        toks = text.split(" ")
        for pos in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[pos : pos + k]), []).append(
                (ts, doc_id, pos)
            )
    out = set()
    for lst in occ.values():
        lst.sort()
        for prev, cur in zip(lst, lst[1:]):
            if ttl is None or cur[0] - prev[0] <= ttl:
                out.add((cur[1], cur[2], cur[0]))
    return out


def test_bucketed_twin_matches_brute_force(spark):
    """De-skew differential (VERDICT r6 item 4): the (gh, time-bucket)
    formulation with boundary handoff must be result-identical to the
    plain per-gram chain on data engineered to straddle bucket
    boundaries — hot grams, ts ties across docs, gaps of exactly ttl
    and ttl+1, negative timestamps, and (for ttl=None) a bucket_width
    small enough that occurrences of one gram span many buckets."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    rows = []
    for doc_id in range(40):
        n = rng.randint(6, 14)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((doc_id, rng.randint(-3, 40), text))
    # engineered boundary cases for ttl=7 (bucket width 7): occurrences
    # of one planted gram at exact multiples, +/-1, and exactly ttl apart
    planted = "p q r"
    for i, ts in enumerate([0, 6, 7, 13, 14, 15, 21, 22, 28, 29, 36]):
        rows.append((100 + i, ts, planted + f" t{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, ts long, text string")
    for ttl, bw in [(None, None), (None, 5), (1, None), (7, None), (7, 11), (100, None)]:
        got = {
            (r.doc_id, r.pos, r.ts)
            for r in duplicated_windows_ordered(
                docs, k=3, ttl=ttl, fingerprint="exact", bucket_width=bw
            ).collect()
        }
        want = _brute_ordered(rows, 3, ttl)
        assert got == want, f"ttl={ttl} bucket_width={bw}"


def test_bucket_width_below_ttl_rejected(spark):
    docs = spark.createDataFrame([(1, 0, "a b c")], "doc_id long, ts long, text string")
    with pytest.raises(ValueError, match="bucket_width"):
        duplicated_windows_ordered(docs, k=2, ttl=10, bucket_width=5)


class _FakeState:
    def __init__(self):
        self.exists, self.value, self._wm = False, None, 0

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


def test_bloom_state_semantics_and_bounded_bytes(spark):
    """Rotating-generation Bloom state: within-ttl re-occurrence emits;
    a gap past two generations never does; state is a CONSTANT number
    of bytes regardless of how many grams pass through."""
    from post_ocr_corretion_spark.streaming.substring_dedup import (
        _make_bloom_dup_windows_fn,
    )

    m_bits = 1 << 12
    fn = _make_bloom_dup_windows_fn(ttl_seconds=100, m_bits=m_bits, n_hashes=4)
    st = _FakeState()

    def run(rows):
        return [
            tuple(r)
            for pdf in fn(
                (0,),
                iter([pd.DataFrame(rows, columns=["doc_id", "pos", "ts", "gh"])]),
                st,
            )
            for r in pdf.itertuples(index=False)
        ]

    assert run([(1, 0, 10, 7777)]) == []            # first sighting retained
    assert run([(2, 0, 60, 7777)]) == [(2, 0, 60)]  # gap 50 <= ttl -> dup
    size0 = len(st.value[1]) + len(st.value[2])
    assert run([(3, 0, 500, 7777)]) == []           # gap 440 > 2*ttl -> new first
    # flood 5k distinct grams: emitted nothing new is irrelevant — the
    # state byte size must not move
    run([(9, p, 510, 100000 + p) for p in range(5000)])
    assert len(st.value[1]) + len(st.value[2]) == size0 == 2 * m_bits // 8
    # within-batch ordering: first by (ts, doc, pos) retained, rest emit
    st2 = _FakeState()
    fn2 = _make_bloom_dup_windows_fn(ttl_seconds=100, m_bits=m_bits, n_hashes=4)
    out = [
        tuple(r)
        for pdf in fn2(
            (0,),
            iter(
                [
                    pd.DataFrame(
                        [(9, 5, 20, 5), (8, 0, 10, 5), (9, 9, 20, 5)],
                        columns=["doc_id", "pos", "ts", "gh"],
                    )
                ]
            ),
            st2,
        )
        for r in pdf.itertuples(index=False)
    ]
    assert out == [(9, 5, 20), (9, 9, 20)]


def test_bloom_late_rows_flag_conservatively(spark):
    """Out-of-order delivery (delay_seconds > 0): a LATE row (row_gen <
    the bucket's generation) cannot be checked against possibly-rotated
    filters, so the one-sided contract requires flagging it
    CONSERVATIVELY — the ADVICE r7 scenario where one gram's row jumps
    gen by >=2 (clearing both filters) and a later micro-batch delivers
    an out-of-order row whose true within-ttl sighting was rotated
    away. Late rows are also INSERTED (into prev) so in-order rows
    within ttl of them still hit."""
    from post_ocr_corretion_spark.streaming.substring_dedup import (
        _make_bloom_dup_windows_fn,
    )

    m_bits = 1 << 12
    fn = _make_bloom_dup_windows_fn(ttl_seconds=100, m_bits=m_bits, n_hashes=4)
    st = _FakeState()

    def run(rows):
        return [
            tuple(r)
            for pdf in fn(
                (0,),
                iter([pd.DataFrame(rows, columns=["doc_id", "pos", "ts", "gh"])]),
                st,
            )
            for r in pdf.itertuples(index=False)
        ]

    assert run([(1, 0, 150, 111)]) == []  # gram B first sighting, gen 1
    # gram A jumps gen 1 -> 4: both filters cleared
    assert run([(2, 0, 450, 222)]) == []
    # LATE row for gram B at ts=240 (gen 2 < 4): its true within-ttl
    # sighting (150, gap 90 <= ttl) was rotated away — the pre-fix code
    # probed empty filters and MISSED it; now flagged conservatively
    assert run([(3, 0, 240, 111)]) == [(3, 0, 240)]
    # a late FIRST sighting (gram C, ts=399, gen 3 = gen-1) is flagged
    # conservatively too (documented over-flag) AND inserted into prev…
    assert run([(4, 0, 399, 333)]) == [(4, 0, 399)]
    # …so an IN-ORDER row within ttl of it (ts=470, gen 4, gap 71) hits
    assert run([(5, 0, 470, 333)]) == [(5, 0, 470)]
    # state stays the constant 2 generations of m_bits/8 bytes
    assert len(st.value[1]) + len(st.value[2]) == 2 * m_bits // 8


def test_bloom_stream_superset_of_exact_twin(spark, tmp_path):
    """One-sided accuracy contract: the Bloom form never misses a true
    within-ttl duplicate (output ⊇ the exact operator's); on data with
    no (ttl, 2·ttl] gaps and a roomy filter, the outputs are EQUAL."""
    from post_ocr_corretion_spark.streaming.substring_dedup import (
        streaming_duplicated_windows_bloom,
    )

    src = str(tmp_path / "src")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    _write(spark, ROWS_B1, src)
    _write(spark, ROWS_B2, src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_duplicated_windows_bloom(stream, k=5, ttl_seconds=600, m_bits=1 << 18)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted((r.doc_id, r.pos, r.ts) for r in spark.read.parquet(sink).collect())
    batch = _df(spark, ROWS_B1 + ROWS_B2).withColumn("ts", F.unix_timestamp("ts"))
    exact = sorted(
        (r.doc_id, r.pos, r.ts)
        for r in duplicated_windows_ordered(batch, k=5, ttl=600).collect()
    )
    assert set(got) >= set(exact) and len(exact) > 0
    # the fixture's duplicate gaps are all <= ttl and the filter is
    # roomy (2^18 bits, ~60 grams): no over-flagging either
    assert got == exact


def test_bloom_requires_positive_ttl(spark):
    from post_ocr_corretion_spark.streaming.substring_dedup import (
        streaming_duplicated_windows_bloom,
    )

    docs = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="ttl_seconds"):
        streaming_duplicated_windows_bloom(docs, k=5, ttl_seconds=None)
    with pytest.raises(ValueError, match="m_bits"):
        streaming_duplicated_windows_bloom(docs, k=5, ttl_seconds=60, m_bits=100)
