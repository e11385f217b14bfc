"""interval_stream_join (streaming/joins.py): the SAME function runs on
batch and streaming inputs; streaming results must equal the batch rows
(inner immediately, left_outer once the watermark closes the band)."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.streaming.joins import interval_stream_join

L_SCHEMA = "user_id string, ts long, lval double"
R_SCHEMA = "user_id string, ts long, rval double"

LEFT_ROWS = [
    ("a", 1000, 1.0),   # refs at 400 (out of band), 900, 1000 → two matches
    ("a", 1500, 2.0),   # refs 900/1000 in [500, 1500] → two matches
    ("b", 2000, 3.0),   # ref at 2100 is in the future → no match
    ("c", 3000, 4.0),   # key with no refs
]
RIGHT_ROWS = [
    ("a", 400, 10.0),
    ("a", 900, 20.0),
    ("a", 1000, 30.0),
    ("b", 2100, 40.0),
]
LOOKBACK = 1000


def _batch(spark, how):
    left = spark.createDataFrame(LEFT_ROWS, L_SCHEMA)
    right = spark.createDataFrame(RIGHT_ROWS, R_SCHEMA)
    return interval_stream_join(
        left, right, by="user_id", lookback_seconds=LOOKBACK, how=how
    )


def _rows(df_or_list):
    it = df_or_list.collect() if hasattr(df_or_list, "collect") else df_or_list
    return sorted((r.user_id, r.ts, r.lval, r.ts_right, r.rval_right) for r in it)


def test_batch_semantics_match_brute_force(spark):
    got = _rows(_batch(spark, "inner"))
    brute = sorted(
        (lu, lt, lv, rt, rv)
        for lu, lt, lv in LEFT_ROWS
        for ru, rt, rv in RIGHT_ROWS
        if lu == ru and lt - LOOKBACK <= rt <= lt
    )
    assert got == brute
    outer = _rows(_batch(spark, "left_outer"))
    unmatched = [t for t in outer if t[3] is None]
    assert sorted(t[0] for t in unmatched) == ["b", "c"]


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_stream_matches_batch(spark, tmp_path, how):
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    spark.createDataFrame(LEFT_ROWS, L_SCHEMA).coalesce(1).write.parquet(src_l)
    spark.createDataFrame(RIGHT_ROWS, R_SCHEMA).coalesce(1).write.parquet(src_r)

    def drain():
        q = (
            interval_stream_join(
                spark.readStream.schema(L_SCHEMA).parquet(src_l),
                spark.readStream.schema(R_SCHEMA).parquet(src_r),
                by="user_id",
                lookback_seconds=LOOKBACK,
                how=how,
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    if how == "left_outer":
        # outer rows emit only after the watermark closes each left row's
        # band: advance the clock on both sides, then run follow-up
        # batches so the state store finalizes unmatched rows
        for tick in (1_000_000, 1_000_100, 1_000_200):
            spark.createDataFrame([("zz", tick, 0.0)], L_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src_l)
            spark.createDataFrame([("zz", tick - LOOKBACK - 1, 0.0)], R_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(src_r)
            drain()
    got = [t for t in _rows(spark.read.parquet(sink).collect()) if t[0] != "zz"]
    want = _rows(_batch(spark, how))
    assert got == want


def test_refuses_bad_how_and_collisions(spark):
    left = spark.createDataFrame(LEFT_ROWS, L_SCHEMA)
    right = spark.createDataFrame(RIGHT_ROWS, R_SCHEMA)
    with pytest.raises(ValueError, match="how"):
        interval_stream_join(left, right, by="user_id", how="full")
    clash = left.withColumnRenamed("lval", "rval_right")
    with pytest.raises(ValueError, match="collision"):
        interval_stream_join(clash, right, by="user_id")
