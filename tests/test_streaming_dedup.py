"""Stateful streaming dedup: urls survive exactly once ACROSS separate
micro-batch runs sharing a checkpoint (state restore included)."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.streaming.dedup import first_seen_urls

URL_SCHEMA = "url string"


def _drain(spark, src_dir: str, ckpt: str, sink: str):
    q = (
        first_seen_urls(spark.readStream.schema(URL_SCHEMA).parquet(src_dir))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_cross_batch_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    batch1 = [(f"https://h{i % 3}.example.com/p{i}",) for i in range(50)]
    spark.createDataFrame(batch1, URL_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, sink)
    out1 = {r.url for r in spark.read.parquet(sink).collect()}
    assert out1 == {u for (u,) in batch1}

    # batch 2: 30 repeats + 20 new urls → only the new ones are emitted
    batch2 = batch1[:30] + [(f"https://h9.example.com/new{i}",) for i in range(20)]
    spark.createDataFrame(batch2, URL_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, sink)
    out2 = [r.url for r in spark.read.parquet(sink).collect()]
    assert len(out2) == 70  # 50 + 20, no re-emissions
    assert {u for (u,) in batch2[30:]} <= set(out2)
