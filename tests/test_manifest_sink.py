"""Manifest-committed Python DataSource sink (io/manifest_sink.py):
per-task parts + driver-side atomic manifest publish; manifest readers
never see orphans."""
from __future__ import annotations

import json
import os

import pytest

from post_ocr_corretion_spark.io.manifest_sink import (
    MANIFEST,
    ManifestParquetDataSource,
    read_manifest,
)


def test_write_commit_read_roundtrip(spark, tmp_path):
    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v").repartition(4)
    df.write.format("manifest_parquet").option("path", out).mode("append").save()

    man = json.load(open(os.path.join(out, MANIFEST)))
    assert man["total_rows"] == 100
    assert 1 <= len(man["files"]) <= 4  # empty partitions are omitted
    back = read_manifest(spark, out)
    assert sorted((r.id, r.v) for r in back.collect()) == [(i, 2 * i) for i in range(100)]


def test_all_null_column_keeps_declared_type(spark, tmp_path):
    """ADVICE r4: a task whose partition has an entirely-NULL column must
    write it with the DECLARED type, not an inferred null type — otherwise
    the mixed-part read mistypes or drops the column."""
    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "sink")
    # partition by parity: one partition carries only NULL v / NULL s rows
    df = spark.range(0, 20).selectExpr(
        "id",
        "CASE WHEN id % 2 = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS v",
        "CASE WHEN id % 2 = 0 THEN CAST(NULL AS STRING) ELSE concat('s', id) END AS s",
        "id % 2 AS par",
    ).repartition(2, "par")
    df.drop("par").write.format("manifest_parquet").option("path", out).mode("append").save()
    back = read_manifest(spark, out)
    assert dict(back.dtypes) == {"id": "bigint", "v": "double", "s": "string"}
    rows = {r.id: (r.v, r.s) for r in back.collect()}
    assert rows[2] == (None, None) and rows[3] == (3.0, "s3")


def test_orphan_parts_are_invisible_to_manifest_readers(spark, tmp_path):
    """A torn write leaves part files the manifest never mentions — the
    manifest reader must not pick them up (plain spark.read.parquet on
    the directory WOULD, which is exactly the torn-read hazard this sink
    closes)."""
    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "sink")
    spark.range(0, 10).write.format("manifest_parquet").option("path", out).mode(
        "append"
    ).save()
    # simulate a torn concurrent write: a part lands, no manifest update
    spark.range(100, 105).toPandas().to_parquet(os.path.join(out, "part-orphan.parquet"))
    assert read_manifest(spark, out).count() == 10
    assert spark.read.parquet(out).count() == 15  # the hazard, for contrast


def test_append_merges_and_overwrite_replaces(spark, tmp_path):
    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "sink")
    spark.range(0, 10).write.format("manifest_parquet").option("path", out).mode(
        "append"
    ).save()
    spark.range(10, 25).write.format("manifest_parquet").option("path", out).mode(
        "append"
    ).save()
    assert sorted(r.id for r in read_manifest(spark, out).collect()) == list(range(25))
    spark.range(100, 103).write.format("manifest_parquet").option("path", out).mode(
        "overwrite"
    ).save()
    # overwrite publishes only the new job; old parts become orphans
    assert sorted(r.id for r in read_manifest(spark, out).collect()) == [100, 101, 102]


def test_streaming_sink_per_batch_manifests(spark, tmp_path):
    """Streaming form: the synthetic crawl feed drains through the
    manifest sink — one manifest per micro-batch, union view consistent,
    orphans invisible."""
    from post_ocr_corretion_spark.io.manifest_sink import read_manifest_stream
    from post_ocr_corretion_spark.sources.synthetic_source import SyntheticPagesDataSource

    spark.dataSource.register(ManifestParquetDataSource)
    spark.dataSource.register(SyntheticPagesDataSource)
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("synthetic_pages")
            .option("rate", 20)
            .option("n", 40)
            .load()
            .select("doc_id", "url", "lang")
            .writeStream.format("manifest_parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # batch 0: ids 0..19
    drain()  # batch 1: ids 20..39
    manifests = sorted(f for f in os.listdir(out) if f.startswith("_MANIFEST-"))
    assert len(manifests) == 2
    got = sorted(r.doc_id for r in read_manifest_stream(spark, out).collect())
    assert got == list(range(40))
    # orphan part (torn attempt) never becomes visible
    spark.range(900, 905).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS url", "'xx' AS lang"
    ).toPandas().to_parquet(os.path.join(out, "part-orphan.parquet"))
    assert read_manifest_stream(spark, out).count() == 40


def test_writer_requires_path(spark):
    spark.dataSource.register(ManifestParquetDataSource)
    with pytest.raises(Exception, match="path"):
        spark.range(1).write.format("manifest_parquet").mode("append").save()
