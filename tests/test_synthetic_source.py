"""Spark 4 Python DataSource (sources/synthetic_source.py): partitioned
batch reads, doc_id filter PUSHDOWN into the generator, deterministic
replay, the streaming micro-batch feed, and composition with the
extraction operator."""
from __future__ import annotations

from pyspark.sql import functions as F

from post_ocr_corretion_spark.sources.synthetic_source import SyntheticPagesDataSource


def _register(spark):
    # runtime-settable session conf; also a session.py default
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticPagesDataSource)


def test_batch_read_partitioned_and_deterministic(spark):
    _register(spark)
    df = spark.read.format("synthetic_pages").option("n", 60).option("numPartitions", 4).load()
    assert df.rdd.getNumPartitions() == 4
    rows1 = sorted((r.doc_id, r.url, bytes(r.html)) for r in df.collect())
    assert len(rows1) == 60
    assert len({u for _, u, _ in rows1}) == 60  # unique urls
    rows2 = sorted(
        (r.doc_id, r.url, bytes(r.html))
        for r in spark.read.format("synthetic_pages").option("n", 60).load().collect()
    )
    assert rows1 == rows2  # pure function of doc_id — partitioning-independent


def test_doc_id_filter_pushes_down_into_the_generator(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_pages").option("n", 1000).load()
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 110))
    )
    got = sorted(r.doc_id for r in df.collect())
    assert got == list(range(100, 110))
    # pushdown evidence: partitions() runs AFTER pushFilters, so an
    # equality predicate collapses the 1000-id source to a single
    # one-row partition — a non-pushdown scan would keep 8 partitions
    # spanning all 1000 ids
    eq = spark.read.format("synthetic_pages").option("n", 1000).load().filter(
        F.col("doc_id") == 42
    )
    assert [r.doc_id for r in eq.collect()] == [42]
    assert eq.rdd.getNumPartitions() == 1


def test_empty_pushdown_interval(spark):
    _register(spark)
    df = spark.read.format("synthetic_pages").option("n", 50).load().filter(
        (F.col("doc_id") > 40) & (F.col("doc_id") < 30)
    )
    assert df.count() == 0


def test_streaming_feed_is_replayable_and_composes(spark, tmp_path):
    _register(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream = spark.readStream.format("synthetic_pages").option("rate", 25).option("n", 50).load()

    # Python micro-batch sources fall back to one batch per availableNow
    # run — drain twice (25 ids per poll), offsets resuming from the
    # checkpoint across runs (which is the replay property under test)
    for _ in range(2):
        q = (
            stream.select("url", "doc_id", "lang")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert got == list(range(50))
    # batch and stream generate the SAME pages for the same ids
    batch = spark.read.format("synthetic_pages").option("n", 50).load()
    b = {r.doc_id: r.url for r in batch.collect()}
    s = {r.doc_id: r.url for r in spark.read.parquet(sink).collect()}
    assert b == s


def test_source_feeds_the_extraction_operator(spark):
    from post_ocr_corretion_spark.operators.extract import extract

    _register(spark)
    pages = spark.read.format("synthetic_pages").option("n", 20).load()
    out = extract(pages)
    rows = out.select("url", "extracted_text").collect()
    assert len(rows) == 20
    assert all(r.extracted_text is not None for r in rows)
