"""Streaming correction: the SAME beam operator (mapInPandas is
stream-capable) applied to a readStream source produces byte-identical
output to the batch run — Structured Streaming's unified-API promise,
exercised on our flagship operator."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_correction_matches_batch(spark, docs_rows, fixture_scorer, fixture_lexicon, tmp_path):
    from post_ocr_corretion_spark.operators.correction import run_beam_udf

    texts = [(r["text"],) for r in docs_rows[:40]]
    src = str(tmp_path / "src")
    spark.createDataFrame(texts, "extracted_text string").coalesce(1).write.parquet(src)

    scorer_bc = spark.sparkContext.broadcast(fixture_scorer)
    lex_bc = spark.sparkContext.broadcast(fixture_lexicon)

    batch = {
        r.extracted_text: r.corrected_words
        for r in run_beam_udf(spark.read.parquet(src), scorer_bc, lex_bc).collect()
    }

    stream = spark.readStream.schema("extracted_text string").parquet(src)
    sink = str(tmp_path / "sink")
    q = (
        run_beam_udf(stream, scorer_bc, lex_bc)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {r.extracted_text: r.corrected_words for r in spark.read.parquet(sink).collect()}
    assert streamed == batch and len(streamed) == len(texts)
