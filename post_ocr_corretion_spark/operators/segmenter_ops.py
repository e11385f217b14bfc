"""Segmentation as a Spark operator: the reference's seq2seq entry point
(textSegmentator.py / SURVEY.md §3.2) with the deterministic Viterbi
model (core/segmenter.py) in place of the unusable Transformer.

Dataflow = the reference's, end to end: P2 clean → D2 split-to-fit →
P4 de-space (model input) → segment → A12 Levenshtein-ratio eval against
the pre-de-spacing text. One broadcast (the unigram cost table), one
Arrow-batched UDF.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.segmenter import ViterbiSegmenter
from .lexicon import corpus_word_frequencies
from .segmentation import prepare_sequences


def build_segmenter_broadcast(spark: SparkSession, docs: DataFrame):
    counts = {r.word: r.freq for r in corpus_word_frequencies(docs).collect()}
    return spark.sparkContext.broadcast(ViterbiSegmenter(counts))


def make_segment_udf(segmenter_bc):
    @F.pandas_udf(T.StringType())
    def segment(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        seg = segmenter_bc.value
        for s in it:
            yield s.map(seg.segment_text)

    return segment


def segment_documents(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(seq_id, output_seq, input_seq, segmented) — segmented is the
    model's re-spacing of the de-spaced input."""
    seqs = prepare_sequences(docs)
    seg_udf = make_segment_udf(build_segmenter_broadcast(spark, docs))
    return seqs.withColumn("segmented", seg_udf(F.col("input_seq")))


def segmentation_eval(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """A12 over (segmented, original): one row (avg_ratio, std_ratio) —
    the reference's seq2seq quality metric (seq2seqEvaluation.py:63-72,
    published value 0.29; this segmenter scores far higher)."""
    from .metrics import avg_levenshtein_ratio

    seg = segment_documents(spark, docs)
    return avg_levenshtein_ratio(seg, "segmented", "output_seq")
