"""North-rule input table ``(url, warc_ts, html, text, lang)`` built
deterministically from the driver's ``documents`` parquet.

Generation runs DISTRIBUTED via mapInPandas (each task renders its own
partition's pages — a pure function of (doc_id, text), so the table is
identical no matter the partitioning), which is exactly how a synthetic
corpus would be materialized at cluster scale. ``doc_id`` is kept as a
convenience column for tests; the north-rule key is ``url``.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..datagen.webpages import make_page

WEBPAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("doc_id", T.LongType(), False),
    ]
)


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def webpages(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) → north-rule webpages table."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_page(int(r.doc_id), r.text, r.lang) for r in pdf.itertuples()]
            out = pd.DataFrame(rows)
            out["doc_id"] = pdf["doc_id"].values
            yield out

    return docs.select("doc_id", "text", "lang").mapInPandas(render, WEBPAGE_SCHEMA)


def webpages_from_sf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return webpages(read_documents(spark, sf_dir))


def replicate_docs(docs: DataFrame, n: int) -> DataFrame:
    """Deterministically replicate the documents table ×n
    (doc_id' = doc_id + 10^7·k): pages are pure functions of doc_id, so
    the result IS a larger instance of the same table (scaling
    benchmarks, --replicate). The multiplier term must be LONG — an
    int32 k×10^7 overflows under ANSI mode at k > 214 (r3 fix; this
    helper exists so that cast lives in exactly one place)."""
    if n <= 1:
        return docs
    from pyspark.sql import functions as F

    return (
        docs.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("k").cast("long") * F.lit(10_000_000))
        .drop("k")
    )
