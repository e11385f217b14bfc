"""Multimodal columns (round-1 brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is REAL and tested; the actual media decode is STUBBED because
the image/audio libraries are not in this container:

- ``decode_image`` raises ``NotImplementedError`` when asked for a real
  decode (``strict=True``);
- by default it produces a DETERMINISTIC FAKE feature vector derived from
  the bytes (md5-seeded), so downstream operators (resize plumbing, frame
  sampling, feature joins) are exercised end-to-end with stable values.

Blob table schema (typed-metadata pattern):
    blob_id: long, kind: string (image|audio|video),
    media: binary, meta: struct<width:int, height:int, duration_ms:int>
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def decode_image(media: bytes, strict: bool = False) -> np.ndarray:
    """STUB — real decode needs an image library absent from this
    container. strict=True marks the real path; the default returns a
    deterministic md5-seeded fake feature vector so the Spark plumbing is
    fully exercised and testable."""
    if strict:
        raise NotImplementedError("image decode requires a media library not present in this environment")
    digest = hashlib.md5(media).digest()
    seed = int.from_bytes(digest[:4], "big")
    rs = np.random.RandomState(seed)
    return rs.standard_normal(FEATURE_DIM).astype(np.float64)


def frame_sample_offsets(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Deterministic frame-sampling plan for video blobs."""
    # nullable int struct fields arrive from Arrow as floats (NaN = null)
    if duration_ms is None or duration_ms != duration_ms or duration_ms <= 0:
        return []
    return list(range(0, int(duration_ms), every_ms))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
        T.StructField("frame_offsets", T.ArrayType(T.IntegerType()), False),
    ]
)


def extract_features(blobs: DataFrame, every_ms: int = 1000) -> DataFrame:
    """One Arrow-batched pass over the blob table: per blob, byte count,
    (stub-)decoded feature vector, and the frame-sampling plan for videos.
    Column pruning applies: only the consumed columns are scanned."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                media = bytes(r.media)
                meta = r.meta if isinstance(r.meta, dict) else {}
                duration = meta.get("duration_ms") if meta else None
                rows.append(
                    {
                        "blob_id": int(r.blob_id),
                        "kind": r.kind,
                        "n_bytes": len(media),
                        "features": decode_image(media).tolist(),
                        "frame_offsets": frame_sample_offsets(duration, every_ms)
                        if r.kind == "video"
                        else [],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return blobs.select("blob_id", "kind", "media", "meta").mapInPandas(run, FEATURE_SCHEMA)


def synthetic_blobs(spark, n: int = 32) -> DataFrame:
    """Deterministic fixture blob table."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        media = (f"blob-{i}-" + "x" * (i % 7)).encode()
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "duration_ms": 3500 + i * 100 if kind != "image" else None,
        }
        rows.append((i, kind, media, meta))
    return spark.createDataFrame(rows, BLOB_SCHEMA)
