"""Main-content extraction operator (north rule): Arrow-batched
mapInPandas over ``html:binary``, calling the SAME core/extraction.py code
the parity oracle uses — per-url byte-identity by construction, verified
by tests.

Column pruning matters here more than anywhere (never deserialize html
when only text is needed — SURVEY.md §4): the operator selects exactly the
columns it consumes, so a downstream projection prunes the parquet scan.
Per-batch counters (pages, html bytes, extracted chars, pdf stubs) feed
the lineage table (io/snapshots.py).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..core.extraction import extract_document

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [T.StructField("start", T.LongType(), False), T.StructField("end", T.LongType(), False)]
                )
            ),
            False,
        ),
        T.StructField("html_bytes", T.LongType(), False),
    ]
)


def extract(pages: DataFrame) -> DataFrame:
    cols = ["url", "warc_ts", "lang", "html"]
    if "doc_id" in pages.columns:
        cols.append("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, spans, kinds, sizes = [], [], [], []
            for raw in pdf["html"]:
                raw = bytes(raw)
                text, sp, kind = extract_document(raw)
                texts.append(text)
                spans.append([{"start": s, "end": e} for s, e in sp])
                kinds.append(kind)
                sizes.append(len(raw))
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "doc_id": pdf["doc_id"] if "doc_id" in pdf.columns else pd.Series([None] * len(pdf)),
                    "kind": kinds,
                    "extracted_text": texts,
                    "spans": spans,
                    "html_bytes": sizes,
                }
            )
            yield out

    return pages.select(*cols).mapInPandas(run, EXTRACT_SCHEMA)


def render_and_extract(docs: DataFrame) -> DataFrame:
    """Fused synthetic-render + extract in ONE Arrow-batched stage.

    Composing sources/webpages.webpages with extract() ships every page's
    html bytes JVM→Python→JVM→Python; since both ends are per-row pure
    functions, fusing them removes the largest Arrow transfer of the
    pipeline (the html column) entirely. Output is identical to
    ``extract(webpages(docs))`` — tests assert it."""
    from ..datagen.webpages import make_page

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                page = make_page(int(r.doc_id), r.text, r.lang)
                text, sp, kind = extract_document(page["html"])
                rows.append(
                    {
                        "url": page["url"],
                        "warc_ts": page["warc_ts"],
                        "lang": page["lang"],
                        "doc_id": int(r.doc_id),
                        "kind": kind,
                        "extracted_text": text,
                        "spans": [{"start": s, "end": e} for s, e in sp],
                        "html_bytes": len(page["html"]),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text", "lang").mapInPandas(run, EXTRACT_SCHEMA)
