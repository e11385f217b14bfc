"""Python UDTFs (Spark 4 user-defined TABLE functions) — the §2.10
API category the reference has none of: one input row → many output
rows with their own schema, callable from SQL via LATERAL.

``WordChunks`` is the document-pipeline flavor: fixed-width word
windows with character offsets back into the source text — the
span-offset bookkeeping the north rule's extraction stage keeps, and
the chunking step every embedding/indexing pipeline runs before
vectorizing. The contract (10-word chunks over a single-space split,
offset = chars consumed by preceding words + separators) is pinned so
the DuckDB oracle replays it exactly via list slicing + prefix sums.

Arrow-batched: ``spark.sql.execution.pythonUDTF.arrow.enabled`` (a
session.py default here) plans this as ``ArrowEvalPythonUDTF`` — the
vectorized transfer path, not row-pickled Python (the registry-wide
plan sweep treats BatchEvalPython as a failure)."""
from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_WORDS = 10


@udtf(returnType="chunk_id int, chunk string, start int")
class WordChunks:
    """(text) → rows (chunk_id, 10-word chunk, start-offset-in-text)."""

    def eval(self, text: str):
        if text is None:
            return
        words = text.split(" ")
        start = 0
        for i in range(0, (len(words) + CHUNK_WORDS - 1) // CHUNK_WORDS):
            ws = words[i * CHUNK_WORDS : (i + 1) * CHUNK_WORDS]
            yield i, " ".join(ws), start
            start += sum(len(w) + 1 for w in ws)


def register_udtfs(spark) -> None:
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("word_chunks", WordChunks)
