"""Spark 4 Python DataSource for the synthetic crawl corpus — a
first-class custom SOURCE (batch + streaming) rather than a
parquet-then-transform pipeline.

Why it matters at scale: the corpus is a pure function of ``doc_id``, so
the source can (a) split the id space into contiguous ``InputPartition``
ranges that generate IN the executors — no driver materialization, no
shuffle, arbitrarily wide parallelism; and (b) implement real FILTER
PUSHDOWN (``pushFilters``, Spark 4.1): ``doc_id`` range/equality
predicates narrow the generated id interval before a single row exists,
the custom-source analog of parquet partition pruning
(tests/test_synthetic_source.py asserts both the pruned row set and
that consumed filters vanish from the scan's post-filter).

The streaming half (``SimpleDataSourceStreamReader``) turns the same id
space into a deterministic micro-batched crawl feed: offsets are plain
``{"doc_id": next_id}`` dicts, every batch is replayable byte-for-byte
(``readBetweenOffsets`` regenerates any committed range — exactly-once
on restart comes from determinism, not from buffering), and the feed
composes with the streaming dedup/asof/join operators in this package.

Register per session and read:

    spark.dataSource.register(SyntheticPagesDataSource)
    spark.read.format("synthetic_pages").option("n", 500).load()
    spark.readStream.format("synthetic_pages").option("rate", 100).load()

Text/lang here are self-contained deterministic synthesis (seeded from
doc_id over the shipped word list) — independent of the driver's
``documents`` parquet by design: a source must not need a side table.
"""
from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

PAGE_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string, doc_id long"
)
_LANGS = ("en", "en", "en", "en", "la")  # 1-in-5 non-en, like the fixture corpus


def synth_text(doc_id: int) -> str:
    """Deterministic document text: 40-79 words drawn from the shipped
    word list, seeded by doc_id (Knuth-hash spread)."""
    from ..datagen.wordlist import COMMON_WORDS

    words = sorted(set(COMMON_WORDS))
    rng = random.Random((doc_id * 2654435761) & 0xFFFFFFFF)
    n = 40 + rng.randrange(40)
    return " ".join(words[rng.randrange(len(words))] for _ in range(n))


def lang_for(doc_id: int) -> str:
    return _LANGS[doc_id % len(_LANGS)]


def page_row(doc_id: int) -> tuple:
    from ..datagen.webpages import make_page

    p = make_page(doc_id, synth_text(doc_id), lang_for(doc_id))
    return (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"], doc_id)


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int


class SyntheticPagesReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.lo, self.hi = 0, self.n  # generated id interval [lo, hi)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume doc_id range/equality predicates by narrowing the
        generated interval — the rows they'd reject are never created.
        Everything else is returned for Spark to evaluate post-scan."""
        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, f.value + 1)
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        if total == 0:
            return [RangePartition(lo, lo)]
        k = max(1, min(self.num_partitions, total))
        step = -(-total // k)
        return [
            RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield page_row(doc_id)


class SyntheticPagesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched crawl feed over the same deterministic id space:
    each poll emits the next ``rate`` pages (until ``n`` if set).
    Offsets are replayable — any [start, end) regenerates identically."""

    def __init__(self, options):
        self.rate = int(options.get("rate", 100))
        self.n = int(options.get("n", 0)) or None  # optional hard cap

    def initialOffset(self):
        return {"doc_id": 0}

    def read(self, start: dict):
        s = int(start["doc_id"])
        e = s + self.rate
        if self.n is not None:
            e = min(e, self.n)
        return iter([page_row(i) for i in range(s, e)]), {"doc_id": max(e, s)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([page_row(i) for i in range(int(start["doc_id"]), int(end["doc_id"]))])

    def commit(self, end: dict) -> None:
        pass  # determinism IS the commit log — nothing to persist


class SyntheticPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_pages"

    def schema(self) -> str:
        return PAGE_SCHEMA_DDL

    def reader(self, schema):
        return SyntheticPagesReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticPagesStreamReader(self.options)
