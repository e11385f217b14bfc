"""Training-data scrubbing operators: PII redaction and benchmark
decontamination — the two cleanup passes every web-scale LLM data
pipeline runs between extraction and training (C4 strips lines by
pattern; Dolma/RefinedWeb redact emails/IPs/phones; GPT-3/PaLM-style
decontamination drops training docs sharing long n-grams with the eval
benchmarks).

Both are pure Catalyst — regexp functions and equi-joins inside
whole-stage codegen, no Python anywhere — and both are oracle-able
(DuckDB reproduces the same regexes and the same n-gram join), so they
gate like every other operator.

Scale shape:
- ``redact_pii`` is embarrassingly parallel (per-row regexp_replace;
  zero shuffles — it composes into any scan without changing the plan's
  exchange structure).
- ``decontaminate`` hashes the benchmark's word n-grams into a distinct
  key set and equi-joins the corpus's exploded n-grams against it.
  Benchmarks are small (≤ millions of n-grams), so the join broadcasts;
  the corpus side never shuffles. The n-gram explode multiplies rows
  ~doc_len×, but entirely map-side — filtered back down by the join
  before any exchange.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deliberately conservative patterns (high precision): a training
# pipeline prefers leaving a weird string alone over mangling prose.
# Kept DuckDB-compatible (RE2-ish subset: no backrefs, no lookaround).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}\b"

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "ipv4": (IPV4_RE, "<IP>"),
    "phone": (PHONE_RE, "<PHONE>"),
}


def redact_pii(
    docs: DataFrame, text_col: str = "text", patterns: dict[str, tuple[str, str]] | None = None
) -> DataFrame:
    """Replace each PII class with its sentinel token and count the hits
    per document: adds ``<text_col>_redacted`` plus one ``n_<class>``
    BIGINT column per pattern. Counts come from the SAME pass's
    regexp_count, so the audit trail (how much PII a shard carried) is a
    free by-product — a pipeline aggregates them into its lineage rows.

    Order of application is the dict order; patterns are applied to the
    output of the previous one (sentinels contain no '@'/digit runs, so
    the stock classes never cascade)."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out = docs
    redacted = F.col(text_col)
    for name, (regex, token) in patterns.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(regex)).cast("long")
        )
        redacted = F.regexp_replace(redacted, regex, token)
    return out.withColumn(f"{text_col}_redacted", redacted)


def _word_ngrams(df: DataFrame, text_col: str, n: int):
    """Exploded lowercase word n-grams as single space-joined strings.
    Split on whitespace runs; empty tokens dropped (leading blanks)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    # r9: tokens staged through a generator once per row — the
    # split+filter expression captured in the per-window lambda was
    # re-evaluated for every window (no CSE in interpreted HOFs; the
    # winnowing O(n²) fix). Same grams.
    tks = F.col("_toks")
    # guard the short-doc case explicitly: Spark's sequence(0, -1) would
    # generate a DESCENDING [0, -1], not an empty list
    idx = F.when(F.size(tks) >= n, F.sequence(F.lit(0), F.size(tks) - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tks, i + 1, n), " "))
    cols = df.columns
    return (
        df.select("*", F.explode(F.array(toks)).alias("_toks"))
        .select(*cols, F.explode(grams).alias("_gram"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap: a training doc
    is CONTAMINATED when it shares at least one lowercase word ``n``-gram
    with any benchmark doc (the GPT-3 appendix-C / PaLM convention;
    n=8..13 typical). ``mode='flag'`` returns every doc with
    ``contaminated`` BOOLEAN and ``n_hit_grams`` BIGINT (distinct
    overlapping grams — the audit number); ``mode='drop'`` returns the
    clean subset of ``docs`` unchanged (an anti-join, for composing
    straight into a training-table write).

    The benchmark's distinct gram set is the small side: Spark
    broadcasts it under AQE (or hint it); the corpus never shuffles in
    'drop' mode — explode, broadcast-anti-join, done."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    bench_grams = (
        _word_ngrams(benchmark.select(bench_text_col), bench_text_col, n)
        .select(F.col("_gram"))
        .distinct()
    )
    if mode == "drop":
        doc_grams = _word_ngrams(docs, text_col, n)
        dirty = doc_grams.join(bench_grams, "_gram", "left_semi").select(id_col).distinct()
        return docs.join(dirty, id_col, "left_anti")
    doc_grams = _word_ngrams(docs.select(id_col, text_col), text_col, n)
    hits = (
        doc_grams.join(bench_grams, "_gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("_gram").alias("n_hit_grams"))
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_hit_grams", F.coalesce(F.col("n_hit_grams"), F.lit(0)))
        .withColumn("contaminated", F.col("n_hit_grams") > 0)
    )
