"""Deterministic mixture sampling — the dataset-mixing step of an LLM
training-data pipeline (temperature sampling over sources, as in
multilingual pretraining: selection mass proportional to n_source^alpha
so small sources are up-weighted relative to raw proportions, alpha=1
reproduces them, alpha=0 flattens).

Every selection decision is a pure function of (seed, doc id): a
document is kept iff u(doc) < p(source), with u the first 13 hex chars
of md5(seed#id) over 2^52 (exactly representable in a double, so the
uniform is bit-identical in any engine that has md5) and p derived from
per-source counts. Re-running the job reselects the identical sample —
no RNG state, no per-partition dependence.

Scale shape: per-source counts are ONE map-side-partial aggregate over
a two-column projection; the weight table (|sources| rows) and its
total (one row) ride broadcast joins back; the keep test is a pure
projection. The corpus is never shuffled.

Determinism contract (cross-engine hash parity): per-source weights
n^alpha are rounded to 8 decimals and cast to DECIMAL(18,8) BEFORE the
total sum (exact arithmetic, partitioning-independent); the keep
probability is then computed in DOUBLES from the exact decimal inputs
with one fixed operation order — identical IEEE sequence in DuckDB.
alpha=0.5 routes through F.sqrt (correctly rounded by IEEE 754, so
bit-identical across engines); other alphas use pow and are
Spark-deterministic but not certified cross-engine-bit-identical.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_52 = float(1 << 52)


def _uniform(seed: str, id_col: str) -> F.Column:
    """u in [0, 1): 52 bits of md5(seed#id) over 2^52 — exact in a
    double, replayable in DuckDB (('0x'||substr(md5,1,13))::UBIGINT)."""
    h = F.md5(F.concat(F.lit(seed), F.lit("#"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("decimal(38,0)").cast(
        "double"
    ) / F.lit(TWO_52)


def mixture_sample(
    docs: DataFrame,
    target_rows: int,
    alpha: float = 0.5,
    seed: str = "mix",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """All input columns plus (n_source, p_keep) for the kept rows:
    each source s with n_s rows gets selection mass w_s = n_s^alpha;
    p_keep(s) = min(1, target_rows * (w_s / W) / n_s), and a row
    survives iff its md5-uniform < p_keep. E[rows kept] = target_rows
    when no source saturates p=1."""
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    w_raw = (
        F.sqrt(F.col("n_source").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_source").cast("double"), F.lit(float(alpha)))
    )
    weights = (
        docs.groupBy(F.col(source_col))
        .agg(F.count(F.lit(1)).alias("n_source"))
        .withColumn("_w", F.round(w_raw, 8).cast("decimal(18,8)"))
    )
    total = weights.agg(F.sum("_w").alias("_tw"))  # exact decimal sum
    p_keep = F.least(
        F.lit(1.0),
        F.lit(float(target_rows))
        * (F.col("_w").cast("double") / F.col("_tw").cast("double"))
        / F.col("n_source").cast("double"),
    )
    probs = (
        weights.join(F.broadcast(total))  # single-row cross join, no collect
        .select(source_col, "n_source", p_keep.alias("p_keep"))
    )
    return (
        docs.join(F.broadcast(probs), source_col)
        .filter(_uniform(seed, id_col) < F.col("p_keep"))
        .select(*docs.columns, "n_source", "p_keep")
    )


def mixture_sample_tokens(
    docs: DataFrame,
    target_tokens: int,
    alpha: float = 0.5,
    seed: str = "mixtok",
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget temperature sampling: identical selection law to
    ``mixture_sample`` but mass is measured in TOKENS — the unit
    training budgets are actually written in. Source s with t_s total
    tokens gets weight w_s = t_s^alpha; a doc survives iff its
    md5-uniform < p_keep(s) = min(1, target_tokens·(w_s/W)/t_s), so
    E[kept tokens] ≈ target_tokens when no source saturates (each doc
    keeps or drops WHOLE — the document-integrity invariant of mixture
    sampling; per-doc token counts only enter through t_s).

    Scale shape unchanged: one map-side aggregate for per-source token
    sums (the split/size projection never shuffles the text), the
    |sources|-row weight table broadcast back, keep test a projection.
    Cross-engine contract identical to mixture_sample (DECIMAL weight
    rounding, sqrt for alpha=0.5, md5-uniform)."""
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be positive, got {target_tokens}")
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    w_raw = (
        F.sqrt(F.col("t_source").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("t_source").cast("double"), F.lit(float(alpha)))
    )
    weights = (
        docs.select(source_col, n_tok.alias("_nt"))
        .groupBy(source_col)
        .agg(F.sum("_nt").cast("long").alias("t_source"))
        .withColumn("_w", F.round(w_raw, 8).cast("decimal(18,8)"))
    )
    total = weights.agg(F.sum("_w").alias("_tw"))
    p_keep = F.least(
        F.lit(1.0),
        F.lit(float(target_tokens))
        * (F.col("_w").cast("double") / F.col("_tw").cast("double"))
        / F.col("t_source").cast("double"),
    )
    probs = weights.join(F.broadcast(total)).select(
        source_col, "t_source", p_keep.alias("p_keep")
    )
    return (
        docs.join(F.broadcast(probs), source_col)
        .filter(_uniform(seed, id_col) < F.col("p_keep"))
        .select(*docs.columns, "t_source", "p_keep")
    )
