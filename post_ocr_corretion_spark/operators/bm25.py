"""BM25 ranked retrieval (Robertson & Walker 1994; the Okapi weighting
used for corpus search / relevance filtering in data pipelines — e.g.
selecting pretraining documents relevant to a seed query set).

score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (the non-negative variant).

Scale shape: the term postings are one explode filtered DOWN to the
query terms before any shuffle (a |terms|-element isin prunes the token
stream map-side); df and the corpus stats are tiny aggregates that ride
broadcast joins; tf is a (doc, term) hash aggregate. The corpus is
scanned once, whole documents never shuffle.

Determinism contract: idf is a per-row ln of an exact rational, rounded
to 8 decimals and cast to DECIMAL(18,8) (the repo's cross-engine float
rule); per-term partial scores are likewise rounded to DECIMAL before
the per-doc sum, so aggregation order cannot move the result and DuckDB
replays it bit-for-bit; avgdl and every tf factor are doubles derived
from exact integers with one fixed operation order.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.5,  # Robertson's k1 in [1.2, 2.0]; 1.5 (and b=0.75, 1-b=0.25,
    b: float = 0.75,  # k1+1=2.5) are exactly binary-representable, so every
    # oracle literal is the bit-identical double
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, score, rnk) — the k highest-BM25 documents for the
    query ``terms`` (ties broken by id). Documents matching no term
    score 0 and are not returned. ``terms`` is treated as a SET:
    query-term multiplicity is not weighted (['spark','spark'] scores
    like ['spark'] — deduped explicitly below so the isin filter's
    implicit collapse is the documented semantics), and terms absent
    from the corpus contribute nothing."""
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = sorted(set(terms))
    toks = F.split(F.col(text_col), " ")
    base = docs.select(id_col, F.size(toks).cast("long").alias("_dl"), toks.alias("_t"))
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_sumdl"),
    )
    hits = base.select(
        id_col, "_dl", F.explode("_t").alias("_w")
    ).filter(F.col("_w").isin(terms))
    tf = hits.groupBy(id_col, "_w").agg(
        F.count(F.lit(1)).cast("long").alias("_tf"), F.first("_dl").alias("_dl")
    )
    df = hits.select(id_col, "_w").distinct().groupBy("_w").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    nd, dfd = F.col("_n").cast("double"), F.col("_df").cast("double")
    idf = F.round(
        F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0)), 8
    ).cast("decimal(18,8)")
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    tf_part = (F.col("_tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("_tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("_dl").cast("double") / F.col("_avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df), "_w")
        .join(F.broadcast(stats))  # single-row cross join: N and avgdl
        .withColumn("_avgdl", avgdl)
        .withColumn("_idf", idf)
        .withColumn(
            "_s",
            F.round(F.col("_idf").cast("double") * tf_part, 8).cast("decimal(18,8)"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.sum("_s").cast("double"), 6).alias("score")
    )
    # distributed top-k (TakeOrderedAndProject — per-partition heads then
    # one bounded merge, never a single-task global sort); the rank
    # window then runs over <= k rows
    topk = per_doc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.withColumn("rnk", F.row_number().over(w))
