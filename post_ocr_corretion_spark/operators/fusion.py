"""Reciprocal-rank fusion of ranked retrieval lists (Cormack, Clarke &
Buettcher, SIGIR 2009): RRF(d) = Σ_r 1/(k + rank_r(d)) over the ranked
lists r that contain document d. The standard hybrid-retrieval
combiner — fuse a sparse (BM25) top-k with a dense (embedding-cosine)
top-k without score calibration, since only RANKS enter the sum.

Scale shape: each input list is already a bounded top-k (≤ k rows per
query — the expensive retrieval happened upstream with its own scale
path: bm25.py's map-side postings prune, similarity.py's IVF probes).
The fusion itself is a union of tiny frames + one hash aggregate over
≤ Σk rows, then a TakeOrderedAndProject top-k. Nothing here ever
touches the corpus; at 100 TB the fused frame is still |queries|·Σk
rows.

Determinism contract: each reciprocal term 1/(rrf_k + rank) is a double
computed from exact integers (identical IEEE result in any engine),
rounded to 8 decimals and cast to DECIMAL(18,8) before the per-doc sum,
so aggregation order cannot move the fused score (the repo's
cross-engine float rule; see bm25.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """(id_col, n_lists, rrf_score, rnk) — the k documents with the
    highest reciprocal-rank-fusion score over the input ranked lists.
    Each input frame must carry (id_col, rank_col) with rank_col a
    1-based dense rank; documents absent from a list contribute nothing
    for that list (the standard RRF convention for top-k inputs).
    ``n_lists`` counts how many lists the document appeared in (a free
    interpretability column: 2 = found by both retrievers). Ties break
    by id ascending."""
    if not ranked:
        raise ValueError("ranked must be non-empty")
    parts = [
        df.select(
            F.col(id_col).alias("_id"),
            F.round(
                F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double")), 8
            )
            .cast("decimal(18,8)")
            .alias("_term"),
        )
        for df in ranked
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    fused = un.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.round(F.sum("_term").cast("double"), 8).alias("rrf_score"),
    )
    topk = fused.orderBy(F.col("rrf_score").desc(), F.col("_id").asc()).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("_id").asc())
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        F.col("_id").alias(id_col), "n_lists", "rrf_score", "rnk"
    )
