"""Similarity search over embedding columns (round-1 brief): brute-force
cosine top-k as the exactness baseline, random-hyperplane LSH bucketing as
the scale path, and cosine near-duplicate pairs.

All expression-level (F.zip_with/F.aggregate for the dot products — JVM
side, no UDF). The LSH hyperplanes are a deterministic seeded matrix
(numpy RandomState, rounded to 4 decimals) inlined as literals, so the
DuckDB oracle can reproduce the buckets exactly.

Scale: brute-force is O(Q×N) — fine for a broadcast query set; the LSH
path buckets the corpus once (one narrow pass), then only intra-bucket
pairs are scored: the classic trade of recall for a bounded candidate set.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

LSH_SEED = 20240616


def hyperplanes(n_planes: int, dim: int, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic rounded hyperplanes shared with the SQL oracle."""
    rs = np.random.RandomState(seed)
    return [[round(float(x), 4) for x in row] for row in rs.standard_normal((n_planes, dim))]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """queries (qid, qv) × corpus (vec_id, v) → top-k by (cos desc, id)."""
    scored = (
        queries.crossJoin(emb)
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", id_col, F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket string: '1' if dot(v, h_j) > 0 else '0', j-ordered."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_near_dup_pairs(
    emb: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Bucket by hyperplane signs, score cosine only within buckets →
    (da, db, cos) pairs ≥ threshold. The scale path for near-dup."""
    bucketed = emb.select(id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("bkt"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(
        F.col(f"a.{id_col}").alias("da"),
        F.col(f"b.{id_col}").alias("db"),
        F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 4).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold)


def cosine_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Exact O(N²) near-dup baseline (the oracle for the LSH path's
    recall measurement)."""
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("da"),
            F.col(f"b.{id_col}").alias("db"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
