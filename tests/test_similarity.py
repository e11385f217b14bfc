"""Similarity operators: brute-force exactness, LSH recall, IVF recall."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )


def _numpy_topk(emb_rows, qids, k=5):
    ids = np.array([r.vec_id for r in emb_rows])
    X = np.array([r.v for r in emb_rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qi = list(ids).index(q)
        cos = Xn @ Xn[qi]
        cos[qi] = -2
        order = sorted(range(len(ids)), key=lambda i: (-round(cos[i], 4), ids[i]))
        out[q] = [int(ids[i]) for i in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, emb, queries):
    from post_ocr_corretion_spark.operators.similarity import brute_force_topk

    got = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        got.setdefault(r.qid, []).append((r.rnk, r.vec_id))
    got = {q: [v for _, v in sorted(rows)] for q, rows in got.items()}
    want = _numpy_topk(emb.collect(), list(got))
    assert got == want


def test_ivf_recall(spark, emb, queries):
    from post_ocr_corretion_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, k=8, iters=5)
    assert len(cents) == 8 and all(abs(np.linalg.norm(c) - 1) < 1e-9 for c in cents)

    # determinism
    assert kmeans_centroids(emb, k=8, iters=5) == cents

    # every vector lands in exactly one list; lists are non-degenerate
    counts = ivf_assign(emb, cents).groupBy("list_id").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    assert len(counts) >= 4

    exact = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r.qid, set()).add(r.vec_id)
    approx = {}
    for r in ivf_topk(emb, queries, cents, k=5, nprobe=3).collect():
        approx.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [len(approx.get(q, set()) & s) / len(s) for q, s in exact.items()]
    assert sum(recalls) / len(recalls) >= 0.5  # nprobe=3 of 8 lists


def test_lsh_near_dup_subset_of_exact(spark, emb):
    from post_ocr_corretion_spark.operators.similarity import (
        cosine_near_dup_pairs,
        hyperplanes,
        lsh_near_dup_pairs,
    )

    exact = {(r.da, r.db) for r in cosine_near_dup_pairs(emb, threshold=0.35).collect()}
    lsh = {(r.da, r.db) for r in lsh_near_dup_pairs(emb, hyperplanes(6, 64), threshold=0.35).collect()}
    assert lsh <= exact  # LSH candidates are verified with exact cosine
    if exact:
        assert len(lsh) / len(exact) >= 0.1  # 6 planes keeps some recall


def test_distributed_kmeans_ivf_recall(spark, emb, queries):
    """The fully distributed Lloyd fit (only the k×d matrix hits the
    driver) produces unit centroids, non-degenerate lists, and IVF recall
    on par with the sample fit."""
    from post_ocr_corretion_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        kmeans_centroids_distributed,
    )

    cents = kmeans_centroids_distributed(emb, k=8, iters=4)
    assert len(cents) == 8 and all(abs(np.linalg.norm(c) - 1) < 1e-9 for c in cents)
    counts = ivf_assign(emb, cents).groupBy("list_id").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    assert len(counts) >= 4

    exact = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r.qid, set()).add(r.vec_id)
    approx = {}
    for r in ivf_topk(emb, queries, cents, k=5, nprobe=3).collect():
        approx.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [len(approx.get(q, set()) & s) / len(s) for q, s in exact.items()]
    assert sum(recalls) / len(recalls) >= 0.5
