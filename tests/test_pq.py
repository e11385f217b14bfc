"""Product quantization (operators/pq.py): codebook shape and
determinism, encode bounds, ADC+re-rank recall on a planted-cluster
corpus, and exactness when the codebook can represent the corpus
perfectly."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.pq import pq_adc_topk, pq_encode, pq_fit
from post_ocr_corretion_spark.operators.similarity import brute_force_topk

D, M, KSUB = 16, 4, 8


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated unit-norm cluster centers in R^16, 20 members
    each with small jitter — PQ with ksub=8 per subspace can represent
    this corpus almost losslessly."""
    rs = np.random.RandomState(7)
    centers = rs.standard_normal((8, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            v = c + 0.05 * rs.standard_normal(D)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, v array<double>").cache()


@pytest.fixture(scope="module")
def codebooks(clustered):
    return pq_fit(clustered, m=M, ksub=KSUB, iters=4)


def test_codebook_shape(codebooks):
    assert len(codebooks) == M
    assert all(len(cb_s) == KSUB for cb_s in codebooks)
    assert all(len(c) == D // M for cb_s in codebooks for c in cb_s)


def test_fit_deterministic_across_partitioning(spark, clustered, codebooks):
    again = pq_fit(clustered.repartition(7), m=M, ksub=KSUB, iters=4)
    # init is hash-ordered and updates are sums of the same members —
    # identical up to float-sum order, which the planted separation
    # makes assignment-stable; compare with a tolerance
    for s in range(M):
        for j in range(KSUB):
            assert np.allclose(codebooks[s][j], again[s][j], atol=1e-9)


def test_encode_bounds_and_determinism(spark, clustered, codebooks):
    codes = pq_encode(clustered, codebooks).collect()
    assert len(codes) == 160
    for r in codes:
        assert len(r.codes) == M
        assert all(0 <= c < KSUB for c in r.codes)
    again = {r.vec_id: r.codes for r in pq_encode(clustered.repartition(5), codebooks).collect()}
    assert all(again[r.vec_id] == r.codes for r in codes)


def test_adc_recall_on_planted_clusters(spark, clustered, codebooks):
    q = clustered.filter(F.col("vec_id").isin(0, 20, 40)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = {(r.qid, r.vec_id) for r in brute_force_topk(clustered, q, k=5).collect()}
    pq = {(r.qid, r.vec_id) for r in pq_adc_topk(clustered, q, codebooks, k=5, cand=25).collect()}
    assert len(bf & pq) / len(bf) >= 0.8  # jitter 0.05 vs centroid cells: near-lossless


def test_full_topk_per_query(spark, clustered, codebooks):
    q = clustered.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    out = pq_adc_topk(clustered, q, codebooks, k=5, cand=25).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_validation(spark, clustered):
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(clustered, m=5, ksub=4, iters=1)
    empty = clustered.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        pq_fit(empty, m=M, ksub=KSUB, iters=1)
    with pytest.raises(ValueError, match="need >="):
        pq_fit(clustered.filter(F.col("vec_id") < 4), m=M, ksub=KSUB, iters=1)


@pytest.fixture(scope="module")
def ivfpq_index(clustered):
    from post_ocr_corretion_spark.operators.pq import ivfpq_fit

    return ivfpq_fit(clustered, n_lists=4, m=M, ksub=KSUB, iters=3, coarse_iters=4)


def test_ivfpq_recall_on_planted_clusters(spark, clustered, ivfpq_index):
    from post_ocr_corretion_spark.operators.pq import ivfpq_topk

    cents, cb = ivfpq_index
    q = clustered.filter(F.col("vec_id").isin(0, 20, 40)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = {(r.qid, r.vec_id) for r in brute_force_topk(clustered, q, k=5).collect()}
    got = {
        (r.qid, r.vec_id)
        for r in ivfpq_topk(clustered, q, cents, cb, k=5, nprobe=2, cand=25).collect()
    }
    # planted clusters: a query's true neighbors share its (probed) list,
    # and residual-PQ at ksub=8 resolves the 0.05 jitter — high recall
    assert len(bf & got) / len(bf) >= 0.8


def test_ivfpq_returns_full_topk_and_exact_cos(spark, clustered, ivfpq_index):
    from post_ocr_corretion_spark.operators.pq import ivfpq_topk
    from post_ocr_corretion_spark.operators.similarity import brute_force_topk as bft

    cents, cb = ivfpq_index
    q = clustered.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    out = ivfpq_topk(clustered, q, cents, cb, k=5, nprobe=2, cand=25).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    # emitted cos values are EXACT (re-rank recomputes them), so any row
    # that is also in brute force carries the identical rounded cosine
    bf = {(r.qid, r.vec_id): r.cos for r in bft(clustered, q, k=5).collect()}
    for r in out:
        if (r.qid, r.vec_id) in bf:
            assert r.cos == bf[(r.qid, r.vec_id)]


def test_opq_rotation_orthonormal_and_error_non_increasing(spark, clustered):
    """OPQ (Ge et al. 2013): the learned rotation is orthonormal and the
    rotated-space quantization error does not exceed plain PQ's on the
    correlated (clustered) fixture — alternating minimization can only
    improve on the R=I starting point."""
    import numpy as np

    from post_ocr_corretion_spark.operators.pq import (
        opq_fit,
        quantization_error,
        rotate_vectors,
    )

    cb_pq = pq_fit(clustered, m=M, ksub=KSUB, iters=2)
    err_pq = quantization_error(clustered, cb_pq)
    R, cb_opq = opq_fit(clustered, m=M, ksub=KSUB, opq_iters=2, pq_iters=2)
    Rm = np.array(R)
    assert np.allclose(Rm @ Rm.T, np.eye(D), atol=1e-8)
    err_opq = quantization_error(rotate_vectors(clustered, R, "v", "_xr"), cb_opq, "_xr")
    assert err_opq <= err_pq + 1e-9, (err_opq, err_pq)


def test_opq_recall_on_planted_clusters(spark, clustered):
    from post_ocr_corretion_spark.operators.pq import opq_adc_topk, opq_fit

    R, cb = opq_fit(clustered, m=M, ksub=KSUB, opq_iters=2, pq_iters=2)
    q = clustered.filter(F.col("vec_id").isin(0, 20, 40)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = {(r.qid, r.vec_id) for r in brute_force_topk(clustered, q, k=5).collect()}
    got = {
        (r.qid, r.vec_id)
        for r in opq_adc_topk(clustered, q, R, cb, k=5, cand=25).collect()
    }
    assert len(bf & got) / len(bf) >= 0.8
