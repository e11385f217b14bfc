"""LOPQ (operators/lopq.py): per-list rotations are orthonormal, the
local fit never measures worse than its IVF-PQ starting point, recall
holds on the planted-cluster corpus, and the search contract matches
the ivfpq one (full top-k, exact re-ranked cosines)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.lopq import (
    lopq_encode,
    lopq_fit,
    lopq_quantization_error,
    lopq_topk,
)
from post_ocr_corretion_spark.operators.similarity import brute_force_topk

D, M, KSUB, NL = 16, 4, 8, 4


@pytest.fixture(scope="module")
def clustered(spark):
    rs = np.random.RandomState(11)
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
def lopq_index(clustered):
    return lopq_fit(
        clustered, n_lists=NL, m=M, ksub=KSUB, opq_iters=2, pq_iters=2, coarse_iters=4
    )


def test_rotations_orthonormal_per_list(lopq_index):
    cents, Rs, cbs = lopq_index
    assert len(Rs) == NL and len(cbs) == NL
    for R in Rs:
        Rm = np.array(R)
        assert np.allclose(Rm @ Rm.T, np.eye(D), atol=1e-8)
    for cb in cbs:
        assert len(cb) == M and all(len(cb_s) == KSUB for cb_s in cb)


def test_error_not_worse_than_ivfpq_start(spark, clustered, lopq_index):
    """The alternation starts at R=I with the GLOBAL residual codebooks
    (exactly the IVF-PQ fit), and both alternation steps are
    error-non-increasing — so LOPQ's residual reconstruction error must
    not exceed the plain IVF-PQ fit's with the same coarse lists."""
    from post_ocr_corretion_spark.operators.lopq import _lists_df

    cents, Rs, cbs = lopq_index
    err_lopq = lopq_quantization_error(clustered, cents, Rs, cbs)
    eye = [[1.0 if i == j else 0.0 for j in range(D)] for i in range(D)]
    from post_ocr_corretion_spark.operators.pq import ivfpq_fit

    cents0, cb0 = ivfpq_fit(
        clustered, n_lists=NL, m=M, ksub=KSUB, iters=2, coarse_iters=4
    )
    err_ivfpq = lopq_quantization_error(
        clustered, cents0, [eye] * NL, [cb0] * NL
    )
    assert err_lopq <= err_ivfpq + 1e-9, (err_lopq, err_ivfpq)


def test_lopq_recall_on_planted_clusters(spark, clustered, lopq_index):
    cents, Rs, cbs = lopq_index
    q = clustered.filter(F.col("vec_id").isin(0, 20, 40)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = {(r.qid, r.vec_id) for r in brute_force_topk(clustered, q, k=5).collect()}
    got = {
        (r.qid, r.vec_id)
        for r in lopq_topk(clustered, q, cents, Rs, cbs, k=5, nprobe=2, cand=25).collect()
    }
    assert len(bf & got) / len(bf) >= 0.8


def test_full_topk_exact_cos_and_precomputed_index(spark, clustered, lopq_index):
    from post_ocr_corretion_spark.operators.similarity import brute_force_topk as bft

    cents, Rs, cbs = lopq_index
    q = clustered.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    idx = lopq_encode(clustered, cents, Rs, cbs)
    out = lopq_topk(
        clustered, q, cents, Rs, cbs, k=5, nprobe=2, cand=25, index=idx
    ).collect()
    inline = lopq_topk(clustered, q, cents, Rs, cbs, k=5, nprobe=2, cand=25).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, inline))
    per_q = {}
    for r in out:
        per_q.setdefault(r.qid, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    bf = {(r.qid, r.vec_id): r.cos for r in bft(clustered, q, k=5).collect()}
    for r in out:
        if (r.qid, r.vec_id) in bf:
            assert r.cos == bf[(r.qid, r.vec_id)]


def test_encode_bounds(spark, clustered, lopq_index):
    cents, Rs, cbs = lopq_index
    rows = lopq_encode(clustered, cents, Rs, cbs).collect()
    assert len(rows) == 160
    for r in rows:
        assert 0 <= r.list_id < NL
        assert len(r.codes) == M and all(0 <= c < KSUB for c in r.codes)
