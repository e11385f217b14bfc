"""IVF-partitioned raw-vector store (operators/ivf_store.py): the
pruned search must be RESULT-IDENTICAL to the in-memory ivf_topk (same
centroids, same nprobe — probe semantics shared by construction), the
store must actually land one hive directory per list, and the executed
scan plan must carry list_id in its PartitionFilters (file-level
pruning, not a post-scan filter)."""
from __future__ import annotations

import os

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
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )


@pytest.fixture(scope="module")
def store(spark, emb, tmp_path_factory):
    from post_ocr_corretion_spark.operators.ivf_store import write_ivf_partitioned
    from post_ocr_corretion_spark.operators.similarity import kmeans_centroids

    cents = kmeans_centroids(emb, k=8, iters=5)
    path = str(tmp_path_factory.mktemp("ivf") / "store")
    write_ivf_partitioned(emb, cents, path)
    return path, cents


def test_store_layout_is_hive_partitioned(store):
    path, _ = store
    dirs = [d for d in os.listdir(path) if d.startswith("list_id=")]
    assert len(dirs) >= 4  # non-degenerate lists (same bar as test_ivf_recall)


def test_pruned_matches_in_memory_ivf(spark, emb, queries, store):
    from post_ocr_corretion_spark.operators.ivf_store import ivf_pruned_topk
    from post_ocr_corretion_spark.operators.similarity import ivf_topk

    path, cents = store
    got = sorted(
        (r.qid, r.rnk, r.vec_id, r.cos)
        for r in ivf_pruned_topk(spark, path, queries, cents, k=5, nprobe=3).collect()
    )
    want = sorted(
        (r.qid, r.rnk, r.vec_id, r.cos)
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
    )
    assert got == want and len(got) == 5 * queries.count()


def test_scan_plan_prunes_partitions(spark, queries, store):
    from post_ocr_corretion_spark.operators.ivf_store import (
        ivf_pruned_topk,
        pruned_scan_partition_filter,
    )

    path, cents = store
    ann = ivf_pruned_topk(spark, path, queries, cents, k=5, nprobe=2)
    pf = pruned_scan_partition_filter(ann)
    assert "list_id" in pf and " IN " in pf.upper()


def test_probe_lists_bounded_and_correct_width(spark, queries, store):
    from post_ocr_corretion_spark.operators.ivf_store import probe_lists

    _, cents = store
    rows = probe_lists(queries, cents, nprobe=3).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, set()).add(r.list_id)
    assert all(len(s) == 3 for s in per_q.values())
    assert all(0 <= lid < len(cents) for s in per_q.values() for lid in s)
