"""Connected-components dedup: transitive chains collapse to one cluster
(min-label propagation), convergence on long paths, singleton handling."""
from __future__ import annotations


def test_transitive_chain_collapses(spark):
    from post_ocr_corretion_spark.operators.dedup import dedup_keep_list, duplicate_clusters

    # chain 1-2, 2-3, 3-4 plus pair 10-11 plus singleton 20
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long")
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id long")
    comp = {r.doc_id: r.comp for r in duplicate_clusters(pairs, ids).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}
    keep = {
        r.comp: (r.keep_doc, r.cluster_size)
        for r in dedup_keep_list(duplicate_clusters(pairs, ids)).collect()
    }
    assert keep == {1: (1, 4), 10: (10, 2), 20: (20, 1)}


def test_long_path_converges(spark):
    from post_ocr_corretion_spark.operators.dedup import duplicate_clusters

    # a 30-node path: diameter 29 > default per-round hop of 1 — the
    # early-exit loop must still converge to one component
    pairs = spark.createDataFrame([(i, i + 1) for i in range(29)], "a long, b long")
    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    comp = {r.doc_id: r.comp for r in duplicate_clusters(pairs, ids, max_iters=40).collect()}
    assert set(comp.values()) == {0}
