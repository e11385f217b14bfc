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


def test_star_contraction_equals_propagation(spark):
    """The O(log n) large-star/small-star contraction labels every node
    with the same component minimum as min-label propagation — checked on
    assorted seeded random graphs plus the pathological long path."""
    import random

    from post_ocr_corretion_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    cases = []
    for seed, n, m in [(1, 20, 10), (2, 30, 25), (3, 40, 60), (4, 15, 0)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b]
        cases.append((n, pairs))
    cases.append((30, [(i, i + 1) for i in range(29)]))  # long path

    for n, pairs in cases:
        ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pdf = spark.createDataFrame(pairs or [(0, 0)], "a long, b long")
        if not pairs:
            pdf = pdf.filter("a != b")  # empty edge set
        prop = {r.doc_id: r.comp for r in duplicate_clusters(pdf, ids, max_iters=40).collect()}
        star = {r.doc_id: r.comp for r in duplicate_clusters_star(pdf, ids).collect()}
        assert prop == star, (n, len(pairs))


def test_unconverged_propagation_raises(spark):
    """Exhausting max_iters below the component diameter must raise, not
    silently return split components."""
    import pytest as _pytest

    from post_ocr_corretion_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)], "a long, b long")
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, ids, max_iters=3)


def test_dedup_canonical_quality_argmax_and_ties(spark):
    """Canonical = argmax (quality desc, id asc) per component: a longer
    doc beats a lower id; equal quality breaks on id."""
    from pyspark.sql import functions as F

    from post_ocr_corretion_spark.operators.dedup import dedup_canonical, duplicate_clusters

    docs = spark.createDataFrame(
        [(1, "aa"), (2, "aaaa"), (3, "aaaa"), (10, "x"), (11, "x")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    out = {
        r.comp: (r.keep_doc, r.quality, r.cluster_size)
        for r in dedup_canonical(
            duplicate_clusters(pairs, docs.select("doc_id")), docs
        ).collect()
    }
    assert out[1] == (2, 4, 3)    # longest wins over lowest id; tie (2 vs 3) → lower id
    assert out[10] == (10, 1, 2)  # equal quality → lower id


def test_dedup_canonical_left_join_keeps_uncovered_members(spark):
    """ADVICE r5 (low): `docs` must cover every clustered id, and a
    coverage gap must NOT silently shrink cluster_size or drop a whole
    component. The join is LEFT from clusters: uncovered members count
    toward cluster_size with NULL quality (never canonical while a
    covered member exists); a fully-uncovered component survives with
    the lowest id as its (null-quality) canonical."""
    from post_ocr_corretion_spark.operators.dedup import dedup_canonical

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (20, 20), (21, 20)], "doc_id long, comp long"
    )
    docs = spark.createDataFrame([(1, "aa"), (3, "a")], "doc_id long, text string")
    out = {
        r.comp: (r.keep_doc, r.quality, r.cluster_size)
        for r in dedup_canonical(clusters, docs).collect()
    }
    # doc 2 uncovered: still counted (size 3), never chosen over covered 1/3
    assert out[1] == (1, 2, 3)
    # component {20,21} fully uncovered: NOT dropped; lowest id, null quality
    assert out[20] == (20, None, 2)


def test_dedup_pipeline_keep_composes_end_to_end(spark):
    """The composed chain (shingles → MinHash → LSH pairs → components →
    quality argmax → kept table): near-identical docs collapse to ONE
    kept row — the longest member — while unrelated docs survive as
    singletons with cluster_size 1 and all doc columns intact."""
    from post_ocr_corretion_spark.operators.dedup import dedup_pipeline_keep

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, base + " extended", "en"),          # near-dup of 1, longer → kept
            (3, base[:-1] + "!", "en"),             # near-dup of 1
            (50, "completely different content about spark shuffles", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in dedup_pipeline_keep(docs).collect()}
    assert set(out) == {2, 50}
    assert out[2].cluster_size == 3 and out[2].lang == "en"
    assert out[50].cluster_size == 1
    assert out[2].text == base + " extended"  # full doc row survives the chain
