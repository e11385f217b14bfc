"""pagerank_exact (operators/graph.py): hand-computed integer rounds on
a tiny graph; the cross-engine hash-exactness runs in test_entry_queries
(`pagerank` vs the unrolled-CTE oracle)."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.operators.graph import SCALE, pagerank_exact

EDGES = [(1, 2), (2, 1), (1, 3)]


def test_one_round_by_hand(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_exact(edges, iters=1).collect()}
    base = SCALE // 3                     # 333333333333
    teleport = (15 * base) // 100         # 49999999999
    share1 = base // 2                    # node 1 has outdeg 2
    share2 = base // 1
    want = {
        1: teleport + (85 * share2) // 100,
        2: teleport + (85 * share1) // 100,
        3: teleport + (85 * share1) // 100,
    }
    assert got == want


def test_zero_rounds_and_mass_decay(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    r0 = {r.node: r.rank for r in pagerank_exact(edges, iters=0).collect()}
    assert set(r0.values()) == {SCALE // 3}
    # node 3 is dangling: its share vanishes each round (pinned contract),
    # so total mass strictly decreases but every rank stays positive
    r3 = {r.node: r.rank for r in pagerank_exact(edges, iters=3).collect()}
    assert sum(r3.values()) < sum(r0.values())
    assert all(v > 0 for v in r3.values())
    with pytest.raises(ValueError, match="iters"):
        pagerank_exact(edges, iters=-1)


def test_determinism_across_partitionings(spark):
    edges = spark.createDataFrame(EDGES * 1, "src long, dst long")
    a = sorted((r.node, r.rank) for r in pagerank_exact(edges.repartition(7), iters=2).collect())
    b = sorted((r.node, r.rank) for r in pagerank_exact(edges.coalesce(1), iters=2).collect())
    assert a == b  # integer arithmetic: no partition-order ULP drift
