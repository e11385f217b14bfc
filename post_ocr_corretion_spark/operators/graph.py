"""Iterative graph algorithm with an EXACT cross-engine contract:
PageRank in integer micro-units.

Float PageRank is the textbook "iterative algorithms aren't
SQL-oracle-able" case — per-iteration double sums differ in ULPs with
partition order, so no hash-exact oracle exists. This operator pins the
arithmetic to BIGINT micro-units (SCALE = 10^12) with floor division:

    r0(v)   = SCALE div N
    share(u)= r(u) div outdeg(u)              (u with outdeg > 0)
    r'(v)   = (15 · (SCALE div N)) div 100
            + (85 · Σ share(u), u→v) div 100   (damping 0.85)

Every operation is exact integer math with identical semantics in Spark
(`div`) and DuckDB (`//`) — all values non-negative, so floor ==
truncate in both — making each iteration bit-reproducible anywhere.
Dangling-node mass simply decays (pinned, documented contract; classic
PageRank redistributes it — that variant adds one scalar per iteration
and stays integer-exact too).

Plan shape per iteration: edges join ranks on src (one shuffle on the
edge key) + groupBy dst (second shuffle) — the standard message-passing
round; the driver loop holds only the iteration counter, and
``localCheckpoint`` every few rounds truncates lineage on deep runs
(SURVEY §4.2's fixpoint discipline). The connected-components operator
(operators/dedup.py) covers convergence-by-count loops; this one covers
fixed-round numeric iteration.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank micro-units
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_exact(edges: DataFrame, iters: int = 3, checkpoint_every: int = 8) -> DataFrame:
    """edges(src long, dst long) → (node, rank BIGINT micro-units) after
    ``iters`` exact integer PageRank rounds. Duplicate edges contribute
    multiply (pass a distinct frame for simple-graph semantics)."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    # r9: materialize the edge list once — every message-passing round
    # (and the node/outdegree frames) references ``edges``, and without
    # the checkpoint each reference re-executed the caller's whole
    # edge-derivation chain (events scan + distinct) inside every round's
    # plan (guide §5: cache on reuse). Exact integer arithmetic —
    # bit-identical ranks.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # scalar driver value — the graph's node count
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = SCALE // n
    teleport = (15 * base) // DAMP_DEN
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = nodes.withColumn("rank", F.lit(base).cast("long"))
    for i in range(iters):
        shares = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank div d").alias("share"))
        )
        inflow = shares.groupBy("dst").agg(F.sum("share").alias("inflow"))
        ranks = (
            nodes.join(inflow.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0)) div {DAMP_DEN}")
                ).cast("long").alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)  # truncate lineage on deep runs
    return ranks
