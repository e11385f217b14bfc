"""IVF-partitioned raw-vector store — FILE-level pruning for exact
re-rank (the ROADMAP r8 "residual re-rank ANN" item): the corpus is
written ONCE hive-partitioned by its IVF list id, and every query then
reads only its nprobe probed partitions' files — the same
nprobe/n_lists cost fraction ivfpq_topk gets for its ADC scan, but at
the STORAGE layer, for the exact-distance stage. At 100 TB this is the
difference between "re-rank touches the whole raw-vector table" and
"re-rank touches 4/64ths of its files": the probe filter is a literal
``list_id IN (...)`` predicate, so the scan's PartitionFilters prune
directories before a single row is read (asserted in
tests/test_ivf_store.py; the pruning measurement lives in PLANS.md).

Probe-list collection is a BOUNDED driver artifact: at most n_lists
integers (the same class as the k×d centroid matrix the IVF fit already
collects) — never vectors, never per-row data.

Search within the probed partitions is EXACT cosine over raw vectors —
the only approximation is probe selection, identical semantics to
operators/similarity.ivf_topk (recall band measured there); the two
share the centroid-scoring expression.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .similarity import _centroid_scores, dot, ivf_assign


def write_ivf_partitioned(
    emb: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "v",
    dim: int | None = None,
) -> None:
    """Assign each vector to its nearest-centroid IVF list and write the
    raw vectors hive-partitioned by ``list_id`` (one directory per
    list). Pay the assignment + shuffle once at build time; every
    subsequent probed read prunes at the directory level."""
    ivf_assign(emb, centroids, id_col, vec_col, unroll=dim is not None).write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(path)


def probe_lists(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    qvec_col: str = "qv",
    dim: int | None = None,
) -> DataFrame:
    """(qid, list_id) — each query's nprobe nearest IVF lists, the same
    centroid-argmax expression ivf_topk probes with."""
    qscores = _centroid_scores(F.col(qvec_col), centroids, unroll=dim is not None)
    ranked = F.transform(
        F.array_sort(
            F.transform(qscores, lambda s, i: F.struct((-s).alias("neg"), i.alias("list_id")))
        ),
        lambda x: x["list_id"],
    )
    # explode must be a top-level generator — cast in a second projection
    return queries.select(
        "qid", F.explode(F.slice(ranked, 1, nprobe)).alias("list_id")
    ).select("qid", F.col("list_id").cast("int").alias("list_id"))


def ivf_pruned_topk(
    spark: SparkSession,
    store_path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine over ONLY the probed partitions of an
    ``write_ivf_partitioned`` store. The union of probe lists (≤
    n_lists ints) becomes a literal IN-filter so the parquet scan's
    PartitionFilters prune at file level; the per-query (qid, list_id)
    probe frame then broadcast-joins each query to just its own lists'
    rows. Excludes self-matches (qid == vec_id) like ivf_topk.

    r9: norms hoisted below the probe join (the brute_force_topk /
    ivf_topk fix — inline ``cosine()`` re-ran both sqrt reductions per
    pair); same expression tree per value → bit-identical cos."""
    probes = probe_lists(queries, centroids, nprobe, dim=dim)
    probed_ids = sorted(
        r.list_id for r in probes.select("list_id").distinct().collect()
    )  # bounded: <= n_lists integers
    store = (
        spark.read.parquet(store_path)
        .filter(F.col("list_id").isin(probed_ids))
        .withColumn("_nv", F.sqrt(dot(F.col(vec_col), F.col(vec_col), dim)))
    )
    q = queries.join(F.broadcast(probes), "qid").withColumn(
        "_nq", F.sqrt(dot(F.col("qv"), F.col("qv"), dim))
    )
    scored = (
        q.join(store, "list_id")
        .filter(F.col("qid") != F.col(id_col))
        .select(
            "qid",
            id_col,
            F.round(
                dot(F.col("qv"), F.col(vec_col), dim) / (F.col("_nq") * F.col("_nv")), 4
            ).alias("cos"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def pruned_scan_partition_filter(df: DataFrame) -> str:
    """The first NON-EMPTY PartitionFilters line in the executed plan
    (empty string if every scan's is ``[]``) — the plan-lock hook: a
    pruned read MUST carry list_id in it. Unpartitioned side-scans
    (e.g. the query frame) legitimately report ``PartitionFilters: []``
    and are skipped."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line and "PartitionFilters: []" not in line:
            return line.strip()
    return ""
