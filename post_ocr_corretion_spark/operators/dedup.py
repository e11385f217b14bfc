"""Deduplication operators for training-data pipelines (round-1 brief):
exact, char-shingle Jaccard, MinHash+LSH, SimHash — all pure Catalyst, all
with DuckDB-oracle-compatible determinism (md5-based hashing, so the SQL
oracle reproduces every signature bit-for-bit).

Scale notes: shingle self-joins are quadratic in bucket size — MinHash
banding bounds the candidate pairs (band key join is an equi-join AQE can
skew-split); exact dedup is a single hash aggregate.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_text


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: (h, cnt, keep_doc) — keep_doc is the
    smallest id of each duplicate group (the canonical representative)."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_doc")
    )


def char_shingles(docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct char k-gram shingles per doc: (doc_id, sh)."""
    return (
        docs.filter(F.length(text_col) >= k)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.greatest(F.length(text_col) - k, F.lit(0)))).alias("i"),
            F.col(text_col),
        )
        .select(id_col, F.substring(F.col(text_col), F.col("i") + 1, k).alias("sh"))
        .distinct()
    )


def jaccard_pairs(shingles: DataFrame, threshold: float = 0.5, id_col: str = "doc_id") -> DataFrame:
    """n-gram Jaccard near-dup: (da, db, jaccard) for pairs ≥ threshold."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh"))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("da"), F.col(f"b.{id_col}").alias("db"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("da"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("db"), F.col("nsh").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "da").join(sb, "db")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= threshold)
        .select("da", "db", F.round("jac", 6).alias("jaccard"))
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = 4, id_col: str = "doc_id") -> DataFrame:
    """MinHash via salted md5 minima — deterministic and SQL-reproducible.
    Columns: doc_id, m1..m<n>."""
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"s{j}")))).alias(f"m{j}")
        for j in range(1, n_hashes + 1)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, bands: int = 2, rows_per_band: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Band the signature (b bands × r rows), bucket-join per band →
    distinct candidate pairs (da, db)."""
    band_dfs = []
    for b in range(bands):
        cols = [F.col(f"m{b * rows_per_band + r + 1}") for r in range(rows_per_band)]
        band_dfs.append(sig.select(id_col, F.concat(*cols).alias("band")))
    banded = band_dfs[0]
    for d in band_dfs[1:]:
        banded = banded.union(d)
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
        .select(F.col(f"x.{id_col}").alias("da"), F.col(f"y.{id_col}").alias("db"))
        .distinct()
    )


def simhash_signatures(docs: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash over distinct words; bit b = parity of the b-th md5 hex
    char (deterministic across engines). Columns: doc_id, simhash."""
    words = (
        docs.select(id_col, F.explode(F.split(clean_text(F.col(text_col)), " ", -1)).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    per_bit = words.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"), "w"
    ).withColumn(
        "v", F.when(F.ascii(F.substring(F.md5(F.col("w")), F.col("b") + 1, 1)) % 2 == 1, 1).otherwise(-1)
    )
    sums = per_bit.groupBy(id_col, "b").agg(F.sum("v").alias("s"))
    return (
        sums.withColumn("bit", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")))
        .groupBy(id_col)
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("b", "bit")))["bit"]).alias("simhash"))
    )


def duplicate_clusters(
    pairs: DataFrame, ids: DataFrame, id_col: str = "doc_id", max_iters: int = 20
) -> DataFrame:
    """Connected components over the near-dup pair graph → (doc_id, comp)
    where comp = the smallest reachable id (the canonical representative).
    Training-data dedup keeps ONE doc per component, not one per pair —
    transitive duplicates (a~b, b~c) must collapse together.

    Distributed min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels (one join + one
    groupBy per round); converges in O(component diameter) rounds, loop
    exits early via an aggregated change count. Deterministic (min is
    order-independent). ``pairs`` needs columns (a, b); ``ids`` the node
    set. Scale note: near-dup graphs are overwhelmingly short-diameter
    (duplicate families), so diameter-bounded propagation is the right
    default; for adversarial long chains the alternating
    large-star/small-star contraction (Kiveris et al.) drops the round
    count to O(log n) with the same per-round join shape."""
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = ids.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp"))
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("changed"),
            )
        ).localCheckpoint(eager=True)  # truncate the iterative lineage
        n_changed = new.agg(F.sum(F.col("changed").cast("int"))).collect()[0][0] or 0
        labels = new.drop("changed")
        if n_changed == 0:
            break
    else:
        # exhausting max_iters without convergence would silently split
        # components (labels stuck at intermediate minima) — refuse
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters or "
            "use duplicate_clusters_star (O(log n) rounds)"
        )
    return labels.select(F.col("id").alias(id_col), "comp")


def dedup_keep_list(clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(comp, keep_doc, cluster_size): one canonical doc per component."""
    return clusters.groupBy("comp").agg(
        F.min(id_col).alias("keep_doc"), F.count(F.lit(1)).alias("cluster_size")
    )


def _neighborhood_min_edges(edges: DataFrame, keep_larger: bool) -> DataFrame:
    """One star round: per node u, m = min(Γ(u) ∪ {u}); large-star emits
    (v, m) for the strictly larger neighbors, small-star emits (v, m)
    for the smaller-or-equal neighbors PLUS the (u, m) self-link — the
    self-link is what keeps u attached when all its neighbors are larger
    (Kiveris et al., Alg. 2)."""
    nbrs = edges.select(F.col("u"), F.col("v")).union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    j = nbrs.join(m, "u")
    cond = F.col("v") > F.col("u") if keep_larger else F.col("v") <= F.col("u")
    out = j.filter(cond).select(F.col("v").alias("u"), F.col("m").alias("v"))
    if not keep_larger:
        out = out.union(m.select(F.col("u"), F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def duplicate_clusters_star(
    pairs: DataFrame, ids: DataFrame, id_col: str = "doc_id", max_iters: int = 12
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log n) rounds instead of O(diameter), same per-round
    join+groupBy shape as the propagation variant; the right choice when
    adversarially long duplicate chains are possible at corpus scale.
    Returns (doc_id, comp) with comp = component minimum; equality with
    ``duplicate_clusters`` is property-tested on random graphs."""
    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        ls = _neighborhood_min_edges(edges, keep_larger=True)
        ss = _neighborhood_min_edges(ls, keep_larger=False).localCheckpoint(eager=True)
        # fixpoint: the edge SET is stable (order-insensitive compare)
        if (
            ss.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(ss).limit(1).count() == 0
        ):
            edges = ss
            break
        edges = ss
    # at the fixpoint every non-root node has an edge to its component
    # minimum; roots (the minima) and singletons label themselves
    root_of = edges.select(F.col("u").alias("id"), F.col("v").alias("comp")).groupBy("id").agg(
        F.min("comp").alias("comp")
    )
    return (
        ids.select(F.col(id_col).alias("id"))
        .join(root_of, "id", "left")
        .select(F.col("id").alias(id_col), F.coalesce("comp", F.col("id")).alias("comp"))
    )
