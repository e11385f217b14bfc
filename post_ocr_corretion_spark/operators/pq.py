"""Product quantization (PQ) — the embedding-compression half of an
IVF-PQ ANN index (Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search"): split each d-dim vector into m subvectors, k-means
each subspace to ksub centroids, and store per vector only the m
centroid codes (m bytes vs 4d — a 32× shrink at d=64/m=8). Search runs
ADC (asymmetric distance computation): per query ONE m×ksub table of
subspace dot products, then every corpus candidate costs m table
lookups instead of a d-dim dot product. A final exact re-rank of the
top ADC candidates restores ranking quality (the standard PQ+re-rank
recipe).

Scale shape:
- the fit is Lloyd's per subspace but runs ALL subspaces in one scan
  per iteration (per-subspace argmin assignments computed in a single
  projection, then one groupBy over (subspace, cluster, dim)); only
  the m·ksub·(d/m) = ksub×d codebook stats reach the driver per
  iteration — a model artifact, never vectors (same bounded-collect
  rule as similarity.kmeans_centroids_distributed);
- encoding is pure Catalyst argmin over codebook literals — no
  shuffle, no Python;
- ADC tables are a projection on the QUERY side computed below the
  join, so per (query, candidate) work is m element_at lookups in
  whole-stage codegen; the exact re-rank touches only ``cand``
  candidates per query, not the corpus.

Like the IVF operator, exactness is defined by recall against
similarity.brute_force_topk — measured in tests and asserted in-plan
by the gated query's recall flag.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .similarity import cosine, dot

Codebooks = list[list[list[float]]]  # [m][ksub][d/m]


def _sub(vec_col: Column, s: int, sub_d: int) -> Column:
    return F.slice(vec_col, s * sub_d + 1, sub_d)


def _cb_lit(cb_s: list[list[float]]) -> Column:
    return F.array(*[F.array(*[F.lit(x) for x in c]) for c in cb_s])


def _argmin_code(vec_col: Column, cb_s: list[list[float]], s: int, sub_d: int) -> Column:
    # ONE transform lambda over the ksub codebook rows (not ksub separate
    # aggregate expressions): the lambda body is compiled once, keeping
    # the plan tree — and whole-stage codegen — small at large m·ksub
    sub = _sub(vec_col, s, sub_d)
    dists = F.transform(
        _cb_lit(cb_s),
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    vec_col: str = "v",
) -> Codebooks:
    """L2 Lloyd's per subspace, all subspaces in one scan per iteration.
    Init is the deterministic hash-ordered first ksub vectors' subvectors
    (the similarity.py idiom; orderBy+limit plans as TakeOrdered — top-k
    per partition, never a global sort). Empty clusters keep their
    previous centroid. Returns codebooks[m][ksub][d/m].

    Each iteration is one full pass over ``emb`` — persist/cache the
    input DataFrame before a multi-iteration fit on a large corpus so
    the scan (and any upstream normalization) is paid once."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("pq_fit: empty input")
    d = len(first[0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    init = emb.orderBy(F.xxhash64(F.col(vec_col).cast("string"))).limit(ksub).collect()
    if len(init) < ksub:
        raise ValueError(f"pq_fit: need >= ksub={ksub} vectors, got {len(init)}")
    cb: Codebooks = [
        [[float(x) for x in r[vec_col][s * sub_d : (s + 1) * sub_d]] for r in init]
        for s in range(m)
    ]
    for _ in range(iters):
        assigns = F.array(*[_argmin_code(F.col(vec_col), cb[s], s, sub_d) for s in range(m)])
        stats = (
            emb.select(assigns.alias("_a"), F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .select(
                (F.col("pos") / sub_d).cast("int").alias("s"),
                F.element_at("_a", (F.col("pos") / sub_d).cast("int") + 1).alias("cl"),
                (F.col("pos") % sub_d).alias("sp"),
                "x",
            )
            .groupBy("s", "cl", "sp")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: m * ksub * sub_d = ksub × d stats
        )
        acc: dict[tuple[int, int], dict[int, tuple[float, int]]] = {}
        for r in stats:
            acc.setdefault((r.s, r.cl), {})[r.sp] = (r.sx, r.n)
        for s in range(m):
            for j in range(ksub):
                dims = acc.get((s, j))
                if dims:
                    cb[s][j] = [dims[p][0] / dims[p][1] for p in sorted(dims)]
    return cb


def pq_encode(
    emb: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id_col, codes array<int>): each vector's m nearest-subcentroid
    codes — the compressed representation (m small ints per vector)."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    codes = F.array(
        *[_argmin_code(F.col(vec_col), codebooks[s], s, sub_d) for s in range(m)]
    )
    return emb.select(id_col, codes.alias("codes"))


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebooks: Codebooks,
    k: int = 5,
    cand: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """PQ search with exact re-rank: ADC over the coded corpus selects
    ``cand`` candidates per query (m table lookups per pair), then only
    those re-score with the exact cosine. Returns (qid, rnk, id, cos)
    for rnk <= k ordered by (cos desc, id) — directly comparable to
    brute_force_topk rows wherever recall holds."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    codes = pq_encode(emb, codebooks, id_col, vec_col)
    def _table(s: int) -> Column:
        # single-param lambda only: a second (defaulted) parameter would
        # flip pyspark's arity check into (element, index) mode. The HOF
        # lambda is invoked eagerly, so closing over s is safe.
        return F.transform(
            _cb_lit(codebooks[s]), lambda c: dot(_sub(F.col("qv"), s, sub_d), c)
        )

    tables = F.array(*[_table(s) for s in range(m)])
    q = queries.select("qid", "qv", tables.alias("_t"))
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_t"), s.cast("int") + 1),
            F.element_at(F.col("codes"), s.cast("int") + 1) + 1,
        ),
    )
    w_adc = W.partitionBy("qid").orderBy(F.col("_adc").desc(), F.col(id_col).asc())
    candidates = (
        q.crossJoin(codes)
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", "qv", id_col, adc.alias("_adc"))
        .withColumn("_crk", F.row_number().over(w_adc))
        .filter(F.col("_crk") <= cand)
        .drop("_adc", "_crk")
    )
    rescored = candidates.join(emb, id_col).select(
        "qid", id_col, F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return rescored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + PQ on residuals — the full faiss-style index
# (probe a few lists, ADC only within them, exact re-rank at the end).
# ---------------------------------------------------------------------------


def _assign_and_residual(
    emb: DataFrame, centroids: list[list[float]], keep: list[str], vec_col: str
) -> DataFrame:
    """``keep`` columns + (list_id, r): nearest coarse centroid by
    cosine (the similarity.py assignment rule) and the residual
    v − c_list — one pure-Catalyst projection, no shuffle."""
    from .similarity import _centroid_scores

    cents_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    scores = _centroid_scores(F.col(vec_col), centroids)
    best = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    resid = F.zip_with(
        F.col(vec_col),
        F.element_at(cents_lit, F.col("list_id") + 1),
        lambda x, c: x - c,
    )
    return emb.select(*keep, best.alias("list_id")).withColumn("r", resid)


def ivfpq_fit(
    emb: DataFrame,
    n_lists: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    coarse_iters: int = 5,
    vec_col: str = "v",
) -> tuple[list[list[float]], Codebooks]:
    """(coarse centroids, residual codebooks): the coarse quantizer is
    similarity.kmeans_centroids_distributed (only k×d stats to the
    driver per iteration); the PQ codebooks fit the RESIDUALS v − c_list
    (Jégou et al. §III: residual energy is what PQ must encode once the
    list id is known). Both stages keep the bounded-driver-artifact
    rule; vectors never leave the executors."""
    from .similarity import kmeans_centroids_distributed

    cents = kmeans_centroids_distributed(emb, k=n_lists, iters=coarse_iters, vec_col=vec_col)
    resid = _assign_and_residual(emb, cents, [vec_col], vec_col).select("r")
    cb = pq_fit(resid, m=m, ksub=ksub, iters=iters, vec_col="r")
    return cents, cb


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: Codebooks,
    k: int = 5,
    nprobe: int = 3,
    cand: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """IVF-PQ search: probe the nprobe nearest lists per query and score
    ONLY their members by ADC, exploiting q·v = q·c_list + q·r_v — the
    q·c_list term is one dot per PROBE row (not per candidate) and
    q·r_v is m residual-codeword lookups from the per-probe tables. The
    ``cand`` best candidates then re-rank with the exact cosine.
    Scans ~nprobe/n_lists of the corpus; full vectors are read only by
    the re-rank join — candidate scoring touches the m-int codes.
    Returns (qid, rnk, id, cos) like brute_force_topk."""
    from .similarity import _centroid_scores, cosine

    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    coded = _assign_and_residual(emb, centroids, [id_col, vec_col], vec_col)
    codes = F.array(*[_argmin_code(F.col("r"), codebooks[s], s, sub_d) for s in range(m)])
    corpus = coded.select(id_col, "list_id", codes.alias("codes"))
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    qscores = _centroid_scores(F.col("qv"), centroids)
    probes = queries.select(
        "qid",
        "qv",
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.transform(
                            qscores,
                            lambda sc, i: F.struct((-sc).alias("neg"), i.alias("list_id")),
                        )
                    ),
                    lambda x: x["list_id"],
                ),
                1,
                nprobe,
            )
        ).alias("list_id"),
    )

    def _table(s: int) -> Column:
        # single-param lambda (see pq_adc_topk note on the arity trap)
        return F.transform(
            _cb_lit(codebooks[s]), lambda c: dot(_sub(F.col("qv"), s, sub_d), c)
        )

    probes = probes.withColumn(
        "_qc", dot(F.col("qv"), F.element_at(cents_lit, F.col("list_id") + 1))
    ).withColumn("_t", F.array(*[_table(s) for s in range(m)]))
    adc = F.col("_qc") + F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_t"), s.cast("int") + 1),
            F.element_at(F.col("codes"), s.cast("int") + 1) + 1,
        ),
    )
    w_adc = W.partitionBy("qid").orderBy(F.col("_adc").desc(), F.col(id_col).asc())
    candidates = (
        probes.join(corpus, "list_id")
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", "qv", id_col, adc.alias("_adc"))
        .withColumn("_crk", F.row_number().over(w_adc))
        .filter(F.col("_crk") <= cand)
        .drop("_adc", "_crk")
    )
    rescored = candidates.join(emb, id_col).select(
        "qid", id_col, F.round(cosine(F.col("qv"), F.col(vec_col)), 4).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return rescored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
