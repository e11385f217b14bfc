"""Count-min sketch (Cormode & Muthukrishnan 2005) — sublinear frequency
estimation for heavy-hitter mining over unbounded key domains (the
"what are the hot hosts / hot tokens" question at 100 TB, where an
exact per-key groupBy's state is the full key domain but the sketch is
a fixed depth×width counter grid).

Distributed shape: building the sketch is ONE hash aggregate over
(row, bucket) cells — each occurrence contributes depth cells, partial
counts combine map-side, and the finished sketch is depth×width rows
regardless of input size (mergeable: sketches of shards sum cell-wise).
Estimation broadcasts the sketch (d×w rows) and probes it with d
equi-join lookups per key, taking the min — always >= the true count
(cells only ever over-count), which the gate asserts row-by-row.

Determinism contract: the d hash functions are md5-derived
(md5("seed:row#key"), first 16 hex as unsigned 64-bit mod width) — the
repo's standard replayable idiom, so DuckDB reproduces every cell and
every estimate bit-for-bit; there is no RNG and no engine-specific
hash anywhere.

Relation to the gated `cms_counts` query: that one exercises Spark's
BUILT-IN `count_min_sketch` aggregate (one opaque JVM sketch blob,
estimates decoded driver-side) — the right call when a single bounded
key list needs estimates on the driver. THIS module is the scale form:
the grid is a DataFrame (shardable, mergeable, persistable), estimates
compute IN-PLAN against arbitrarily large key sets via a broadcast
join, and every number replays in an external engine.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(seed: str, row: F.Column, key: F.Column, width: int) -> F.Column:
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), row.cast("string"), F.lit("#"), key))
    return F.pmod(
        F.conv(F.substring(h, 1, 16), 16, 10).cast("decimal(38,0)"), F.lit(width)
    ).cast("int")


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms",
) -> DataFrame:
    """(row, bucket, cnt): the depth×width counter grid over every
    occurrence (not distinct key) in ``items``.

    r9 shape: per-key occurrence counts FIRST (one map-side-partial
    aggregate over the raw stream — no hashing), then the d md5 buckets
    once per DISTINCT key, then cell sums. A cell's count is
    Σ_keys count(key)·[h_row(key)=bucket], so the grid is identical to
    hashing every occurrence — but the md5+decimal-pmod work drops from
    per-occurrence to per-distinct-key (key-domain-bounded), and the
    heavy first exchange carries per-task key counts instead of
    per-occurrence bucket rows (guide §2.3 "aggregate before you
    shuffle")."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    counts = items.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    rows = counts.select(
        "_k", "_c", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("_row")
    )
    return (
        rows.select(
            "_c", "_row", _bucket(seed, F.col("_row"), F.col("_k"), width).alias("_bucket")
        )
        .groupBy(F.col("_row").alias("row"), F.col("_bucket").alias("bucket"))
        .agg(F.sum("_c").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms",
) -> DataFrame:
    """``keys`` columns + c_est: the CMS point estimate min over the d
    probed cells. The sketch side broadcasts (d×w rows); keys may be
    arbitrarily large. A key whose probe hits an untouched cell (absent
    from the sparse sketch) estimates 0 through the left join."""
    probes = keys.withColumn(
        "_row", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn("_bucket", _bucket(seed, F.col("_row"), F.col(key_col), width))
    return (
        probes.join(
            F.broadcast(sketch),
            (F.col("_row") == F.col("row")) & (F.col("_bucket") == F.col("bucket")),
            "left",
        )
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("c_est"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    key_col: str,
    candidates: DataFrame,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms",
) -> DataFrame:
    """Estimate every candidate key's frequency from the sketch:
    candidates' columns + c_est. At scale the candidate set comes from
    per-shard local top-k (bounded), never a global distinct."""
    sketch = cms_build(items, key_col, depth, width, seed)
    return cms_estimate(sketch, candidates, key_col, depth, width, seed)
