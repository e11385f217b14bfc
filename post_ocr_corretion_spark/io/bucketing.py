"""Bucketed table layout — shuffle-free co-located joins.

The 100 TB story for repeated equi-joins on the same key (url joins
against per-url metadata, lexicon joins on delkey, …) is to pay the
shuffle ONCE at write time: both sides land as bucketed tables
(`bucketBy(n, key)` + `sortBy(key)`), and every subsequent join on that
key plans as a SortMergeJoin over the co-located bucket files with NO
Exchange on either side — the join cost becomes a per-bucket streamed
merge, and re-running the pipeline never re-shuffles the big table.
This is the "co-locate joins via bucketing" lever of the round brief;
tests/test_bucketing.py asserts the exchange-free plan and result
equality with the shuffled join.

Bucketing rides the session catalog (`saveAsTable` — Spark's bucketing
metadata lives in the metastore, not in parquet footers), so callers
pass a table name; an explicit ``path`` keeps the data in a caller-owned
location (external table).

Sizing at scale: pick ``buckets`` so one bucket of the LARGER side fits
an executor's memory slice (e.g. 100 TB / 4096 buckets ≈ 25 GB per
bucket pre-compression — go wider); both sides must use the SAME bucket
count and key for the exchange-free plan, and `spark.sql.sources.
bucketing.enabled` (default true) must stay on.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
    sorted_by_key: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and by default per-bucket sorted)
    parquet table. Sorting by the bucket key lets the join skip its sort
    stage too (files are merge-ready)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sorted_by_key:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same key and bucket count — plans shuffle-free (no Exchange on
    either side; asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
