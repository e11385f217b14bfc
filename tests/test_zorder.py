"""Z-order clustering (operators/zorder.py): key correctness against a
reference Python interleave, and the data-skipping measurement — on the
same row count and file count, range-partitioning by the Morton key
prunes MORE files for a 2-d box predicate than a linear sort on either
single column (the reason the layout exists at 100 TB)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.zorder import zorder_key, zorder_sql


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j + 1)
        z |= ((b >> j) & 1) << (2 * j)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(a, b) for a in [0, 1, 2, 3, 255, 1023, 65535] for b in [0, 1, 7, 512, 65535]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key([F.col("a"), F.col("b")]).alias("z")).collect()
    }
    assert got == {(a, b): _morton_py(a, b) for a, b in rows}


def test_zorder_sql_matches_spark(spark):
    """The oracle-side SQL expression is the same function (DuckDB)."""
    import duckdb

    rows = [(a, b) for a in [0, 5, 300, 40000] for b in [0, 9, 1024, 65535]]
    df = spark.createDataFrame(rows, "a long, b long")
    spark_z = sorted(
        (r.a, r.b, r.z)
        for r in df.select("a", "b", zorder_key([F.col("a"), F.col("b")]).alias("z")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_z = sorted(tuple(r) for r in con.execute(
        f"SELECT a, b, {zorder_sql(['a', 'b'])} FROM t"
    ).fetchall())
    assert spark_z == duck_z


def test_zorder_validation():
    with pytest.raises(ValueError, match="at least two"):
        zorder_key([F.col("a")])
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=22)


def test_zorder_layout_prunes_more_files_than_linear_sort(spark):
    """The measurement: 64×64 uniform grid of (a, b), 16 'files'
    (range partitions). For a small 2-d box predicate, count files whose
    per-file (min, max) rectangles intersect the box — the exact skip
    decision a parquet reader makes from footer stats. The Z-order
    layout must beat the linear-sort layout, whose files span the FULL
    range of the second dimension."""
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")

    def file_stats(layout_df):
        return (
            layout_df.withColumn("f", F.spark_partition_id())
            .groupBy("f")
            .agg(F.min("a").alias("amin"), F.max("a").alias("amax"),
                 F.min("b").alias("bmin"), F.max("b").alias("bmax"))
            .collect()
        )

    def touched(stats, box):
        alo, ahi, blo, bhi = box
        return sum(1 for r in stats if r.amax >= alo and r.amin <= ahi and r.bmax >= blo and r.bmin <= bhi)

    z = zorder_key([F.col("a"), F.col("b")], bits=6)
    z_stats = file_stats(df.repartitionByRange(16, z))
    lin_stats = file_stats(df.repartitionByRange(16, F.col("a"), F.col("b")))

    boxes = [(8, 15, 8, 15), (0, 7, 48, 55), (32, 39, 0, 7), (20, 27, 20, 27)]
    z_touch = sum(touched(z_stats, bx) for bx in boxes)
    lin_touch = sum(touched(lin_stats, bx) for bx in boxes)
    # linear sort: every box's b-range hits every file of the matching
    # a-slice AND each a-slice file spans all b → prunes only on a.
    # z-order: each file is a compact rectangle → prunes on both.
    assert z_touch < lin_touch, (z_touch, lin_touch)
    # and the z layout is loss-free: same rows, just clustered
    assert df.repartitionByRange(16, z).count() == 64 * 64


def test_zorder_three_columns_prunes_on_every_dimension(spark):
    """Multi-column demo (ROADMAP r6): 16³ grid, 16 'files'. A 3-d box
    predicate touches fewer files under the 3-col Morton layout than
    under a linear (a, b, c) sort, whose files span the full range of
    the trailing dimensions; and the key matches a reference Python
    interleave term-for-term."""
    rows = [(a, b, c) for a in range(16) for b in range(16) for c in range(16)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    z = zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=4)

    def morton3(a, b, c, bits=4):
        m = 0
        for j in range(bits):
            m |= ((a >> j) & 1) << (3 * j + 2)
            m |= ((b >> j) & 1) << (3 * j + 1)
            m |= ((c >> j) & 1) << (3 * j)
        return m

    got = {
        (r.a, r.b, r.c): r.z
        for r in df.select("a", "b", "c", z.alias("z")).limit(4096).collect()
    }
    assert got == {(a, b, c): morton3(a, b, c) for a, b, c in rows}

    def file_stats(layout_df):
        return (
            layout_df.withColumn("f", F.spark_partition_id())
            .groupBy("f")
            .agg(
                F.min("a").alias("amin"), F.max("a").alias("amax"),
                F.min("b").alias("bmin"), F.max("b").alias("bmax"),
                F.min("c").alias("cmin"), F.max("c").alias("cmax"),
            )
            .collect()
        )

    def touched(stats, box):
        alo, ahi, blo, bhi, clo, chi = box
        return sum(
            1
            for r in stats
            if r.amax >= alo and r.amin <= ahi
            and r.bmax >= blo and r.bmin <= bhi
            and r.cmax >= clo and r.cmin <= chi
        )

    z_stats = file_stats(df.repartitionByRange(16, z))
    lin_stats = file_stats(df.repartitionByRange(16, F.col("a"), F.col("b"), F.col("c")))
    boxes = [(0, 3, 0, 3, 0, 3), (8, 11, 8, 11, 8, 11), (4, 7, 12, 15, 0, 3)]
    z_touch = sum(touched(z_stats, bx) for bx in boxes)
    lin_touch = sum(touched(lin_stats, bx) for bx in boxes)
    assert z_touch < lin_touch, (z_touch, lin_touch)
