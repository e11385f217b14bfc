"""Count-min sketch (operators/sketch.py): never-undercount guarantee,
collision-free exactness, md5 cell replication, mergeability."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from post_ocr_corretion_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _bucket(seed: str, row: int, key: str, width: int) -> int:
    h = hashlib.md5(f"{seed}:{row}#{key}".encode()).hexdigest()
    return int(h[:16], 16) % width


def _items(spark, freqs: dict[str, int]):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_estimate_never_undercounts(spark):
    freqs = {f"w{i}": (i % 7) + 1 for i in range(200)}
    items = _items(spark, freqs)
    keys = spark.createDataFrame([(k,) for k in freqs], "k string")
    # width 32 forces collisions at 200 keys
    est = {r.k: r.c_est for r in cms_heavy_hitters(items, "k", keys, depth=3, width=32).collect()}
    assert len(est) == 200
    assert all(est[k] >= n for k, n in freqs.items())
    assert any(est[k] > n for k, n in freqs.items())  # collisions DID overcount


def test_exact_when_collision_free(spark):
    freqs = {"a": 5, "b": 3, "c": 1}
    items = _items(spark, freqs)
    keys = spark.createDataFrame([(k,) for k in freqs], "k string")
    est = {r.k: r.c_est for r in cms_estimate(
        cms_build(items, "k", depth=4, width=4096), keys, "k", depth=4, width=4096
    ).collect()}
    assert est == freqs  # 3 keys in 4096 buckets: no collision in any row


def test_cells_replicate_md5(spark):
    items = _items(spark, {"hello": 4})
    cells = {(r.row, r.bucket): r.cnt for r in cms_build(
        items, "k", depth=2, width=64, seed="s"
    ).collect()}
    for row in range(2):
        assert cells[(row, _bucket("s", row, "hello", 64))] == 4
    assert sum(cells.values()) == 8  # 4 occurrences x 2 rows


def test_unseen_key_estimates_zero_or_collision(spark):
    items = _items(spark, {"a": 5})
    keys = spark.createDataFrame([("zzz",)], "k string")
    est = cms_estimate(
        cms_build(items, "k", depth=4, width=4096), keys, "k", depth=4, width=4096
    ).collect()[0]
    assert est.c_est == 0


def test_sketches_merge_cellwise(spark):
    f1, f2 = {"a": 3, "b": 1}, {"a": 2, "c": 4}
    s1 = cms_build(_items(spark, f1), "k", depth=3, width=128)
    s2 = cms_build(_items(spark, f2), "k", depth=3, width=128)
    merged = (
        s1.unionByName(s2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    both = cms_build(_items(spark, {"a": 5, "b": 1, "c": 4}), "k", depth=3, width=128)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))


def test_bad_dims_rejected(spark):
    with pytest.raises(ValueError, match="depth"):
        cms_build(_items(spark, {"a": 1}), "k", depth=0, width=8)
