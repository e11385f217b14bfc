"""asof_join (operators/asof.py): brute-force equivalence on a corner-case
fixture, null semantics for unmatched probes, and the loud duplicate-key
refusal. The DuckDB ASOF LEFT JOIN parity runs in test_entry_queries
(`asof_events`)."""
from __future__ import annotations

import pytest

from post_ocr_corretion_spark.operators.asof import asof_join


def _brute(left_rows, right_rows, direction="backward", tolerance=None):
    out = []
    for lid, key, lts, lval in left_rows:
        back = [(rts, rval) for k, rts, rval in right_rows if k == key and rts <= lts]
        fwd = [(rts, rval) for k, rts, rval in right_rows if k == key and rts >= lts]
        pick = None
        if direction == "backward" and back:
            pick = max(back)
        elif direction == "forward" and fwd:
            pick = min(fwd)
        elif direction == "nearest":
            b = max(back) if back else None
            f = min(fwd) if fwd else None
            if b is not None and (f is None or lts - b[0] <= f[0] - lts):
                pick = b  # exact tie → backward
            else:
                pick = f
        if pick is not None and tolerance is not None and abs(lts - pick[0]) > tolerance:
            pick = None
        out.append((lid, key, lts, lval) + (pick if pick else (None, None)))
    return sorted(out)


def test_asof_matches_brute_force(spark):
    left_rows = [
        (1, "a", 10, 1.0),
        (2, "a", 20, 2.0),
        (3, "a", 5, 3.0),   # before any right row → nulls
        (4, "b", 15, 4.0),
        (5, "b", 30, 5.0),
        (6, "c", 50, 6.0),  # key with no right rows at all
        (7, "a", 12, 7.0),  # exactly equal to a right ts → includes it
    ]
    right_rows = [
        ("a", 8, 100.0),
        ("a", 12, 200.0),
        ("a", 19, 300.0),
        ("b", 15, 400.0),
        ("b", 29, 500.0),
    ]
    left = spark.createDataFrame(left_rows, "lid int, key string, ts int, lval double")
    right = spark.createDataFrame(right_rows, "key string, ts int, rval double")
    got = sorted(
        (r.lid, r.key, r.ts, r.lval, r.ts_right, r.rval_right)
        for r in asof_join(left, right, by="key").collect()
    )
    assert got == _brute(left_rows, right_rows)


def test_asof_directions_and_tolerance_match_brute_force(spark):
    """Three-direction contract (VERDICT r3 item 6) + tolerance, each
    against the brute force on a fixture with equal-ts ties, before-all /
    after-all probes, and a right-empty key."""
    left_rows = [
        (1, "a", 10, 1.0),
        (2, "a", 20, 2.0),   # after the last right row → forward nulls
        (3, "a", 5, 3.0),    # before any right row → backward nulls
        (4, "b", 15, 4.0),   # exactly equal both directions
        (5, "b", 22, 5.0),   # equidistant from 15 and 29 → nearest ties backward
        (6, "c", 50, 6.0),   # key with no right rows at all
        (7, "a", 12, 7.0),   # exactly equal to a right ts
        (8, "a", 16, 8.0),   # nearer forward (19) than backward (12)
    ]
    right_rows = [
        ("a", 8, 100.0),
        ("a", 12, 200.0),
        ("a", 19, 300.0),
        ("b", 15, 400.0),
        ("b", 29, 500.0),
    ]
    left = spark.createDataFrame(left_rows, "lid int, key string, ts int, lval double")
    right = spark.createDataFrame(right_rows, "key string, ts int, rval double")
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 0, 3, 100):
            got = sorted(
                (r.lid, r.key, r.ts, r.lval, r.ts_right, r.rval_right)
                for r in asof_join(
                    left, right, by="key", direction=direction, tolerance=tol
                ).collect()
            )
            want = _brute(left_rows, right_rows, direction=direction, tolerance=tol)
            assert got == want, f"direction={direction} tolerance={tol}"

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, by="key", direction="sideways")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, by="key", tolerance=-1)


def test_asof_timestamp_tolerance_uses_seconds(spark):
    """Tolerance over real timestamp columns is in SECONDS (epoch
    difference), pandas.merge_asof-style."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame(
        [(1, "k", t0 + dt.timedelta(seconds=100))], "lid int, key string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", t0, 7.0)], "key string, ts timestamp, rval double"
    )
    hit = asof_join(left, right, by="key", tolerance=100).collect()[0]
    assert hit.rval_right == 7.0
    miss = asof_join(left, right, by="key", tolerance=99).collect()[0]
    assert miss.rval_right is None


def test_asof_refuses_duplicate_right_keys(spark):
    """Duplicate (by, ts) reference rows raise AT EXECUTION via the
    in-plan raise_error guard (lazy — building the plan launches no
    validation job; r3 review), still loudly before any wrong row is
    returned."""
    left = spark.createDataFrame([(1, "a", 10, 1.0)], "lid int, key string, ts int, lval double")
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 8, 2.0)], "key string, ts int, rval double"
    )
    df = asof_join(left, right, by="key")  # plan builds fine, no job
    with pytest.raises(Exception, match="duplicate"):
        df.collect()


def test_asof_refuses_column_collisions(spark):
    """A left column that collides with a suffixed right column (or the
    internal scratch names) must refuse loudly — silent overwrite would
    corrupt the fill."""
    left = spark.createDataFrame(
        [(1, "a", 10, 9.9)], "lid int, key string, ts int, rval_right double"
    )
    right = spark.createDataFrame([("a", 8, 1.0)], "key string, ts int, rval double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, by="key")


def test_interval_overlap_join_matches_brute_force_any_cell_size(spark):
    """Grid-bucketed interval join: identical pair set for ANY cell size
    (the residual predicate is exact; bucketing only affects cost), and
    equal to the O(n²) brute force — touching, nested, disjoint and
    cross-cell intervals included."""
    from post_ocr_corretion_spark.operators.intervals import interval_overlap_join

    rows = [
        ("u", 1, 0, 10),
        ("u", 2, 10, 20),   # touches 1 at a point (inclusive → overlap)
        ("u", 3, 21, 30),   # disjoint from 2
        ("u", 4, 5, 25),    # spans several cells, nests 2
        ("u", 5, 100, 400), # long interval across many cells
        ("v", 6, 0, 10),    # other key: never pairs with u
        ("v", 7, 3, 4),     # nested inside 6
    ]
    iv = spark.createDataFrame(rows, "k string, id int, s long, e long")
    brute = sorted(
        (a[0], a[1], b[1])
        for a in rows
        for b in rows
        if a[0] == b[0] and a[1] < b[1] and a[2] <= b[3] and b[2] <= a[3]
    )
    for cell in (1, 7, 64, 1000):
        got = sorted(
            (r.k, r.id_a, r.id_b)
            for r in interval_overlap_join(iv, cell_size=cell, by="k", id_col="id").collect()
        )
        assert got == brute, f"cell_size={cell}"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cell_size"):
        interval_overlap_join(iv, cell_size=0, by="k", id_col="id")
