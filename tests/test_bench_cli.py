"""bench.py CLI invariants that don't need a SparkSession: the
PLANS.md bench-history table must never lag the recorded BENCH_r*.json
artifacts (VERDICT r5 item 3 — the r5 row went missing because the
driver writes BENCH_rN.json after the round's last commit, so the NEXT
session must regenerate; this test makes forgetting a suite failure)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_plans_history_table_covers_every_bench_artifact():
    import bench

    ok, msg = bench.history_is_current()
    assert ok, msg + " — run `python bench.py --history`"
