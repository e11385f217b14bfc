"""Pin the driver's 50-entry hard-gate window (ADVICE r4: a rotation
comment mis-counted its own block, so the slot-50 boundary silently sat
one entry off — this test makes the window an asserted fact, not a
comment)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# the intended r5 window, in order (see queries() rotation comment)
R5_WINDOW = [
    # never driver-gated before r5
    "pagerank", "sliding_window", "array_functions", "udtf_chunks",
    "stratified_sample", "pack_batches", "date_functions",
    "string_functions", "map_hof", "null_semantics", "explode_outer",
    "except_all_intersect_all",
    # new/changed code this round + flagship trio
    "bloom_positions", "ivf_ann_topk", "flagship_correct",
    "flagship_catalyst", "flagship_roulette",
    # stalest (last driver-verified r3)
    "dedup_minhash_lsh", "ann_cosine_topk", "dedup_clusters", "cer",
    "seqeval_f1", "tfidf_top_terms", "textstats_quality",
    "d2_split_to_fit", "skew_salted_counts", "sessionize",
    "interval_join", "streaming_window", "w_rows_frame",
    "hof_array_ops", "approx_distinct", "approx_quantile",
    "grouping_sets_counts", "cms_counts", "pivot_returnflag",
    "ntile_quartiles", "map_props", "unpivot_stats", "rollup_cascade",
    "tpch_q1_pricing", "tpch_q2_min_price_supplier",
    "tpch_q4_order_priority", "tpch_q7_volume_shipping",
    "tpch_q10_returned_items", "tpch_q13_cust_distribution",
    "tpch_q16_supplier_cnt", "tpch_q19_disjunctive_revenue",
    "j4_revenue_by_nation", "a6_cumulative_share",
]


def test_first_50_is_the_intended_window():
    import __spark_entry__ as em

    keys = list(em.queries().keys())
    assert keys[:50] == R5_WINDOW
    assert len(R5_WINDOW) == 50


def test_every_query_has_oracle_or_documented_rows_only():
    """Registry invariant: every queries() key is either oracle-backed or
    one of the five documented non-SQL-expressible rows-only entries."""
    import __spark_entry__ as em

    rows_only = set(em.queries()) - set(em.oracle_sql())
    assert rows_only == {
        "flagship_correct",
        "flagship_catalyst",
        "flagship_roulette",
        "m5_indel_ratio",
        "segmentation_eval",
    }
    assert set(em.oracle_sql()) <= set(em.queries())
