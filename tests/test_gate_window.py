"""Pin the driver's 50-entry hard-gate window (ADVICE r4: a rotation
comment mis-counted its own block, so the slot-50 boundary silently sat
one entry off — this test makes the window an asserted fact, not a
comment)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# the intended r6 window (dedup_pipeline NEW this round), in order (see queries() rotation comment)
R6_WINDOW = [
    "stratified_sample_salted",
    "zorder_key",
    "bloom_join_pruned",
    "dedup_canonical",
    "tpch_q18_large_orders",
    "tpch_q22_acctbal",
    "m5_indel_ratio",
    "p3_mark_spaces",
    "a4_max_len",
    "p13_p14_wrap_decode",
    "p2_clean_text",
    "w7_split_point",
    "a14_word_diff",
    "a15_dataset_analysis",
    "dedup_pipeline",
    "pii_redact",
    "decontaminate",
    "lsh_near_dup",
    "flagship_correct",
    "flagship_catalyst",
    "flagship_roulette",
    "a5_line_share",
    "j3_band_join",
    "a1_char_vocab",
    "dedup_exact",
    "a3_bucket_hist",
    "lm_quality",
    "profile_columns",
    "histogram_buckets",
    "url_functions",
    "opq_ann_topk",
    "u1_union_nations",
    "json_props",
    "w1_topk_orders",
    "dup_windows_ordered",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "shuffle_shards",
    "repeated_ngram_spans",
    "substring_dedup_clean",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    ]


def test_first_50_is_the_intended_window():
    import __spark_entry__ as em

    keys = list(em.queries().keys())
    assert keys[:50] == R6_WINDOW
    assert len(R6_WINDOW) == 50


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
