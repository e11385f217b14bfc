"""Pin the driver's 50-entry hard-gate window (ADVICE r4: a rotation
comment mis-counted its own block, so the slot-50 boundary silently sat
one entry off — this test makes the window an asserted fact, not a
comment)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# the intended r7 window (the full r4-stale remainder + the two
# code-changed queries + r7-new slots), in order (see queries() rotation comment)
R7_WINDOW = [
    "a9_confusion",
    "grouped_quantiles",
    "a11_avg_std",
    "w6_lag_events",
    "fingerprint",
    "langid",
    "p4_despace",
    "p6_strip_punct",
    "a2_lexicon_words",
    "a2_word_frequencies",
    "segmentation_eval",
    "j5_customers_without_orders",
    "j6_customers_with_orders",
    "j7_region_nation_cross",
    "a7_a8_group_stats",
    "a10_prf",
    "rollup_counts",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "cube_counts",
    "distinct_counts",
    "s3_limit_top50",
    "u3_except_nations",
    "u2_intersect_nations",
    "w5_word_positions",
    "d6_split",
    "embed_near_dup",
    "j3_labels",
    "dedup_jaccard",
    "dedup_simhash",
    "token_count",
    "wer",
    "multimodal_features",
    "asof_events_forward",
    "asof_events_nearest",
    "asof_events_tolerance",
    "w_value_functions",
    "median_mode",
    "d5_word_ids",
    "asof_events",
    "lm_quality",
    "dup_windows_ordered",
    "mixture_sample",
    "cms_heavy_hitters",
    "gopher_quality",
    "bm25_rank",
    "url_canonicalize",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "lopq_ann_topk",
]


def test_first_50_is_the_intended_window():
    import __spark_entry__ as em

    keys = list(em.queries().keys())
    assert keys[:50] == R7_WINDOW
    assert len(R7_WINDOW) == 50


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
