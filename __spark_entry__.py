"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are contributed by the operator modules in
``go_whisper_spark.operators`` — whisper semantics over ``events``,
relational coverage over the TPC-H-ish tables, and the
LLM-data-pipeline operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the whisper read path.

    events → points (metric=event_type) → 1h/30d + 6h/90d archives,
    Average, xff=0.0 → Fetch(now-3d, now) → dense gap-filled hourly
    series per metric (FIXTURES.md §B3).
    """
    from go_whisper_spark.engine import WhisperEngine
    from go_whisper_spark.model import SeriesConfig
    from go_whisper_spark.sources.tables import events_points

    pts = events_points(spark, "/root/testdata/sf0.001")
    cfg = SeriesConfig.from_defs("1h:30d,6h:90d", "average", 0.0)
    now = pts.agg(F.max("ts")).first()[0]
    engine = WhisperEngine(spark, cfg)
    engine.update_many(pts, now)
    return engine.fetch(now - 3 * 86400, now, now).frame


# The driver checks only the FIRST 50 registry entries per round, so
# the registry is ordered by driver-verification recency: queries the
# driver has never checked first (genuinely-new round-8 queries via
# the "not in any list" clause), then cohorts oldest-check-first
# (round 4, round 5, round 6), with the most recently checked (round
# 7's window, 50/50 green in CORRECTNESS_r07) last.  This rotates
# every query through the driver's 50-entry window across rounds.
#
# Round-7 window = 24 new + 25 deferred + w_wsp_roundtrip = exactly 50
# (verified: zero overlap with CORRECTNESS_r06; CORRECTNESS_r07 is
# 50/50 hash-green on exactly this set).  ROUND-8 rotation APPLIED:
# _R07_WINDOW is ordered LAST in _registry(), so round 8's window =
# genuinely-new round-8 queries + the round-4 cohort (oldest driver
# evidence, incl. the m_* trio whose byte-arithmetic oracles the
# driver has never seen).  Names in _R07_WINDOW are excluded from the
# earlier cohort blocks (w_wsp_roundtrip sits in both _R04_CHECKED and
# _R07_WINDOW — its round-7 check wins, so it sorts last).
_R07_WINDOW = [
    "t_quality_filter", "g_holt_winters", "g_tag_select", "g_tag_group",
    "g_tag_parse", "g_smart_summarize", "g_agg_wildcards",
    "g_apply_by_node", "g_constant_line", "g_time_function",
    "g_holt_winters_bands", "g_range_of_series", "g_multiply_series",
    "g_stddev_series", "g_hw_aberration", "g_most_deviant",
    "g_minimum_above", "g_current_below", "g_sort_by_minima",
    "g_scale_to_seconds", "g_fallback_series", "g_summarize_last",
    "g_sigmoid", "st_dedup_1h", "g_aggregate_line", "g_remove_empty",
    "g_stacked", "g_weighted_average", "g_pow", "g_exp", "g_round_to",
    "g_limit_sorted", "g_avg_outside_pctile", "g_minmax_norm",
    "g_timestack", "w_wsp_export", "g_moving_sum", "g_transform_null",
    "g_alias_by_metric", "g_use_series_above", "g_diff_vs_yesterday",
    "g_count_series", "st_derivative", "w_carbon_ingest",
    "d_norm_dedup", "d_containment", "r_grouping_sets",
    "g_area_between", "t_sentence_stats", "w_wsp_roundtrip",
]  # == CORRECTNESS_r07.json keys (test_registry.py pins this).

# The round-8 driver window = CORRECTNESS_r08.json keys (verified
# 50/50 hash-green; test_registry.py pins set equality).  ROUND-9
# rotation APPLIED: _R08_WINDOW is in `seen` and ordered LAST in
# _registry() (alongside _R07_WINDOW), so round 9's window fronts
# _R08_DEFERRED + the r4 stragglers (w_asof_join,
# w_session_window_native) + the round-5 cohort — zero overlap with
# round 8's window.
_R08_WINDOW = [
    "g_divide_series_lists", "g_time_shift_multi", "g_alias_by_tags",
    "g_threshold", "g_is_non_null", "w_sessionize_30m", "r_q12_priority",
    "d_exact_dedup", "d_lsh_pairs", "d_simhash", "d_simhash_pairs",
    "d_simhash_banded", "s_cosine_topk", "s_cosine_nearpairs",
    "s_cosine_ann", "s_ann_recall", "s_cosine_ann_mp", "s_ann_mp_recall",
    "s_cosine_sig", "s_sig_recall", "s_vector_stats",
    "d_embed_neardup_lsh", "t_token_stats", "t_lang_id", "t_quality",
    "t_fingerprint", "t_tfidf_top3", "t_word_freq", "m_decode_stats",
    "m_feature_norms", "m_frame_sample", "g_moving_avg_3",
    "g_nonneg_derivative", "g_sum_series", "g_timeshift_1d",
    "g_as_percent", "g_integral", "g_keep_last", "g_keep_last_limit",
    "g_summarize_4h", "g_group_by_node", "g_highest_avg_3", "g_stdev_1d",
    "g_ewma", "g_moving_median_5", "g_transform_chain", "g_linreg_1d",
    "g_remove_above_pctile", "g_moving_avg_time", "w_lww_1h",
]

# The round-9 driver window == CORRECTNESS_r09.json keys (verified
# 50/50 hash-green; test_registry.py pins set equality).  ROUND-10
# rotation APPLIED (with the corrected edit from VERDICT r9 item 1):
# _R09_WINDOW joined `recent` and is ordered LAST, and the
# _R08_DEFERRED block was deleted from the order (it is a strict
# subset of _R09_WINDOW — keeping it second would have made round
# 10's window overlap round 9's by 41/50).  Round 10's window fronts
# the 4 never-checked _R09_DEFERRED entries, then the round-5 cohort
# (driver evidence stale since r5), overflowing into the round-6
# cohort — zero overlap with round 9's window.
_R09_WINDOW = [
    "w_resize", "t_span_dedup", "t_decontam", "t_bpe_merge",
    "s_pq_search", "s_pq_search_recall", "s_semantic_dedup",
    "m_pcm_resample", "g_avg_outside_pctile_vt",
    "g_aggregate_series_lists", "g_group_by_nodes", "g_highest_max",
    "g_sin_function", "g_counter_wrap", "g_as_percent_series",
    "st_enrich", "t_seq_packing", "t_pipeline_e2e", "d_split_hash",
    "t_contamination", "t_repetition", "t_mix_weights", "st_join_1h",
    "m_resize_stats", "t_dup_spans", "w_retention_expand",
    "g_remove_between_pctile", "g_random_walk", "t_length_buckets",
    "d_cc_stars", "t_stratified_sample", "st_cascade_chained",
    "w_lakehouse_rollup", "m_pcm_energy", "t_bpe_pairs",
    "d_incremental", "s_mrl_eval", "st_lsh_prefilter",
    "t_unigram_logprob", "t_bigram_logprob", "s_pq_encode",
    "s_pq_recall", "w_retention_reap", "w_store_fetch", "w_asof_join",
    "w_session_window_native", "w_wsp_propagate", "w_sessionize_chunked",
    "s_cosine_ivf", "st_rollup_lww_1h",
]

# Queries added late in round 9, after the window freeze above.
# Never driver-checked; they FRONT the round-10 window right after
# any genuinely-new round-10 queries (the _R08_DEFERRED pattern).
_R09_DEFERRED: list = [
    "st_pq_score",
    "g_cacti_style",
    "st_lakehouse_ingest",
    "w_lakehouse_timetravel",
]

# The round-10 driver window == CORRECTNESS_r10.json keys (verified
# 50/50 hash-green; test_registry.py pins set equality).  ROUND-11
# rotation APPLIED per VERDICT r10 item 1 — all four steps: (a)
# _R10_WINDOW joined `recent`; (b) the _R09_DEFERRED block gained an
# `and n not in recent` filter (it is ⊂ _R10_WINDOW); (c) the
# _R10_DEFERRED block MOVED UP to right after the new-queries clause
# (as ordered in round 10 it sat after the r4/r5/r6 cohorts and would
# have missed round 11's window entirely); (d) _R10_WINDOW's block
# appended at the end of the order.  Round 11's window therefore
# fronts any genuinely-new round-11 queries, then the 10
# never-driver-checked _R10_DEFERRED entries (render layer + bronze
# compaction), then the oldest cohorts — zero overlap with round 10.
_R10_WINDOW: list = [
    "w_range_join_binned", "t_span_dedup_l5", "t_span_dedup_l9",
    "t_bpe_train2", "t_bpe_train_vocab", "t_bpe_encode",
    "s_pq_search_serve", "s_pq_upsert", "m_chunk_dedup",
    "g_remove_below_pctile", "g_maximum_below", "st_join_1h_outer",
    "st_pq_score", "g_cacti_style", "st_lakehouse_ingest",
    "w_lakehouse_timetravel", "st_sessions_30m", "g_scale", "g_offset",
    "g_alias_by_node", "g_hitcount", "g_consolidate_by",
    "g_remove_below_value", "g_remove_above_value", "g_average_above",
    "g_current_above", "g_integral_by_interval", "g_sort_by_maxima",
    "d_neardup_clusters", "d_dedup_keepers", "d_jaccard_pairs",
    "d_minhash_sigs", "t_bigram_freq", "w_xff_sensitivity",
    "w_derivative_1h", "w_sliding_1h_30m", "w_percentiles_1d",
    "w_rollup_6h", "w_cascade_1d", "w_agg_methods_1d",
    "w_fetch_dense_3d", "w_fetch_coarse_30d", "w_retention_7d",
    "w_diff_series", "w_fill_merge", "r_q1_pricing",
    "r_corr_scalar_sub", "r_q14_promo", "r_q16_supplier_cnt",
    "r_q19_disjunct",
]

# Queries added late in round 10, after the round-10 window freeze.
# Never driver-checked; they FRONT the round-11 window right after
# any genuinely-new round-11 queries (the _R09_DEFERRED pattern).
_R10_DEFERRED: list = [
    "w_lakehouse_compact",
    "g_render_pipeline",
    "g_render_sum_deriv",
    "g_render_select_alias",
    "g_render_cumcount",
    "g_render_ratio",
    "g_render_smooth",
    "g_render_group",
    "g_render_counters",
    "g_render_summarize",
]

# The round-11 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 6 new round-11
# queries (PQ upsert-serve loop, the three round-11 render
# compositions, the streaming render) + the 10 never-checked
# _R10_DEFERRED entries + 34 of the r5/r6 cohorts (oldest driver
# evidence; zero overlap with rounds 8-10 — test_registry asserts
# list == first-50 so drift is caught before the driver runs).
# Round-12 rotation APPLIED (CORRECTNESS_r11.json keys verified ==
# this list, 50/50 green): (a) _R11_WINDOW added to `recent`; (b) the
# _R11_DEFERRED block moved to right after the new-queries clause
# with an `and n not in recent` guard; (c) _R11_WINDOW's block
# appended at the END of the order.  The round-12 window therefore
# fronts any genuinely-new round-12 queries, then the 31
# never-driver-checked _R11_DEFERRED entries, then the oldest
# cohorts — zero overlap with round 11.
# NOTE: _R11_DEFERRED holds 31 never-driver-checked queries — with
# new round-12 queries this may exceed the 50-row window; that is
# FINE (the overflow tail simply waits one more round, still ahead
# of every already-checked cohort).  Every deferred entry is green
# under the exact-typed local gate at BOTH sf0.01 and sf0.1
# (verified individually at registration time, round 11; re-verified
# by the round-11 judge, exit 0).
_R11_WINDOW: list = [
    "s_pq_search_upserted", "s_pq_upserted_recall", "g_render_topavg",
    "g_render_nodes", "g_render_deep", "st_render_6h",
    "w_lakehouse_compact", "g_render_pipeline", "g_render_sum_deriv",
    "g_render_select_alias", "g_render_cumcount", "g_render_ratio",
    "g_render_smooth", "g_render_group", "g_render_counters",
    "g_render_summarize", "r_q7_nation_volume", "r_q2_min_cost",
    "r_unpivot", "r_lateral_top2", "r_q22_acctbal", "r_cube_orders",
    "r_pivot", "r_q3_revenue", "r_q5_nation_rev", "r_topk_orders",
    "r_window_topk_cust", "r_q6_forecast", "r_q4_order_exists",
    "r_q8_mkt_share", "r_q9_profit", "r_q10_returns", "r_q11_top_value",
    "r_q13_cust_dist", "r_q15_top_supplier", "r_q17_small_qty",
    "r_q18_large_volume", "r_q20_part_promo", "r_q21_waiting",
    "s_quantize_int8", "g_grep", "g_maximum_above", "g_minimum_below",
    "g_average_below", "g_highest_current", "g_offset_to_zero",
    "g_time_slice", "g_changed", "g_delay", "g_divide_series",
]

# Queries added late in round 11, after the round-11 window freeze.
_R11_DEFERRED: list = [
    "s_hybrid_rrf",
    "s_pq_search_filtered",
    "g_render_spread",
    "st_render_scaled",
    "g_render_hw",
    "g_render_bands",
    "st_render_nodes",
    "g_render_hitstack",
    "g_render_volatility",
    "g_render_tags",
    "st_render_hitcount",
    "g_render_cacti",
    "g_render_pairs",
    "g_render_generic",
    "m_cdc_dedup",
    "t_ppl_terciles",
    "w_lakehouse_merge",
    "st_lakehouse_merge",
    "s_kmeans_step",
    "d_cdc_neardup",
    "w_heavy_hitters_cms",
    "w_distinct_hll",
    "s_kmeans_2step",
    "s_kmeans_seed",
    "d_cdc_keepers",
    "st_distinct_hll",
    "t_curation_e2e",
    "st_heavy_hitters_cms",
    "w_funnel_3step",
    "w_cohorts",
    "t_lang_confusion",
]

# The round-12 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 13 new round-12
# queries (k-step funnel + latency ledger, Bloom decontam audit,
# multi-probe PQ serve + recall, 5 render-parity compositions, the
# streaming moving-window render, the streaming funnel, the streaming
# Bloom OR-merge) + ALL 31 never-checked _R11_DEFERRED entries + 6 of
# the r6 cohort (oldest driver evidence; zero overlap with rounds
# 9-11 — test_registry asserts list == first-50 so drift is caught
# before the driver runs).
# ROUND-13 rotation EXECUTED (CORRECTNESS_r12 keys == this list,
# verified by simulation; 49/50 green, s_kmeans_step err — see
# _R12_RED): (a) _R12_WINDOW joined `recent`; (b) the _R12_DEFERRED
# block moved to right after the new-queries clause with an `and n
# not in recent` guard; (c) _R12_WINDOW's block appended at the END
# (minus the red row, which re-checks at the FRONT via _R12_RED).
_R12_WINDOW: list = [
    "w_funnel_4step", "w_funnel_latency", "t_bloom_decontam",
    "s_pq_search_mp", "s_pq_mp_recall", "g_render_lists",
    "g_render_apply", "g_render_unique", "g_render_band",
    "g_render_multinode", "st_render_mwin", "st_funnel_4step",
    "st_bloom_words", "s_hybrid_rrf", "s_pq_search_filtered",
    "g_render_spread", "st_render_scaled", "g_render_hw",
    "g_render_bands", "st_render_nodes", "g_render_hitstack",
    "g_render_volatility", "g_render_tags", "st_render_hitcount",
    "g_render_cacti", "g_render_pairs", "g_render_generic",
    "m_cdc_dedup", "t_ppl_terciles", "w_lakehouse_merge",
    "st_lakehouse_merge", "s_kmeans_step", "d_cdc_neardup",
    "w_heavy_hitters_cms", "w_distinct_hll", "s_kmeans_2step",
    "s_kmeans_seed", "d_cdc_keepers", "st_distinct_hll",
    "t_curation_e2e", "st_heavy_hitters_cms", "w_funnel_3step",
    "w_cohorts", "t_lang_confusion", "g_percentile_of_series",
    "g_moving_extremes", "g_interpolate", "st_cascade_6h",
    "w_approx_stats", "g_absolute",
]

# The single RED row of the round-12 window (driver `err`: its
# centroid ARRAY<BIGINT> column broke the driver's pandas
# canonicalizer — fixed in round 13 by posexploding to scalar
# (cid, n_members, inertia, dim, c) rows on both sides).  A red row
# re-checks BEFORE anything new: this block sorts at the very front
# of the round-13 window, ahead of even genuinely-new queries.
_R12_RED: list = [
    "s_kmeans_step",
]

# Queries added late in round 12, after the round-12 window freeze.
_R12_DEFERRED: list = [
    "st_render_deriv",
    "st_render_tags",
    "w_kmv_jaccard",
    "st_kmv_bottomk",
    "w_event_transitions",
    "st_render_tagwin",
]

# The round-13 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the r12 red row
# (s_kmeans_step, re-fronting after its output-shape fix) + the 8 new
# round-13 queries (HDR rank sketch batch+streaming, cohort x funnel
# matrix, fixed-point PageRank batch+streamed-edge-sketch, Z-order
# skipping ledger, prefix-filter similarity join, the xff/legend/
# sortBy render composition) + ALL 6 never-checked _R12_DEFERRED
# entries + 35 of the round-4/5/6 cohort (oldest driver evidence;
# zero overlap with the rounds-10-12 greens — test_registry asserts
# list == first-50 so drift is caught before the driver runs).
# ROUND-14 rotation EXECUTED (CORRECTNESS_r13 keys == this list,
# verified by simulation; 50/50 green — zero red rows, so no
# _R13_RED block): (a) _R13_WINDOW joined `recent`; (b) the
# _R13_DEFERRED block moved to right after the new-queries clause
# with an `and n not in recent` guard; (c) _R13_WINDOW's block
# appended at the END of the order, and the now-stale _R12_RED front
# clause removed (s_kmeans_step re-checked GREEN in round 13, so it
# sorts last with the rest of _R13_WINDOW).
_R13_WINDOW: list = [
    "s_kmeans_step", "w_quantile_hdr", "w_funnel_cohort",
    "w_event_pagerank", "w_zorder_skipping", "d_prefix_join",
    "g_render_xff", "st_quantile_hdr", "st_event_pagerank",
    "st_render_deriv", "st_render_tags", "w_kmv_jaccard",
    "st_kmv_bottomk", "w_event_transitions", "st_render_tagwin",
    "g_invert", "g_square_root", "g_logarithm",
    "g_derivative", "g_per_second", "g_series_combine",
    "g_sort_by_total", "g_exclude", "g_nth_percentile",
    "g_lowest_average", "g_alias_sub", "r_window_running",
    "r_rank_funcs", "r_semi_anti", "r_setops",
    "r_exists_sql", "r_salted_topk_cust", "r_rollup_orders",
    "r_json_props", "r_scalar_funcs", "r_date_parts",
    "t_quality_filter", "g_holt_winters", "g_tag_select",
    "g_tag_group", "g_tag_parse", "g_smart_summarize",
    "g_agg_wildcards", "g_apply_by_node", "g_constant_line",
    "g_time_function", "g_holt_winters_bands", "g_range_of_series",
    "g_multiply_series", "g_stddev_series",
]

# Queries added late in round 13, after the round-13 window freeze.
# Never driver-checked (local exact-typed gate green at sf0.01 +
# sf0.1); they front the round-14 window right after any
# genuinely-new round-14 queries (the standing deferral rule).
_R13_DEFERRED: list = [
    "s_mmr_rerank",
    "st_funnel_cohort",
    "w_hilbert_skipping",
    "w_join_cms_estimate",
    "st_zorder_stats",
]

# The round-14 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 8 new round-14
# queries (the degree-ordered triangle family — exact ledger, k-truss
# support histogram, DOULION sampled estimate — the lakehouse
# merge-on-read scan + its streamed CDC-apply twin, the streaming
# watermark-correctness ledger, and the two render parity
# compositions) + the 5 never-checked _R13_DEFERRED entries + 36 of
# the r07 cohort + 1 of r08 (oldest driver evidence; zero overlap
# with rounds 11-13 — test_registry asserts list == first-50 so
# drift is caught before the driver runs).
# ROUND-15 rotation APPLIED (CORRECTNESS_r14.json keys verified ==
# this list, 50/50 green, zero red rows so no _R14_RED block): (a)
# _R14_WINDOW joined `recent`; (b) the _R14_DEFERRED block moved to
# right after the new-queries clause with an `and n not in recent`
# guard; (c) every older-window block gained the `n not in r14`
# exclusion (this window reached into _R07/_R08 — 36 of r07 + 1 of
# r08 re-checked green in r14, so their fresh _R14_WINDOW spot is
# authoritative); (d) _R14_WINDOW's block appended at the END of the
# order.  Round 15's window fronts the 3 never-checked _R14_DEFERRED
# entries, then the oldest cohorts.
_R14_WINDOW: list = [
    "w_lakehouse_mor", "w_triangles", "w_truss_support",
    "w_triangle_sample", "g_render_hwarea",
    "g_render_gapfill", "st_lakehouse_mor", "st_late_ledger",
    "s_mmr_rerank", "st_funnel_cohort",
    "w_hilbert_skipping", "w_join_cms_estimate", "st_zorder_stats",
    "g_hw_aberration", "g_most_deviant",
    "g_minimum_above", "g_current_below", "g_sort_by_minima",
    "g_scale_to_seconds", "g_fallback_series",
    "g_summarize_last", "g_sigmoid", "st_dedup_1h", "g_aggregate_line",
    "g_remove_empty",
    "g_stacked", "g_weighted_average", "g_pow", "g_exp", "g_round_to",
    "g_limit_sorted", "g_avg_outside_pctile", "g_minmax_norm",
    "g_timestack", "w_wsp_export",
    "g_moving_sum", "g_transform_null", "g_alias_by_metric",
    "g_use_series_above", "g_diff_vs_yesterday",
    "g_count_series", "st_derivative", "w_carbon_ingest",
    "d_norm_dedup", "d_containment",
    "r_grouping_sets", "g_area_between", "t_sentence_stats",
    "w_wsp_roundtrip", "g_divide_series_lists",
]

# Queries added late in round 14, after the round-14 window freeze.
# Never driver-checked (local exact-typed gate green at sf0.01 +
# sf0.1); they front the round-15 window right after any
# genuinely-new round-15 queries (the standing deferral rule).
_R14_DEFERRED: list = [
    "st_triangles",
    "w_pagerank_fixpoint",
    "t_bytes_hdr",
]

# The round-15 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 7 new round-15
# queries (truss decomposition to fixpoint, the probe-only triangle
# serve form, positional deletion vectors, schema evolution, k-means
# to convergence, and the two render wave-9 compositions) + the 3
# never-checked _R14_DEFERRED entries + 40 of the r08 cohort (oldest
# driver evidence; zero overlap with rounds 12-14 — test_registry
# asserts list == first-50 so drift is caught before the driver
# runs).  Round-16 rotation EXECUTED: CORRECTNESS_r15.json keys ==
# this list (50/50 green, zero red rows, so no _R15_RED block
# exists), r15 joined `recent`, the _R15_DEFERRED block fronts the
# round-16 window, `n not in r15` guards every older-window block
# (the r15 window re-checked 40 of _R08_WINDOW), and this list's
# block sits at the END of the order.
_R15_WINDOW: list = [
    "w_truss_decomp", "w_triangles_serve", "w_lakehouse_mor_pos",
    "w_lakehouse_evolve", "s_kmeans_train",
    "g_render_product", "g_render_infstack", "st_triangles",
    "w_pagerank_fixpoint", "t_bytes_hdr",
    "g_time_shift_multi", "g_alias_by_tags", "g_threshold",
    "g_is_non_null", "w_sessionize_30m",
    "r_q12_priority", "d_exact_dedup", "d_lsh_pairs", "d_simhash",
    "d_simhash_pairs",
    "d_simhash_banded", "s_cosine_topk", "s_cosine_nearpairs",
    "s_cosine_ann", "s_ann_recall",
    "s_cosine_ann_mp", "s_ann_mp_recall", "s_cosine_sig",
    "s_sig_recall", "s_vector_stats",
    "d_embed_neardup_lsh", "t_token_stats", "t_lang_id", "t_quality",
    "t_fingerprint",
    "t_tfidf_top3", "t_word_freq", "m_decode_stats",
    "m_feature_norms", "m_frame_sample",
    "g_moving_avg_3", "g_nonneg_derivative", "g_sum_series",
    "g_timeshift_1d", "g_as_percent",
    "g_integral", "g_keep_last", "g_keep_last_limit",
    "g_summarize_4h", "g_group_by_node",
]

# Queries added late in round 15, after the round-15 window freeze.
_R15_DEFERRED: list = [
    "w_lakehouse_move",
    "w_kcore_decomp",
    "w_link_cn",
    "w_lakehouse_bloomskip",
    "w_lakehouse_optimize",
    "s_kmeans_train_k12",
    "w_lakehouse_cdf",
    "w_lakehouse_cdf_mor",
    "st_lakehouse_cdf",
    "w_topk_mg",
    "st_topk_mg",
    "g_render_vline",
    "w_link_cn_sample",
    "w_bfs_layers",
    "s_coreset",
    "m_vad_segments",
]

# The round-16 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 8 new round-16
# queries (positional-DV CDF + its streamed producer, incremental MV
# maintenance, partition-spec evolution, min-label propagation to
# fixpoint, image aHash near-dup, the incremental triangle ledger,
# the streamed KMV sketch) + the 16 never-checked _R15_DEFERRED
# entries + the oldest remaining driver evidence (the r08-window
# tail the r15 window didn't reach, then the front of the r09
# cohort).  test_r16_window_matches_driver_record pins list ==
# CORRECTNESS_r16 keys (verified 50/50 hash-green).  ROUND-17
# rotation APPLIED per VERDICT r16 item 1 — all four steps: (a)
# _R16_WINDOW joined `recent`; (b) the _R16_DEFERRED block moved to
# right after the new-queries clause; (c) `n not in r16` added to
# every explicit older-window block (this window reached the
# _R08_WINDOW tail and the _R09_WINDOW front — the standing
# footgun); (d) _R16_WINDOW's block appended at the END (50/50
# green, so no _R16_RED block exists).
_R16_WINDOW: list = [
    'w_lakehouse_cdf_pos', 'w_lakehouse_mv',
    'w_lakehouse_partevolve', 's_labelprop',
    'm_ahash_neardup', 'st_lakehouse_cdf_pos',
    'st_triangles_ledger', 'st_kmv_jaccard',
    'w_lakehouse_move', 'w_kcore_decomp',
    'w_link_cn', 'w_lakehouse_bloomskip',
    'w_lakehouse_optimize', 's_kmeans_train_k12',
    'w_lakehouse_cdf', 'w_lakehouse_cdf_mor',
    'st_lakehouse_cdf', 'w_topk_mg',
    'st_topk_mg', 'g_render_vline',
    'w_link_cn_sample', 'w_bfs_layers',
    's_coreset', 'm_vad_segments',
    'g_highest_avg_3', 'g_stdev_1d',
    'g_ewma', 'g_moving_median_5',
    'g_transform_chain', 'g_linreg_1d',
    'g_remove_above_pctile', 'g_moving_avg_time',
    'w_lww_1h', 'w_resize',
    't_span_dedup', 't_decontam',
    't_bpe_merge', 's_pq_search',
    's_pq_search_recall', 's_semantic_dedup',
    'm_pcm_resample', 'g_avg_outside_pctile_vt',
    'g_aggregate_series_lists', 'g_group_by_nodes',
    'g_highest_max', 'g_sin_function',
    'g_counter_wrap', 'g_as_percent_series',
    'st_enrich', 't_seq_packing',
]

# The round-17 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 6 new round-17
# queries (the write side of partition-spec evolution, the
# single-table and OR'd multi-table LSH label-propagation rungs,
# PII scrub, incremental k-core maintenance, the support-seeded
# streamed truss decomposition) + the 6 never-checked _R16_DEFERRED
# entries + the oldest remaining driver evidence (the r09-window
# remainder the r16 window didn't reach, then the front of the r10
# cohort).  test_r17_window_matches_first_fifty pins list ==
# first-50 so drift is caught before the driver runs.
# ROUND-18 rotation APPLIED per VERDICT r17 item 1 — all four
# steps: CORRECTNESS_r17.json keys verified == this list (50/50
# green, re-checked programmatically this round); (a) _R17_WINDOW
# joined `recent`; (b) the _R17_DEFERRED block moved to right after
# the new-queries clause; (c) `n not in r17` added to every explicit
# older-window block (this window reached 33 of _R09_WINDOW and 5 of
# _R10_WINDOW — the standing footgun); (d) _R17_WINDOW's block
# appended at the END (50/50 green, so no _R17_RED block exists).
_R17_WINDOW: list = [
    'w_lakehouse_partevolve_merge', 's_labelprop_lsh',
    's_labelprop_lsh_mt', 't_pii_scrub',
    'st_kcore', 'st_truss',
    'd_dedup_matrix', 'st_labelprop',
    'st_lakehouse_mv', 'd_lsh_tuning',
    'w_lakehouse_clone', 'w_carbon_hashring',
    't_pipeline_e2e', 'd_split_hash',
    't_contamination', 't_repetition',
    't_mix_weights', 'st_join_1h',
    'm_resize_stats', 't_dup_spans',
    'w_retention_expand', 'g_remove_between_pctile',
    'g_random_walk', 't_length_buckets',
    'd_cc_stars', 't_stratified_sample',
    'st_cascade_chained', 'w_lakehouse_rollup',
    'm_pcm_energy', 't_bpe_pairs',
    'd_incremental', 's_mrl_eval',
    'st_lsh_prefilter', 't_unigram_logprob',
    't_bigram_logprob', 's_pq_encode',
    's_pq_recall', 'w_retention_reap',
    'w_store_fetch', 'w_asof_join',
    'w_session_window_native', 'w_wsp_propagate',
    'w_sessionize_chunked', 's_cosine_ivf',
    'st_rollup_lww_1h', 'w_range_join_binned',
    't_span_dedup_l5', 't_span_dedup_l9',
    't_bpe_train2', 't_bpe_train_vocab',
]

# The round-18 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 5 new round-18
# queries (the tie-aware min/max maintenance measurement rung, the
# scrub-before-train curation capstone, the 2- and 8-table
# label-propagation curve points, streaming shot-boundary detection)
# + the 4 never-checked _R17_DEFERRED entries + the oldest remaining
# driver evidence (the r10-window remainder the r17 window didn't
# reach, then the front of the r11 cohort).
# test_r18_window_matches_first_fifty pins list == first-50 so drift
# is caught before the driver runs.
# ROUND-19 rotation APPLIED per VERDICT r18 item 1 — all four
# steps: CORRECTNESS_r18.json keys verified == this list (50/50
# green, re-checked programmatically this round); (a) _R18_WINDOW
# joined `recent`; (b) the _R18_DEFERRED block moved to right after
# the new-queries clause; (c) `n not in r18` added to every explicit
# older-window block (this window reached 41 of _R10_WINDOW; the
# TODO's guess that it also reached _R11_WINDOW was measured FALSE —
# overlap 0 — but the filter is applied uniformly anyway, the
# standing footgun guard); (d) _R18_WINDOW's block appended at the
# END (50/50 green, so no _R18_RED block exists).
_R18_WINDOW: list = [
    'w_mv_minmax_ties', 't_curation_pii',
    's_labelprop_lsh_mt2', 's_labelprop_lsh_mt8',
    'st_shot_bounds', 'm_shot_bounds',
    'w_lakehouse_mv_minmax', 'st_mv_minmax',
    'm_ahash_tuning', 't_bpe_encode',
    's_pq_search_serve', 's_pq_upsert',
    'm_chunk_dedup', 'g_remove_below_pctile',
    'g_maximum_below', 'st_join_1h_outer',
    'st_pq_score', 'g_cacti_style',
    'st_lakehouse_ingest', 'w_lakehouse_timetravel',
    'st_sessions_30m', 'g_scale',
    'g_offset', 'g_alias_by_node',
    'g_hitcount', 'g_consolidate_by',
    'g_remove_below_value', 'g_remove_above_value',
    'g_average_above', 'g_current_above',
    'g_integral_by_interval', 'g_sort_by_maxima',
    'd_neardup_clusters', 'd_dedup_keepers',
    'd_jaccard_pairs', 'd_minhash_sigs',
    't_bigram_freq', 'w_xff_sensitivity',
    'w_derivative_1h', 'w_sliding_1h_30m',
    'w_percentiles_1d', 'w_rollup_6h',
    'w_cascade_1d', 'w_agg_methods_1d',
    'w_fetch_dense_3d', 'w_fetch_coarse_30d',
    'w_retention_7d', 'w_diff_series',
    'w_fill_merge', 'r_q1_pricing',
]

# Queries added late in round 18, after the round-18 window freeze.
# Never driver-checked; they FRONT the round-19 window right after
# any genuinely-new round-19 queries (the standing deferral rule).
_R18_DEFERRED: list = [
    "m_ahash_multiprobe",
]

# Queries added late in round 19, after the round-19 window freeze.
# Never driver-checked (local exact-typed gate green at both SFs);
# they FRONT the round-20 window right after any genuinely-new
# round-20 queries (the standing deferral rule).
_R19_DEFERRED: list = [
    "m_scene_keepers",
]

# Round-20 PRIORITY re-checks (VERDICT r19 item 6 / correctness-gate
# caveat): the r19 optimization round changed these query paths but
# the r19 oracle window barely overlapped them, so their independent
# driver evidence is one round stale.  They FRONT the round-20 window
# right after the never-checked deferrals — ahead of the normal
# oldest-evidence rotation — so CORRECTNESS_r20 re-adjudicates every
# optimized path (including this round's further changes to the
# triangles serve path, the brute-force top-k family, and the
# curation chain).
_R20_PRIORITY: list = [
    "t_bpe_train2", "t_curation_e2e",
    "w_range_join_binned", "t_span_dedup",
    "s_cosine_ivf", "s_semantic_dedup",
    "w_triangles_serve", "s_cosine_topk",
    "m_cdc_dedup", "m_shot_bounds",
]

# The round-20 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 1 never-checked
# _R19_DEFERRED entry (m_scene_keepers) + the 10 _R20_PRIORITY
# re-checks of r19/r20-optimized paths (VERDICT r19 item 6) + the
# oldest remaining driver evidence (the r12-cohort remainder: the
# graphite composition block, the funnel/bloom/PQ-multiprobe
# heavies, the streaming render twins, then the front of the r13
# cohort).  test_r20_window_matches_first_fifty pins list ==
# first-50 so drift is caught before the driver runs.
# ROUND-21 TODO: once CORRECTNESS_r20.json exists, verify its keys
# == this list, then (a) add _R20_WINDOW to `recent`, (b) move the
# _R20_DEFERRED block (if any queries land post-freeze) to right
# after the new-queries clause, (c) add `n not in r20` to every
# explicit older-window block this window reaches into — MEASURE
# the overlap per block, don't trust a guess, (d) append
# _R20_WINDOW's block at the END (re-front any red rows via a
# _R20_RED block, the _R12_RED pattern), (e) drop or refresh the
# _R20_PRIORITY block + its `n not in r20p` filters (its members
# will then carry fresh driver evidence).
_R20_WINDOW: list = [
    'm_scene_keepers', 't_bpe_train2',
    't_curation_e2e', 'w_range_join_binned',
    't_span_dedup', 's_cosine_ivf',
    's_semantic_dedup', 'w_triangles_serve',
    's_cosine_topk', 'm_cdc_dedup',
    'm_shot_bounds', 'g_minimum_below',
    'g_average_below', 'g_highest_current',
    'g_offset_to_zero', 'g_time_slice',
    'g_changed', 'g_delay',
    'g_divide_series', 'w_funnel_4step',
    'w_funnel_latency', 't_bloom_decontam',
    's_pq_search_mp', 's_pq_mp_recall',
    'g_render_lists', 'g_render_apply',
    'g_render_unique', 'g_render_band',
    'g_render_multinode', 'st_render_mwin',
    'st_funnel_4step', 'st_bloom_words',
    's_hybrid_rrf', 's_pq_search_filtered',
    'g_render_spread', 'st_render_scaled',
    'g_render_hw', 'g_render_bands',
    'st_render_nodes', 'g_render_hitstack',
    'g_render_volatility', 'g_render_tags',
    'st_render_hitcount', 'g_render_cacti',
    'g_render_pairs', 'g_render_generic',
    't_ppl_terciles', 'w_lakehouse_merge',
    'st_lakehouse_merge', 'd_cdc_neardup',
]

# The round-19 driver window, pre-materialized at the mid-round
# freeze: first 50 of the rotated registry = the 3 new round-19
# queries (the hyperplane multi-probe sweep, the Luhn-checksum-gated
# PII class, shot-level scene dedup) + the 1 never-checked
# _R18_DEFERRED entry (multi-probe aHash banding) + the oldest
# remaining driver evidence (the r11-cohort remainder: the render
# compositions and the TPC-H relational block).
# test_r19_window_matches_driver_record pins list == the driver's
# round-19 hash record.
# ROUND-20 rotation APPLIED — CORRECTNESS_r19.json keys verified ==
# this list programmatically (50/50 green, zero red rows, so no
# _R19_RED block exists): (a) _R19_WINDOW joined `recent`; (b) the
# _R19_DEFERRED block moved to right after the new-queries clause;
# (c) the r19 window's measured reach-ins were _R05_CHECKED (15),
# _R06_CHECKED (15), _R10_WINDOW (4) and _R11_WINDOW (42) — the
# _R0x_CHECKED blocks are covered by their `n not in recent`
# filters, and `n not in r19` was added to every explicit window
# block uniformly (the standing footgun guard); (d) _R19_WINDOW's
# block appended at the END.  Additionally this round fronts
# _R20_PRIORITY (VERDICT r19 item 6) with a matching `n not in
# r20p` exclusion on every block.
_R19_WINDOW: list = [
    's_lsh_multiprobe', 't_pii_luhn',
    'm_scene_dedup', 'm_ahash_multiprobe',
    'r_corr_scalar_sub', 'r_q14_promo',
    'r_q16_supplier_cnt', 'r_q19_disjunct',
    's_pq_search_upserted', 's_pq_upserted_recall',
    'g_render_topavg', 'g_render_nodes',
    'g_render_deep', 'st_render_6h',
    'w_lakehouse_compact', 'g_render_pipeline',
    'g_render_sum_deriv', 'g_render_select_alias',
    'g_render_cumcount', 'g_render_ratio',
    'g_render_smooth', 'g_render_group',
    'g_render_counters', 'g_render_summarize',
    'r_q7_nation_volume', 'r_q2_min_cost',
    'r_unpivot', 'r_lateral_top2',
    'r_q22_acctbal', 'r_cube_orders',
    'r_pivot', 'r_q3_revenue',
    'r_q5_nation_rev', 'r_topk_orders',
    'r_window_topk_cust', 'r_q6_forecast',
    'r_q4_order_exists', 'r_q8_mkt_share',
    'r_q9_profit', 'r_q10_returns',
    'r_q11_top_value', 'r_q13_cust_dist',
    'r_q15_top_supplier', 'r_q17_small_qty',
    'r_q18_large_volume', 'r_q20_part_promo',
    'r_q21_waiting', 's_quantize_int8',
    'g_grep', 'g_maximum_above',
]

# Queries added late in round 17, after the round-17 window freeze.
# All 4 driver-checked green in round 18's window (they front it).
_R17_DEFERRED: list = [
    "m_shot_bounds",
    "w_lakehouse_mv_minmax",
    "st_mv_minmax",
    "m_ahash_tuning",
]

# Queries added late in round 16, after the round-16 window freeze.
_R16_DEFERRED: list = [
    "d_dedup_matrix",
    "st_labelprop",
    "st_lakehouse_mv",
    "d_lsh_tuning",
    "w_lakehouse_clone",
    "w_carbon_hashring",
]

# Added late in round 8, after the round-8 window composition (5 new
# batch-1 queries + the round-4 cohort) was already settled.  Never
# driver-checked (local exact-typed gate green at sf0.01 + sf0.1), so
# they sort AFTER the round-4 cohort — keeping round 8's window on the
# oldest driver evidence — and FRONT the round-9 window right after any
# genuinely-new round-9 queries (the _R6_DEFERRED pattern).  The final
# 11 entries (d_cc_stars …) landed after the driver-window freeze in
# the same round; same deferral rule.
_R08_DEFERRED = [
    "g_aggregate_series_lists", "g_group_by_nodes", "g_highest_max",
    "g_sin_function", "g_counter_wrap", "g_as_percent_series",
    "st_enrich", "t_seq_packing", "t_pipeline_e2e",
    "d_split_hash", "t_contamination", "t_repetition", "t_mix_weights",
    "st_join_1h", "m_resize_stats", "t_dup_spans", "w_retention_expand",
    "g_remove_between_pctile", "g_random_walk", "t_length_buckets",
    "d_cc_stars", "t_stratified_sample", "st_cascade_chained",
    "w_lakehouse_rollup", "m_pcm_energy", "t_bpe_pairs", "d_incremental",
    "s_mrl_eval", "st_lsh_prefilter", "t_unigram_logprob",
    "t_bigram_logprob", "s_pq_encode", "s_pq_recall", "w_retention_reap",
    "w_store_fetch",
]

# Last checked (green / rows-only-by-design) in round 4's window.
_R04_CHECKED = [
    "w_wsp_roundtrip", "w_sessionize_30m", "r_q12_priority",
    "d_exact_dedup", "d_lsh_pairs", "d_simhash", "d_simhash_pairs",
    "d_simhash_banded", "s_cosine_topk", "s_cosine_nearpairs",
    "s_cosine_ann", "s_ann_recall", "s_cosine_ann_mp", "s_ann_mp_recall",
    "s_cosine_sig", "s_sig_recall", "s_vector_stats",
    "d_embed_neardup_lsh", "t_token_stats", "t_lang_id", "t_quality",
    "t_fingerprint", "t_tfidf_top3", "t_word_freq", "m_decode_stats",
    "m_feature_norms", "m_frame_sample", "g_moving_avg_3",
    "g_nonneg_derivative", "g_sum_series", "g_timeshift_1d",
    "g_as_percent", "g_integral", "g_keep_last", "g_keep_last_limit",
    "g_summarize_4h", "g_group_by_node", "g_highest_avg_3", "g_stdev_1d",
    "g_ewma", "g_moving_median_5", "g_transform_chain", "g_linreg_1d",
    "g_remove_above_pctile", "g_moving_avg_time",
    # g_holt_winters deliberately ABSENT: its recursive-CTE oracle is
    # new in round 7, so it fronts the window via the new-query clause.
    "w_lww_1h", "w_asof_join", "w_session_window_native",
]

# Checked green in round 5's window (CORRECTNESS_r05): the 16 queries
# new in round 5 plus the 34 round-1 rotations — most recent, so last.
_R05_CHECKED = [
    "w_wsp_propagate", "w_sessionize_chunked", "s_cosine_ivf",
    "st_rollup_lww_1h", "st_sessions_30m",
    "g_scale", "g_offset", "g_alias_by_node", "g_hitcount",
    "g_consolidate_by", "g_remove_below_value", "g_remove_above_value",
    "g_average_above", "g_current_above", "g_integral_by_interval",
    "g_sort_by_maxima",
    "d_neardup_clusters", "d_dedup_keepers", "d_jaccard_pairs",
    "d_minhash_sigs", "t_bigram_freq",
    "w_xff_sensitivity", "w_derivative_1h", "w_sliding_1h_30m",
    "w_percentiles_1d", "w_rollup_6h", "w_cascade_1d",
    "w_agg_methods_1d", "w_fetch_dense_3d", "w_fetch_coarse_30d",
    "w_retention_7d", "w_diff_series", "w_fill_merge", "r_q1_pricing",
    "r_corr_scalar_sub", "r_q14_promo", "r_q16_supplier_cnt",
    "r_q19_disjunct", "r_q7_nation_volume", "r_q2_min_cost", "r_unpivot",
    "r_lateral_top2", "r_q22_acctbal", "r_cube_orders", "r_pivot",
    "r_q3_revenue", "r_q5_nation_rev", "r_topk_orders",
    "r_window_topk_cust",
]

# Added late in round 6, after the round-6 window was already full.
# Never driver-checked (local exact-typed gate green at sf0.01 +
# sf0.1), so they FRONT the round-7 window, right after any
# genuinely-new round-7 queries.
_R6_DEFERRED = [
    "g_aggregate_line", "g_remove_empty", "g_stacked",
    "g_weighted_average", "g_pow", "g_exp", "g_round_to",
    "g_limit_sorted", "g_avg_outside_pctile", "g_minmax_norm",
    "g_timestack", "w_wsp_export",
    "g_moving_sum", "g_transform_null", "g_alias_by_metric",
    "g_use_series_above", "g_diff_vs_yesterday", "g_count_series",
    "st_derivative", "w_carbon_ingest", "d_norm_dedup", "d_containment",
    "r_grouping_sets", "g_area_between", "t_sentence_stats",
]

# Checked green in round 6's window (CORRECTNESS_r06, 50/50): the 27
# queries new in round 6, the 13 previously-never-checked rotations,
# and the 10 remaining round-1 rotations — most recent, so last.
_R06_CHECKED = [
    "r_q6_forecast", "r_q4_order_exists", "r_q8_mkt_share",
    "r_q9_profit", "r_q10_returns", "r_q11_top_value",
    "r_q13_cust_dist", "r_q15_top_supplier", "r_q17_small_qty",
    "r_q18_large_volume", "r_q20_part_promo", "r_q21_waiting",
    "s_quantize_int8", "g_grep", "g_maximum_above", "g_minimum_below",
    "g_average_below", "g_highest_current", "g_offset_to_zero",
    "g_time_slice", "g_changed", "g_delay", "g_divide_series",
    "g_percentile_of_series", "g_moving_extremes", "g_interpolate",
    "st_cascade_6h",
    "w_approx_stats",
    "g_absolute", "g_invert", "g_square_root", "g_logarithm",
    "g_derivative", "g_per_second", "g_series_combine",
    "g_sort_by_total", "g_exclude", "g_nth_percentile",
    "g_lowest_average", "g_alias_sub",
    "r_window_running", "r_rank_funcs", "r_semi_anti", "r_setops",
    "r_exists_sql", "r_salted_topk_cust", "r_rollup_orders",
    "r_json_props", "r_scalar_funcs", "r_date_parts",
]


def _registry():
    from go_whisper_spark.operators import whisper_queries

    modules = [whisper_queries]
    for name in ("relational", "llm_ops", "multimodal", "graphite_funcs",
                 "streaming_queries"):
        try:
            mod = __import__(f"go_whisper_spark.operators.{name}", fromlist=[name])
            modules.append(mod)
        except ImportError:
            pass
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))

    # _R6_DEFERRED ⊂ _R07_WINDOW and _R08_DEFERRED ⊂ _R09_WINDOW (all
    # deferrals were checked green the following round), so neither
    # needs its own block; they stay in `seen` only to keep the subset
    # relations explicit.  Every name checked in rounds 7-9 sorts LAST
    # regardless of which older cohort also lists it.
    r07 = set(_R07_WINDOW)
    r08 = set(_R08_WINDOW)
    r09 = set(_R09_WINDOW)
    r10 = set(_R10_WINDOW)
    r11 = set(_R11_WINDOW)
    r12 = set(_R12_WINDOW)
    r13 = set(_R13_WINDOW)
    r14 = set(_R14_WINDOW)
    r15 = set(_R15_WINDOW)
    r16 = set(_R16_WINDOW)
    r17 = set(_R17_WINDOW)
    r18 = set(_R18_WINDOW)
    r19 = set(_R19_WINDOW)
    r20p = set(_R20_PRIORITY)
    recent = (r07 | r08 | r09 | r10 | r11 | r12 | r13 | r14 | r15 | r16
              | r17 | r18 | r19)
    seen = (set(_R6_DEFERRED) | set(_R04_CHECKED) | set(_R05_CHECKED)
            | set(_R06_CHECKED) | recent | set(_R08_DEFERRED)
            | set(_R09_DEFERRED) | set(_R10_DEFERRED)
            | set(_R11_DEFERRED) | set(_R12_DEFERRED)
            | set(_R13_DEFERRED) | set(_R14_DEFERRED)
            | set(_R15_DEFERRED) | set(_R16_DEFERRED)
            | set(_R17_DEFERRED) | set(_R18_DEFERRED)
            | set(_R19_DEFERRED))
    order = (
        [n for n in queries if n not in seen]
        # Never-driver-checked round-19 late addition (the scene-dedup
        # keepers rung) fronts the round-20 window, right after any
        # genuinely-new queries (the standing deferral rule).
        + [n for n in _R19_DEFERRED if n in queries and n not in recent]
        # Round-20 PRIORITY re-checks (VERDICT r19 item 6): the
        # r19/r20-optimized query paths, fronted ahead of the normal
        # oldest-evidence rotation so CORRECTNESS_r20 re-adjudicates
        # them; every other block below excludes r20p so the order
        # stays duplicate-free.
        + [n for n in _R20_PRIORITY if n in queries]
        # _R18_DEFERRED ⊂ _R19_WINDOW (checked green in round 19), so
        # this block filters to empty; kept for the audit trail.
        + [n for n in _R18_DEFERRED if n in queries and n not in recent]
        # _R17_DEFERRED ⊂ _R18_WINDOW (all 4 checked green in round
        # 18), so this block filters to empty; kept for the audit
        # trail.
        + [n for n in _R17_DEFERRED if n in queries and n not in recent]
        # _R16_DEFERRED ⊂ _R17_WINDOW (all 6 checked green in round
        # 17), so this block filters to empty; kept for the audit
        # trail.
        + [n for n in _R16_DEFERRED if n in queries and n not in recent]
        # _R15_DEFERRED ⊂ _R16_WINDOW (all 16 checked green in round
        # 16), so this block filters to empty; kept for the audit
        # trail.
        + [n for n in _R15_DEFERRED if n in queries and n not in recent]
        # _R14_DEFERRED ⊂ _R15_WINDOW (checked green in round 15), so
        # this block filters to empty; kept for the audit trail.
        + [n for n in _R14_DEFERRED if n in queries and n not in recent]
        # _R13_DEFERRED ⊂ _R14_WINDOW (checked green in round 14), so
        # this block filters to empty; kept for the audit trail.
        + [n for n in _R13_DEFERRED if n in queries and n not in recent]
        # _R12_DEFERRED ⊂ _R13_WINDOW (checked green in round 13), so
        # this block filters to empty; kept for the audit trail.
        + [n for n in _R12_DEFERRED if n in queries and n not in recent]
        # _R11_DEFERRED ⊂ _R12_WINDOW (checked green in round 12), so
        # this block filters to empty; kept for the audit trail.
        + [n for n in _R11_DEFERRED if n in queries and n not in recent]
        # _R10_DEFERRED ⊂ _R11_WINDOW (checked green in round 11), so
        # this block filters to empty; kept for the subset-relation
        # audit trail (the round-9→10 footgun guard).
        + [n for n in _R10_DEFERRED if n in queries and n not in recent]
        # _R09_DEFERRED ⊂ _R10_WINDOW (checked green in round 10).
        + [n for n in _R09_DEFERRED if n in queries and n not in recent]
        + [n for n in _R04_CHECKED if n in queries and n not in recent]
        + [n for n in _R05_CHECKED if n in queries and n not in recent]
        + [n for n in _R06_CHECKED if n in queries and n not in recent]
        # The round-13 window reached INTO _R07_WINDOW (14 entries),
        # the round-14 window reached further (36 of r07 + 1 of r08),
        # the round-15 window re-checked 40 of _R08_WINDOW, and the
        # round-16 window reached the _R08_WINDOW tail (9) and the
        # _R09_WINDOW front (17) — so every older-window block
        # excludes r13, r14, r15 AND r16 members: their fresh spots
        # at the end are authoritative.  Without these filters the
        # r17 window would re-check fresh greens (the rotation
        # footgun, hit at r13→r14 and named by every verdict
        # since).
        + [n for n in _R07_WINDOW
           if n in queries and n not in r13 and n not in r14
           and n not in r15 and n not in r16 and n not in r17
           and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R08_WINDOW
           if n in queries and n not in r13 and n not in r14
           and n not in r15 and n not in r16 and n not in r17
           and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R09_WINDOW
           if n in queries and n not in r13 and n not in r14
           and n not in r15 and n not in r16 and n not in r17
           and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R10_WINDOW
           if n in queries and n not in r13 and n not in r14
           and n not in r15 and n not in r16 and n not in r17
           and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R11_WINDOW
           if n in queries and n not in r13 and n not in r14
           and n not in r15 and n not in r16 and n not in r17
           and n not in r18
           and n not in r19 and n not in r20p]
        # s_kmeans_step stays excluded here (it re-checked GREEN in
        # round 13, so its _R13_WINDOW spot below is authoritative and
        # the exclusion keeps the order list duplicate-free).
        + [n for n in _R12_WINDOW
           if n in queries and n not in _R12_RED and n not in r13
           and n not in r14 and n not in r15 and n not in r16
           and n not in r17 and n not in r18
           and n not in r19 and n not in r20p]
        # r14's window absorbed 5 of _R13_DEFERRED but zero of
        # _R13_WINDOW; the filter keeps the order duplicate-free if
        # a future window ever reaches in.
        + [n for n in _R13_WINDOW
           if n in queries and n not in r14 and n not in r15
           and n not in r16 and n not in r17 and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R14_WINDOW if n in queries and n not in r15
           and n not in r16 and n not in r17 and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R15_WINDOW if n in queries and n not in r16
           and n not in r17 and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R16_WINDOW if n in queries and n not in r17
           and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R17_WINDOW if n in queries and n not in r18
           and n not in r19 and n not in r20p]
        + [n for n in _R18_WINDOW if n in queries and n not in r19
           and n not in r20p]
        # Most recently checked, so last (50/50 green in
        # CORRECTNESS_r19 — seventh consecutive fully-green window).
        + [n for n in _R19_WINDOW if n in queries and n not in r20p]
    )
    queries = {n: queries[n] for n in order}
    oracles = {n: oracles[n] for n in order if n in oracles}
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
