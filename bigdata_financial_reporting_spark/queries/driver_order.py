"""Driver-facing ordering of the query registry.

The external correctness driver walks ``__spark_entry__.queries()`` in
dict order and truncates after ~50 keys per round, so until every key
has been checked at least once we order the export so the
highest-evidence-value keys come first:

1. keys whose latest driver row FAILED and has since been fixed, plus
   keys whose implementing source CHANGED since their last driver row
   (``scripts/gen_recheck.py`` — round-7 verdict item 1);
2. keys never seen by the driver, in *driver-environment-risk* order
   (``RISK_ORDER``, round-4 verdict item 2): features most likely to
   behave differently under the driver's runtime first (Arrow UDFs,
   Python data source, recursive CTE / pipe syntax / session vars,
   VARIANT, collation, sketches, streaming, corrupt-file handling,
   lake time travel), then the float-heavy stats suite, then the
   well-trodden TPC-H / window shapes whose local evidence generalizes
   best;
3. keys registered after the rotation was sized (``DEFER_NEW``) — they
   queue behind the existing backlog;
4. keys already driver-verified green, OLDEST check first so every
   key's driver evidence is refreshed within ~7 rounds at the 50-key
   budget (no key can starve at its r01 row indefinitely).

``DRIVER_SEEN`` is derived at import time from the union of all
committed ``CORRECTNESS_r*.json`` artifacts at the repo root, so the
rotation can never go stale (the round-2 verdict's top finding was a
hand-maintained set that missed a round). ``_STATIC_SEEN`` is the
fallback when the artifacts are absent (e.g. a bare checkout of the
package without driver outputs); it is regenerated each round from the
artifacts (round-4 verdict item 7 flagged stale names) and pinned to
the live registry by tests/test_driver_order.py.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from bigdata_financial_reporting_spark.queries.registry import QUERIES

# Union of CORRECTNESS_r01..r11 keys (354) — fallback only; the live
# set below re-reads every CORRECTNESS_r*.json so later rounds are
# picked up automatically. Regenerated round 12 from the artifacts.
_STATIC_SEEN: frozenset[str] = frozenset(
    {
        "agg_approx_count_distinct", "agg_approx_quantiles",
        "agg_benford_digits", "agg_bitmap_distinct",
        "agg_bool_bitwise", "agg_chi2_independence",
        "agg_collect_sorted", "agg_corr_covar",
        "agg_count_distinct", "agg_countmin_heavy_hitters",
        "agg_crosstab_stat", "agg_cube",
        "agg_equidepth_histogram", "agg_filtered_conditional",
        "agg_gini_coefficient", "agg_global",
        "agg_grouping_sets", "agg_histogram",
        "agg_hll_sketch_mergeable", "agg_kmv_distinct_sketch",
        "agg_ks_twosample", "agg_median_percentile",
        "agg_min_by_max_by", "agg_mode_per_group",
        "agg_pivot", "agg_regression_family",
        "agg_rollup", "agg_stats",
        "agg_subsample_ci", "agg_tdigest_quantiles",
        "agg_theta_sketch_intersection", "agg_unpivot",
        "agg_weighted_median", "agg_welch_ttest",
        "batch_length_buckets", "boolean_combinators",
        "case_when_coalesce", "cast_types",
        "dedup_bloom_prefilter", "dedup_chunk_lines",
        "dedup_clusters", "dedup_embedding_cosine",
        "dedup_exact", "dedup_exact_groups",
        "dedup_incremental", "dedup_minhash_pairs",
        "dedup_ngram_jaccard", "dedup_semantic_semdedup",
        "dedup_simhash", "dedup_survivor_quality",
        "dedup_url_canonicalize", "dedup_winnow_pairs",
        "derived_column", "distinct_pairs",
        "dropdup_keys_pinned", "emb_covariance_matrix",
        "emb_dims_variance_topk", "emb_kmeans_lloyd_step",
        "emb_label_margin", "emb_matryoshka_prefix_topk",
        "emb_pca_power_iteration", "emb_signbit_fingerprint",
        "filter_in_like_null", "filter_range",
        "fin_atr_14", "fin_beta_market",
        "fin_bollinger_bands", "fin_drawdown",
        "fin_ema_window", "fin_gapfill_interpolate",
        "fin_hhi_concentration", "fin_jarque_bera",
        "fin_kurtosis_returns", "fin_macd_daily",
        "fin_momentum_rank", "fin_obv",
        "fin_ohlc_bars", "fin_parkinson_vol",
        "fin_return_corr_pairs", "fin_rsi_window",
        "fin_sharpe_by_instrument", "fin_sortino",
        "fin_stochastic_k", "fin_var_expected_shortfall",
        "fin_vwap", "fn_array",
        "fn_array_explode", "fn_bitwise_family",
        "fn_collated_groupby", "fn_date",
        "fn_decimal_money", "fn_exists_forall_filterpos",
        "fn_explode_outer", "fn_hash",
        "fn_higher_order_maps", "fn_interval_family",
        "fn_json", "fn_listagg_within_group",
        "fn_map", "fn_math",
        "fn_nondeterministic_ids", "fn_regex_family",
        "fn_string", "fn_struct",
        "fn_try_arithmetic", "fn_url_parse",
        "fn_variant_json", "fn_xml_xpath",
        "intersect_except", "join_anti",
        "join_asof", "join_asof_nearest",
        "join_asof_tolerance", "join_broadcast_dims",
        "join_cross", "join_dim_snowflake",
        "join_exists_agg", "join_full_outer",
        "join_fuzzy_levenshtein", "join_grid_neighbors",
        "join_inner", "join_interval_containment",
        "join_interval_overlap", "join_lateral_topn",
        "join_left_outer", "join_null_safe",
        "join_point_in_time_scd2", "join_range_banded",
        "join_right_outer", "join_self",
        "join_semi", "join_theta",
        "limit_offset", "mix_apply_sample",
        "mix_domain_rebalance", "mix_epoch_upsample",
        "mix_temperature_sample", "mm_ahash_dedup_groups",
        "mm_audio_rms_windows", "mm_base64_roundtrip",
        "mm_binary_metadata", "mm_decode_features",
        "mm_decode_wav", "mm_frame_extract",
        "mm_frame_sampling", "mm_resize_ppm",
        "null_fill_drop", "ops_cdc_apply",
        "ops_clone_shallow", "ops_compact_roundtrip",
        "ops_compaction_bins", "ops_delete_update_cow",
        "ops_incremental_rollup_refresh", "ops_partition_skew_report",
        "ops_scd2_build", "ops_snapshot_expiry",
        "ops_table_profile", "ops_time_travel_versions",
        "ops_upsert_roundtrip", "ops_vacuum_orphan_files",
        "ops_validate_quality", "ops_zorder_layout",
        "pipeline_pretrain_end2end", "quality_filter_reasons",
        "quality_gopher_rules", "quality_perplexity_bucket",
        "ref_avg_daily_return", "ref_daily_returns",
        "ref_daily_returns_scalable", "ref_per_user_returns",
        "ref_report_bundle", "rename_drop",
        "rollup_timeseries", "sample_per_stratum_topk",
        "sample_seeded", "sample_stratified",
        "sample_weighted_topk", "select_prune",
        "sim_centroid_per_label", "sim_cosine_topk",
        "sim_cosine_topk_vectorized", "sim_embedding_outliers",
        "sim_euclidean_topk", "sim_hnsw_upper_graph",
        "sim_ivf_topk", "sim_ivf_trained_topk",
        "sim_ivfpq_topk", "sim_ivfpq_trained_topk",
        "sim_knn_graph_mutual", "sim_lsh_topk",
        "sim_maxdot_topk", "sim_pairwise_matrix",
        "sim_pq_encode", "sim_quantize_int8",
        "sim_random_projection", "skew_salted_agg",
        "skew_salted_join", "sort_multi_key_limit",
        "split_contamination", "split_kfold",
        "split_leakage_safe", "split_train_test",
        "sql_execute_immediate", "sql_group_by_all",
        "sql_named_parameters", "sql_pipe_syntax",
        "sql_recursive_cte_spine", "sql_session_variables",
        "src_binaryfile_scan", "src_bucketed_colocated_join",
        "src_compressed_roundtrip", "src_csv_corrupt_handling",
        "src_csv_roundtrip", "src_file_metadata_column",
        "src_in_memory", "src_json_roundtrip",
        "src_orc_roundtrip", "src_parquet_partitioned_roundtrip",
        "src_parquet_scan", "src_partition_pruning_scan",
        "src_python_datasource", "src_schema_evolution_merge",
        "src_single_csv_sink", "src_split_export_roundtrip",
        "src_text_lines_roundtrip", "src_xml_roundtrip",
        "stat_anova_f", "stat_anova_two_way",
        "stat_bartlett", "stat_chisq_gof",
        "stat_cohens_d", "stat_friedman",
        "stat_kendall_tau_b", "stat_kruskal_wallis",
        "stat_levene", "stat_mann_whitney_u",
        "stat_runs_test", "stat_spearman_corr",
        "stat_wilcoxon_signed_rank", "stream_cdc_upsert_sink",
        "stream_content_dedup", "stream_dedup_watermark",
        "stream_foreach_batch_sink", "stream_rate_source",
        "stream_session_window", "stream_sliding_window",
        "stream_stateful_counters", "stream_static_join",
        "stream_stream_join", "stream_stream_left_outer",
        "stream_tumbling_window", "text_bigram_logprob",
        "text_bigrams", "text_bpe_merge_step",
        "text_charclass_profile", "text_chunk_overlap",
        "text_collocations_pmi", "text_distinctive_ngrams",
        "text_fingerprint", "text_flesch_readability",
        "text_global_shuffle", "text_html_strip",
        "text_keywords_tfidf_topk", "text_lang_slice",
        "text_langid", "text_length_band_filter",
        "text_normalize_stem", "text_pack_sequences",
        "text_pagerank_keywords", "text_quality_logreg",
        "text_quality_score", "text_redact",
        "text_repetition_score", "text_source_overlap",
        "text_tfidf", "text_token_count_bpe",
        "text_token_counts", "text_token_entropy",
        "text_tokenize", "text_top_shingles",
        "text_unigram_logprob", "text_vocab_coverage",
        "text_winnow_fingerprint", "text_word_run_lengths",
        "text_zipf_fit", "topk_per_group",
        "tpch_q1", "tpch_q10_shape",
        "tpch_q11_shape", "tpch_q12_shape",
        "tpch_q13_shape", "tpch_q14_shape",
        "tpch_q15_shape", "tpch_q16_shape",
        "tpch_q17_shape", "tpch_q18_shape",
        "tpch_q19_shape", "tpch_q20_shape",
        "tpch_q21_shape", "tpch_q22_shape",
        "tpch_q2_shape", "tpch_q3_shape",
        "tpch_q4_shape", "tpch_q5_shape",
        "tpch_q6_shape", "tpch_q7_shape",
        "tpch_q8_shape", "tpch_q9_shape",
        "ts_autocorrelation", "ts_backward_fill",
        "ts_calendar_features", "ts_changepoint_cusum",
        "ts_cohort_retention", "ts_event_rate_anomaly",
        "ts_forward_fill", "ts_funnel",
        "ts_inter_event_gaps", "ts_mann_kendall_trend",
        "ts_minmax_downsample", "ts_seasonal_decompose",
        "ts_sessionize", "ts_snapshot_diff",
        "ts_theil_sen_slope", "ts_value_histogram2d",
        "udf_apply_in_pandas", "udf_arrow_optimized_scalar",
        "udf_map_in_arrow", "udf_map_in_pandas",
        "udf_pandas_grouped_agg", "udf_pandas_scalar",
        "udf_python_udtf", "udf_scalar_python",
        "udf_sql_function", "udf_sql_registered",
        "udf_udtf_arrow", "union_all_distinct",
        "union_by_name_missing", "window_distinct_count_frame",
        "window_first_last", "window_gaps_islands",
        "window_global_small", "window_hampel_outliers",
        "window_lag_lead", "window_longest_streak",
        "window_moving_avg", "window_nth_value_frames",
        "window_ntile_quartiles", "window_percent_rank_cume",
        "window_range_frame", "window_ranks",
        "window_running_agg", "window_running_median",
        "window_zscore_anomaly", "winsorize_by_group",
    }
)


def _last_round_from_artifacts() -> dict[str, int]:
    """key -> latest round with a driver row, from CORRECTNESS_r*.json."""
    root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for k in rows:
                last[k] = max(last.get(k, 0), rnd)
    return last


DRIVER_LAST_ROUND: dict[str, int] = _last_round_from_artifacts()
DRIVER_SEEN: frozenset[str] = (
    frozenset(DRIVER_LAST_ROUND) if DRIVER_LAST_ROUND else _STATIC_SEEN
)

# Keys whose implementing source changed SINCE their last driver check
# (round-7 verdict item 1: the r7 exactness retrofit touched keys whose
# last driver row is r01-r05, and a category-sorted seen tier would
# never re-export them). Generated by ``scripts/gen_recheck.py`` (git
# hunk overlap on the key's function span, plus narrowly-shared helper
# definitions it references), ordered oldest-driver-check-first; pinned
# against a fresh computation by tests/test_driver_order.py. Static so
# the driver export never needs git at import time.
RECHECK_FIRST: tuple[str, ...] = (
    # round-15 OPTIMIZATION sync (gen_recheck.py, which now looks back
    # one artifact window: round 14 pinned a 65-key recheck list
    # against a ~50-key driver budget, so 15 keys' r14 code changes
    # were never driver-re-verified — they carry forward here ahead of
    # everything the driver HAS re-checked, interleaved oldest driver
    # row first with the keys round 15 touched directly (the
    # global-order operator fusion, the cached-plan partitioning
    # fixes, the minhash candidate-exchange cut, and their
    # helper-closure downstream). 32 keys — all locally oracle-green
    # at HEAD; this tier exists so the DRIVER re-confirms changed code
    # first, within one round's budget.
    "text_global_shuffle",
    "agg_ks_twosample",
    "ops_compaction_bins",
    "stat_mann_whitney_u",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "stat_runs_test",
    "agg_tdigest_quantiles",
    "sim_hnsw_upper_graph",
    "stat_wilcoxon_signed_rank",
    "stream_cdc_upsert_sink",
    "stream_content_dedup",
    "stream_dedup_exactly_once",
    "stream_dedup_watermark",
    "stream_foreach_batch_sink",
    "stream_rate_source",
    "stream_session_window",
    "stream_sliding_window",
    "stream_stateful_counters",
    "stream_static_join",
    "stream_stream_full_outer",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_tumbling_window",
    "text_top_shingles",
    "ts_funnel",
    "dedup_embedding_cosine",
    "dedup_survivor_quality",
    "sim_lsh_topk",
    "sim_pairwise_matrix",
    "stat_anova_two_way",
    "stat_kruskal_wallis",
)

# Round-12 NEW keys: never driver-checked, but deliberately ranked
# AFTER the r02-stale seen tier (not the usual unseen-before-seen
# order) — the round-11 verdict's budget math needs all 41 r02 rows
# refreshed this round, and these three are locally hash-green +
# gate-swept in the meantime. They drain in r13 once the backlog is
# gone (the DRIVER_SEEN gate makes this set inert after that).
DEFER_BEHIND_STALE: frozenset[str] = frozenset(
    {
        "stream_stream_full_outer",
        "stream_dedup_exactly_once",
        "sim_opq_rotation_encode",
    }
)

# Round-13 NEW keys deferral — RETIRED in round 14. The r13 budget
# its members queued behind is spent, and the round-13 verdict made
# their driver rows the round's top item ("nothing else outranks the
# hard signal's only blind spot"), so sim_ivf_probe_sweep and
# sim_ivfpq_residual_encode now take the ordinary unseen tier, which
# ranks directly after RECHECK_FIRST and ahead of every seen key.
# The set stays importable (tests/contract) but is empty.
DEFER_BEHIND_STALE_R13: frozenset[str] = frozenset()

# Round-14 NEW key: ranked behind the r04 AND r05 staleness tiers
# (5.5 sorts after last_round<=5, before >=6). The r14 budget is
# 21 rechecks + 2 never-checked r13 keys + ~27 of the 38-key r04
# tier; growth must not displace a single stale row. Locally
# hash-green at all three SFs + the 10x corpus; drains once the r04/
# r05 backlog clears (the DRIVER_SEEN gate then makes this inert).
DEFER_BEHIND_STALE_R14: frozenset[str] = frozenset(
    {
        "sim_hnsw_greedy_descent",
    }
)

# The 16 keys that have NEVER received a driver row after six rounds
# (driver truncates at ~50/round; these sat just past the r6 window).
# They hold export positions 0-15 ahead of everything else, semdedup
# first — it has waited two rounds (round-6 verdict item 3). Once
# CORRECTNESS_r07 lands they appear in DRIVER_SEEN and this tuple
# becomes inert (the ordering gate checks unseen-ness first).
BACKLOG_R6: tuple[str, ...] = (
    "dedup_semantic_semdedup",
    "dedup_url_canonicalize",
    "fn_interval_family",
    "stat_spearman_corr",
    "stat_mann_whitney_u",
    "stat_anova_f",
    "tpch_q6_shape",
    "tpch_q9_shape",
    "tpch_q11_shape",
    "tpch_q12_shape",
    "tpch_q13_shape",
    "tpch_q15_shape",
    "tpch_q18_shape",
    "tpch_q20_shape",
    "tpch_q21_shape",
    "tpch_q22_shape",
)

# The 81 never-driver-checked keys (all round-4 additions), ranked by
# driver-environment risk (round-4 verdict, "Next round" item 2). Two
# ~50-key driver rounds remain before full coverage, so the features
# most likely to behave differently under the driver's runtime go
# first, the float-heavy stats second, and the well-trodden TPC-H /
# window shapes last (their local oracle evidence generalizes best).
RISK_ORDER: tuple[str, ...] = (
    # -- A: driver-runtime-sensitive surface (Arrow, Python data
    #    source, Spark-4 SQL features, sketches, streaming, file
    #    handling, lake time travel)
    "udf_arrow_optimized_scalar",
    "udf_map_in_arrow",
    "udf_sql_function",
    "src_python_datasource",
    "sql_recursive_cte_spine",
    "sql_pipe_syntax",
    "sql_session_variables",
    "fn_variant_json",
    "fn_collated_groupby",
    "agg_hll_sketch_mergeable",
    "agg_bitmap_distinct",
    "stream_content_dedup",
    "src_csv_corrupt_handling",
    "src_file_metadata_column",
    "ops_time_travel_versions",
    # -- B: float-heavy stats / scoring (the class the round-4
    #    covariance failure came from — most value from a real driver
    #    row under a different partitioning)
    "agg_benford_digits",
    "agg_gini_coefficient",
    "agg_welch_ttest",
    "agg_chi2_independence",
    "agg_ks_twosample",
    "agg_subsample_ci",
    "agg_crosstab_stat",
    "agg_regression_family",
    "agg_weighted_median",
    "agg_equidepth_histogram",
    "agg_countmin_heavy_hitters",
    "fin_sharpe_by_instrument",
    "fin_return_corr_pairs",
    "fin_hhi_concentration",
    "fin_var_expected_shortfall",
    "text_zipf_fit",
    "text_quality_logreg",
    "text_bigram_logprob",
    "text_collocations_pmi",
    "text_keywords_tfidf_topk",
    "text_pagerank_keywords",
    "text_distinctive_ngrams",
    "text_token_entropy",
    "window_hampel_outliers",
    "pipeline_pretrain_end2end",
    # -- C: ops / sources / joins / sampling / remaining text
    "ops_scd2_build",
    "ops_zorder_layout",
    "ops_incremental_rollup_refresh",
    "ops_cdc_apply",
    "join_lateral_topn",
    "join_point_in_time_scd2",
    "src_schema_evolution_merge",
    "src_bucketed_colocated_join",
    "src_text_lines_roundtrip",
    "dedup_bloom_prefilter",
    "dedup_chunk_lines",
    "sample_weighted_topk",
    "sample_per_stratum_topk",
    "split_kfold",
    "batch_length_buckets",
    "text_chunk_overlap",
    "text_length_band_filter",
    "union_by_name_missing",
    "fn_listagg_within_group",
    "fn_try_arithmetic",
    "fn_url_parse",
    "fn_xml_xpath",
    "fn_higher_order_maps",
    "fn_regex_family",
    "fn_exists_forall_filterpos",
    "fn_bitwise_family",
    # -- D: well-trodden relational shapes (lowest driver-env risk)
    "tpch_q2_shape",
    "tpch_q4_shape",
    "tpch_q7_shape",
    "tpch_q8_shape",
    "tpch_q10_shape",
    "tpch_q14_shape",
    "tpch_q16_shape",
    "tpch_q17_shape",
    "tpch_q19_shape",
    "agg_filtered_conditional",
    "agg_bool_bitwise",
    "agg_mode_per_group",
    "window_ntile_quartiles",
    "window_longest_streak",
    "window_distinct_count_frame",
)

# Keys registered AFTER the round-5 rotation was sized: rank new
# arrivals behind the existing never-checked backlog so the driver's
# ~50-key budget clears the backlog first (new keys carry fresh
# local-oracle evidence and get their driver row in a later round).
# Round-5 session additions go here.
DEFER_NEW: frozenset[str] = frozenset(
    {
        "dedup_semantic_semdedup",
        "sim_pq_encode",
        "sim_ivfpq_topk",
        # round-6 additions: the remaining 10 TPC-H shapes (full 22-
        # query suite) — queued behind the 35-key backlog + recheck,
        # which together leave ~14 free slots in the ~50-key budget,
        # so these can still land a driver row this round
        "tpch_q6_shape",
        "tpch_q9_shape",
        "tpch_q11_shape",
        "tpch_q12_shape",
        "tpch_q13_shape",
        "tpch_q15_shape",
        "tpch_q18_shape",
        "tpch_q20_shape",
        "tpch_q21_shape",
        "tpch_q22_shape",
        "src_xml_roundtrip",
        "fn_interval_family",
        "sql_group_by_all",
        "text_bpe_merge_step",
        # round-6 second batch (beyond the ~50-key r6 window — these
        # front the r7 rotation once CORRECTNESS_r06 lands)
        "sql_named_parameters",
        "sql_execute_immediate",
        "stat_spearman_corr",
        "stat_mann_whitney_u",
        "stat_anova_f",
        "ts_seasonal_decompose",
        "text_flesch_readability",
        "text_html_strip",
        "ops_delete_update_cow",
        "ops_partition_skew_report",
        "mix_domain_rebalance",
        "emb_pca_power_iteration",
        "udf_udtf_arrow",
        "src_compressed_roundtrip",
        "ops_snapshot_expiry",
        "dedup_url_canonicalize",
        # round-7 additions: queue behind the 16-key BACKLOG_R6 (16 +
        # ~30 new fits the ~50-key driver budget)
        "quality_gopher_rules",
        "mix_epoch_upsample",
        "split_leakage_safe",
        "text_charclass_profile",
        "text_word_run_lengths",
        "stat_kruskal_wallis",
        "stat_chisq_gof",
        "stat_cohens_d",
        "stat_kendall_tau_b",
        "stat_runs_test",
        "fin_macd_daily",
        "fin_atr_14",
        "fin_obv",
        "fin_stochastic_k",
        "fin_kurtosis_returns",
        "ts_value_histogram2d",
        "emb_kmeans_lloyd_step",
        "emb_label_margin",
        "sim_knn_graph_mutual",
        "emb_dims_variance_topk",
        "join_asof_tolerance",
        "join_dim_snowflake",
        "join_exists_agg",
        "window_percent_rank_cume",
        "window_nth_value_frames",
        "window_gaps_islands",
        "src_binaryfile_scan",
        "ops_compaction_bins",
        # second round-7 batch (budget check: 16 backlog + 28 + these
        # 6 = 50 unseen, exactly the ~50-key driver budget)
        "agg_kmv_distinct_sketch",
        "ts_backward_fill",
        "window_running_median",
        "join_grid_neighbors",
        "src_partition_pruning_scan",
        "emb_matryoshka_prefix_topk",
        # round-8 additions: queue behind the 25-key RECHECK_FIRST; the
        # remaining ~19 budget slots go to the stalest r01 keys first
        # is the wrong reading — unseen keys outrank the seen tier, so
        # these 6 take slots 26-31 and ~19 r01 keys still land in r08
        "stat_levene",
        "agg_theta_sketch_intersection",
        "fin_sortino",
        "fin_momentum_rank",
        "quality_perplexity_bucket",
        "emb_signbit_fingerprint",
        # round-10 additions: two unseen keys take 2 slots after the
        # RECHECK_FIRST retrofit re-checks; the seen-tier staleness
        # drain keeps the rest of the ~50-key budget
        "stat_anova_two_way",
        "sim_hnsw_upper_graph",
        # round-11 additions (verdict item 3): three unseen keys take
        # 3 slots; the remaining ~47 drain the r01/r02 staleness tier
        "stream_stream_left_outer",
        "sim_ivfpq_trained_topk",
        "stream_cdc_upsert_sink",
        "agg_tdigest_quantiles",
        # round-11 second batch: the paired rank test, the moment
        # normality test, and the manifest vacuum — 7 unseen keys
        # total this round still leave ~43 slots for the r01/r02
        # staleness drain
        "stat_wilcoxon_signed_rank",
        "fin_jarque_bera",
        "ops_vacuum_orphan_files",
        # round-11 third batch: the blocked rank test, range
        # volatility, and the zero-copy clone — 10 unseen keys total
        # this round, still ~40 slots for the staleness drain
        "stat_friedman",
        "fin_parkinson_vol",
        "ops_clone_shallow",
        # round-11 fourth batch: Bartlett and the nearest as-of —
        # 12 unseen keys this round, ~38 slots left for the drain
        "stat_bartlett",
        "join_asof_nearest",
        # round-12 additions (verdict item 7): exactly THREE new keys,
        # so the recheck tier + these still leave enough of the
        # ~50-key budget to drain the whole 41-key r02-stale tail
        # (verdict item 1)
        "stream_stream_full_outer",
        "stream_dedup_exactly_once",
        "sim_opq_rotation_encode",
    }
)

# SURVEY §2B families for never-checked keys not in RISK_ORDER (i.e.
# anything added after the risk triage), most core first.
CATEGORY_PRIORITY: tuple[str, ...] = (
    "similarity",
    "multimodal",
    "reference",
    "timeseries",
    "finance",
    "text",
    "rollup",
    "skew",
    "ops",
    "streaming",
    "relational",
    "windows",
    "sources",
    "udfs",
    "joins",
    "aggregates",
    "dedup",
    "functions",
)


def ordered_names() -> list[str]:
    cat_rank = {c: i for i, c in enumerate(CATEGORY_PRIORITY)}
    # Stable registration order within a category (dict order of QUERIES).
    reg_rank = {name: i for i, name in enumerate(QUERIES)}
    risk_rank = {name: i for i, name in enumerate(RISK_ORDER)}

    backlog_rank = {name: i for i, name in enumerate(BACKLOG_R6)}

    def key(name: str):
        spec = QUERIES[name]
        if name in RECHECK_FIRST:
            # listed order IS the priority (the tuple is ranked by
            # expected evidence value)
            return (0, RECHECK_FIRST.index(name), 0)
        if name not in DRIVER_SEEN:
            if name in DEFER_BEHIND_STALE_R14:
                # round-14 new keys: behind the r04 AND r05 stale
                # tiers so growth cannot eat a staleness-drain slot
                return (2, 5.5, cat_rank.get(spec.category, len(cat_rank)),
                        reg_rank[name])
            if name in DEFER_BEHIND_STALE_R13:
                # round-13 new keys: behind BOTH stale tiers (4.5
                # sorts after last_round<=4) so the exactly-budgeted
                # r13 drain (17 rechecks + 32 r03 keys) is untouched
                return (2, 4.5, cat_rank.get(spec.category, len(cat_rank)),
                        reg_rank[name])
            if name in DEFER_BEHIND_STALE:
                # round-12 new keys: behind the r02 staleness drain
                # (seen tier sorts by last round ascending, so 2.5
                # slots these between last_round<=2 and >=3)
                return (2, 2.5, cat_rank.get(spec.category, len(cat_rank)),
                        reg_rank[name])
            if name in backlog_rank:
                # the starved r6 backlog outranks every other unseen
                # key — one driver round clears it (then these become
                # seen and the gate above short-circuits)
                return (0.5, backlog_rank[name], 0)
            if name in risk_rank:
                return (1, risk_rank[name], 0)
            # unseen but untriaged (registered after the risk pass):
            # behind the triaged backlog, deferred new keys last
            tier = 1.5 if name in DEFER_NEW else 1.2
            return (
                tier,
                len(risk_rank) + cat_rank.get(spec.category, len(cat_rank)),
                reg_rank[name],
            )
        # Seen tier: OLDEST driver check first (round-7 verdict item 1 —
        # a category sort left r01-checked keys starved forever), then
        # category / registration order as stable tie-breaks.
        return (
            2,
            DRIVER_LAST_ROUND.get(name, 0),
            cat_rank.get(spec.category, len(cat_rank)),
            reg_rank[name],
        )

    return sorted(QUERIES, key=key)
