"""Driver-facing ordering of the query registry.

The external correctness driver walks ``__spark_entry__.queries()`` in
dict order and truncates after ~50 keys per round, so until every key
has been checked at least once we order the export so the
highest-evidence-value keys come first:

1. keys whose latest driver row FAILED and has since been fixed;
2. keys never seen by the driver, in SURVEY §2B category priority;
3. keys already driver-verified green (cheapest to lose to a cap).

``DRIVER_SEEN`` is derived at import time from the union of all
committed ``CORRECTNESS_r*.json`` artifacts at the repo root, so the
rotation can never go stale (the round-2 verdict's top finding was a
hand-maintained set that missed a round). ``_STATIC_SEEN`` is the
fallback when the artifacts are absent (e.g. a bare checkout of the
package without driver outputs).
"""

from __future__ import annotations

import json
from pathlib import Path

from bigdata_financial_reporting_spark.queries.registry import QUERIES

# Union of CORRECTNESS_r01+r02 keys — fallback only; the live set below
# re-reads every CORRECTNESS_r*.json so later rounds are picked up
# automatically.
_STATIC_SEEN: frozenset[str] = frozenset(
    {
        "agg_approx_count_distinct", "agg_approx_quantiles",
        "agg_collect_sorted", "agg_corr_covar", "agg_count_distinct",
        "agg_cube", "agg_global", "agg_grouping_sets", "agg_histogram",
        "agg_median_percentile", "agg_min_by_max_by", "agg_pivot",
        "agg_rollup", "agg_stats", "agg_unpivot", "dedup_clusters",
        "dedup_embedding_cosine", "dedup_exact", "dedup_exact_groups",
        "dedup_minhash_pairs", "dedup_ngram_jaccard", "dedup_simhash",
        "fn_array", "fn_array_explode", "fn_date", "fn_decimal_money",
        "fn_explode_outer", "fn_hash", "fn_json", "fn_map", "fn_math",
        "fn_nondeterministic_ids", "fn_string", "fn_struct", "join_anti",
        "join_asof", "join_broadcast_dims", "join_cross",
        "join_full_outer", "join_fuzzy_levenshtein", "join_inner",
        "join_interval_containment", "join_left_outer", "join_null_safe",
        "join_right_outer", "join_semi", "join_theta", "tpch_q1",
        "tpch_q3_shape", "tpch_q5_shape",
        # r02 additions
        "select_prune", "derived_column", "rename_drop", "filter_range",
        "filter_in_like_null", "boolean_combinators", "case_when_coalesce",
        "null_fill_drop", "cast_types", "distinct_pairs",
        "dropdup_keys_pinned", "sample_seeded", "sample_stratified",
        "winsorize_by_group", "sort_multi_key_limit", "limit_offset",
        "topk_per_group", "union_all_distinct", "intersect_except",
        "window_lag_lead", "window_rank_family", "window_running_agg",
        "window_sliding_frame", "window_range_frame", "window_first_last",
        "window_global_small", "window_moving_avg", "src_parquet_scan",
        "src_csv_roundtrip", "src_json_roundtrip", "src_csv_single_file",
        "src_parquet_partitioned", "src_in_memory",
        "src_split_export_roundtrip", "udf_scalar_python",
        "udf_pandas_scalar", "udf_pandas_grouped_agg",
        "udf_apply_in_pandas", "udf_map_in_pandas", "udf_sql_registered",
        "udtf_split_events", "join_self", "text_tokenize",
        "text_token_counts", "text_tfidf", "text_bigrams",
        "text_quality_census",
    }
)


def _seen_from_artifacts() -> frozenset[str]:
    """Union of keys across all CORRECTNESS_r*.json at the repo root."""
    root = Path(__file__).resolve().parents[2]
    seen: set[str] = set()
    found = False
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            seen.update(rows)
            found = True
    return frozenset(seen) if found else _STATIC_SEEN


DRIVER_SEEN: frozenset[str] = _seen_from_artifacts()

# Keys whose latest driver row was an ERROR and have since been fixed
# (round 4): the 2 array-column canon crashes (now serialized) and the
# 9 structural `oracle=None` errs (all converted to exact oracles —
# hash-Bernoulli sampling, neutral-hash simhash/LSH planes, unrolled
# Lloyd CTEs for IVF, tolerance witnesses for the approx aggregates,
# invariant outputs for the id functions). Clear once green in a
# CORRECTNESS artifact.
RECHECK_FIRST: tuple[str, ...] = (
    "sim_quantize_int8",
    "sim_centroid_per_label",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_ivf_trained_topk",
    "dedup_simhash",
    "sample_seeded",
    "sample_stratified",
    "agg_approx_quantiles",
    "agg_approx_count_distinct",
    "fn_nondeterministic_ids",
)

# Keys added AFTER the round's rotation was sized: rank new arrivals
# behind the existing never-checked backlog so the driver's ~50-key
# budget clears the backlog first (the new keys carry fresh
# local-oracle evidence and get their driver row next round). The 16
# round-3 additions left this set at the start of round 4 — they ARE
# the backlog now; round-4 additions go here.
DEFER_NEW: frozenset[str] = frozenset(
    {
        "sim_random_projection",
        "sim_embedding_outliers",
        "sample_weighted_topk",
        "sample_per_stratum_topk",
        "text_token_entropy",
        "batch_length_buckets",
        "text_bigram_logprob",
        "text_distinctive_ngrams",
        "ts_event_rate_anomaly",
        "tpch_q4_shape",
        "tpch_q7_shape",
        "agg_equidepth_histogram",
        "window_ntile_quartiles",
        "ops_scd2_build",
        # round-4 session additions
        "fin_ohlc_bars",
        "fin_vwap",
        "fin_drawdown",
        "fin_ema_window",
        "fin_gapfill_interpolate",
        "fin_beta_market",
        "tpch_q17_shape",
        "tpch_q2_shape",
        "agg_filtered_conditional",
        "agg_bool_bitwise",
        "agg_mode_per_group",
        "agg_weighted_median",
        "window_longest_streak",
        "text_chunk_overlap",
        "text_length_band_filter",
        "text_quality_logreg",
        "src_schema_evolution_merge",
        "src_bucketed_colocated_join",
        "emb_covariance_matrix",
        "ops_zorder_layout",
        "fn_variant_json",
        "fn_collated_groupby",
        "fn_listagg_within_group",
        "agg_bitmap_distinct",
        "join_lateral_topn",
        "udf_arrow_optimized_scalar",
        "src_python_datasource",
        "agg_hll_sketch_mergeable",
        "fn_try_arithmetic",
        "sql_pipe_syntax",
        "sql_session_variables",
        "udf_sql_function",
        "ops_incremental_rollup_refresh",
        "fin_rsi_window",
        "fin_bollinger_bands",
        "fin_sharpe_by_instrument",
        "fin_return_corr_pairs",
        "text_keywords_tfidf_topk",
        "text_collocations_pmi",
        "sim_maxdot_topk",
        "sim_euclidean_topk",
        "ts_calendar_features",
        "mm_ahash_dedup_groups",
        "fn_url_parse",
        "fn_xml_xpath",
        "fn_higher_order_maps",
        "window_distinct_count_frame",
        "ts_autocorrelation",
        "ts_minmax_downsample",
        "agg_regression_family",
        "split_kfold",
        "dedup_bloom_prefilter",
        "dedup_chunk_lines",
        "agg_countmin_heavy_hitters",
        "sql_recursive_cte_spine",
        "text_pagerank_keywords",
        "tpch_q8_shape",
        "tpch_q10_shape",
        "tpch_q14_shape",
        "tpch_q16_shape",
        "tpch_q19_shape",
        "src_text_lines_roundtrip",
        "ops_cdc_apply",
        "fn_regex_family",
        "pipeline_pretrain_end2end",
        "ts_mann_kendall_trend",
        "ts_changepoint_cusum",
        "agg_benford_digits",
        "text_zipf_fit",
        "agg_gini_coefficient",
        "fin_hhi_concentration",
        "ts_theil_sen_slope",
        "agg_welch_ttest",
        "agg_chi2_independence",
        "fin_var_expected_shortfall",
        "agg_ks_twosample",
        "agg_subsample_ci",
        "src_csv_corrupt_handling",
        "mm_audio_rms_windows",
        "join_point_in_time_scd2",
        "window_hampel_outliers",
        "stream_content_dedup",
        "udf_map_in_arrow",
        "agg_crosstab_stat",
        "union_by_name_missing",
        "fn_exists_forall_filterpos",
        "src_file_metadata_column",
        "ref_report_bundle",
        "fn_bitwise_family",
        "ops_time_travel_versions",
    }
)

# SURVEY §2B families the driver has never checked, most core first.
# After round 2 the unseen remainder is: similarity (8), multimodal (5),
# streaming (9), timeseries (5), reference (4), text (8 incl. split/
# quality), rollup (1), skew (2), ops (2) = 45 keys — all fit in one
# 50-key driver budget, so the intra-category order matters little.
CATEGORY_PRIORITY: tuple[str, ...] = (
    "similarity",    # §2B.9 ANN/cosine — zero driver rows so far
    "multimodal",    # §2B.9 binary columns — zero driver rows
    "reference",     # §2A pipeline parity
    "timeseries",
    "finance",       # market-data rollups (round-4 additions)
    "text",          # remaining §2B.9 text ops
    "rollup",
    "skew",
    "ops",
    "streaming",     # rows-only checks (no oracle)
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

    def key(name: str):
        spec = QUERIES[name]
        if name in RECHECK_FIRST:
            # listed order IS the priority (the tuple is ranked by
            # expected evidence value)
            return (0, RECHECK_FIRST.index(name), 0)
        if name in DEFER_NEW and name not in DRIVER_SEEN:
            tier = 1.5
        elif name not in DRIVER_SEEN:
            tier = 1
        else:
            tier = 2
        return (tier, cat_rank.get(spec.category, len(cat_rank)), reg_rank[name])

    return sorted(QUERIES, key=key)
