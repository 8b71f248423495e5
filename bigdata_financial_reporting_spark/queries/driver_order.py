"""Driver-facing ordering of the query registry.

The external correctness driver walks ``__spark_entry__.queries()`` in
dict order and (round 1) truncated after the first 50 keys, leaving 86
queries with no correctness row. Until every key has been checked at
least once, order the export so the highest-evidence-value keys come
first:

1. keys whose round-1 row FAILED and has since been fixed (re-check);
2. keys never seen by the driver, in SURVEY §2B category priority;
3. keys already driver-verified green (cheapest to lose to a cap).

Update ``DRIVER_SEEN`` each round from the latest CORRECTNESS_r{N}.json
so the rotation converges: once all keys have rows, this degrades to a
stable category-priority order.
"""

from __future__ import annotations

from bigdata_financial_reporting_spark.queries.registry import QUERIES

# Keys with any CORRECTNESS_r01.json row (47 green/approx + 3 hash-fail).
DRIVER_SEEN: frozenset[str] = frozenset(
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
    }
)

# Round-1 hash fails, fixed this round — must be re-checked first.
RECHECK_FIRST: tuple[str, ...] = ("fn_date", "fn_math", "fn_decimal_money")

# SURVEY §2B families the driver has never checked, most core first.
CATEGORY_PRIORITY: tuple[str, ...] = (
    "relational",    # §2B.2 projection/filter + §2B.6 sort/limit/set
    "windows",       # §2B.5
    "sources",       # §2B.1 scans/sinks
    "udfs",          # §2B.8
    "joins",         # join_self (one key past round 1's cutoff)
    "text",          # §2B.9 text ops
    "similarity",    # §2B.9 ANN/cosine
    "multimodal",    # §2B.9 binary columns
    "reference",     # §2A pipeline parity
    "timeseries",
    "rollup",
    "skew",
    "ops",
    "streaming",     # rows-only checks (no oracle)
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
            tier = 0
        elif name not in DRIVER_SEEN:
            tier = 1
        else:
            tier = 2
        return (tier, cat_rank.get(spec.category, len(cat_rank)), reg_rank[name])

    return sorted(QUERIES, key=key)
