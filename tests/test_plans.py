"""Plan-shape tests (scale posture, SURVEY.md §7.4): the 100 TB
properties live in the physical plan — broadcasts for small dims,
filters pushed into scans, column pruning, bounded shuffle counts.
Timings at sf0.01 can't see these; the plan can."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_hash_join,
    physical_plan,
    plan_report,
    pushed_filters,
    scan_read_schema,
)
from bigdata_financial_reporting_spark.queries import QUERIES
from bigdata_financial_reporting_spark.sources.catalog import load_table

import pytest


@pytest.fixture(autouse=True)
def _fresh_plans(spark):
    """Plan pins measure the STANDALONE plan of each query. A test that
    ran earlier in the session may have left operator persists alive
    (e.g. fin_beta_market's daily panel), and Spark's cache manager
    substitutes any semantically-matching sub-plan with the
    InMemoryRelation — changing exchange counts and making the pins
    order-dependent. Clearing is safe here: no returned plan from a
    previous test is materialized after this point (the cache contract
    in operators/cache.py), and each test builds its DataFrame fresh."""
    from bigdata_financial_reporting_spark.operators.cache import (
        release_operator_caches,
    )

    release_operator_caches()
    spark.catalog.clearCache()


def test_small_dims_are_broadcast(spark, sf_dir):
    """region/nation/customer joins must broadcast, never shuffle the
    fact side."""
    df = QUERIES["join_broadcast_dims"].fn(spark, sf_dir)
    assert has_broadcast_hash_join(df)
    r = plan_report(df)
    assert not r["sort_merge_join"], "dim join degraded to sort-merge"
    # the only shuffle allowed is the final aggregation
    assert r["exchanges"] <= 1


def test_filters_reach_the_scan(spark, sf_dir):
    df = QUERIES["filter_range"].fn(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_quantity" in pf


def test_projection_prunes_scan_columns(spark, sf_dir):
    """A 2-column projection must not read lineitem's 16 columns."""
    df = QUERIES["select_prune"].fn(spark, sf_dir)
    cols = scan_read_schema(df)
    assert 0 < len(cols) <= 4, f"scan reads too many columns: {cols}"


def test_single_shuffle_for_partitioned_window(spark, sf_dir):
    """Per-key window = exactly one hash exchange; the reference's
    global window (1-partition collapse) must not reappear."""
    df = QUERIES["ref_per_user_returns"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert "SinglePartition" not in physical_plan(df)


def test_global_window_is_flagged_single_partition(spark, sf_dir):
    """The compatibility query ref_daily_returns IS the known
    single-partition shape — pin that so the distinction stays
    deliberate and documented."""
    df = QUERIES["ref_daily_returns"].fn(spark, sf_dir)
    assert "SinglePartition" in physical_plan(df)


def test_scalable_global_lag_avoids_single_partition(spark, sf_dir):
    """The scalable rewrite of the global window must not contain the
    1-task collapse it exists to avoid."""
    df = QUERIES["ref_daily_returns_scalable"].fn(spark, sf_dir)
    assert "SinglePartition" not in physical_plan(df)
    assert "rangepartitioning" in physical_plan(df)


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """CartesianProduct (unbroadcast cross join) is never acceptable;
    bounded cross joins must ride a broadcast."""
    for name, spec in QUERIES.items():
        if spec.category == "streaming":
            continue
        df = spec.fn(spark, sf_dir)
        assert "CartesianProduct" not in physical_plan(df), name


def test_no_rowbased_python_udfs_outside_udf_family(spark, sf_dir):
    """Python-in-the-row-path is quarantined to the explicit UDF
    queries; every other operator must stay JVM-side."""
    for name, spec in QUERIES.items():
        if spec.category in ("udf", "streaming") or name.startswith("udf_"):
            continue
        if name.startswith("mm_"):  # multimodal codecs are pandas UDFs by design
            continue
        r = plan_report(spec.fn(spark, sf_dir))
        assert not r["rowbased_python_udf"], f"{name} fell back to row-based Python"


def test_tpch_q5_broadcasts_dim_chain(spark, sf_dir):
    """Q5's region->nation->supplier chain must ride broadcasts; only
    the fact-side joins and the final agg may shuffle."""
    df = QUERIES["tpch_q5_shape"].fn(spark, sf_dir)
    r = plan_report(df)
    assert r["broadcast_hash_join"]
    assert not r["cartesian"]
    assert r["exchanges"] <= 4


def test_tfidf_df_join_is_broadcast(spark, sf_dir):
    """The document-frequency table is vocabulary-sized -> must
    broadcast at any corpus scale."""
    assert has_broadcast_hash_join(QUERIES["text_tfidf"].fn(spark, sf_dir))


def test_partition_pruning_on_partitioned_parquet(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune directories, not
    scan-and-filter: the scan's PartitionFilters carries the predicate
    and the non-matching partitions are never listed as input."""
    import os

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = os.path.join(str(tmp_path), "ev_part")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)

    df = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = physical_plan(df, mode="formatted")
    assert "PartitionFilters" in plan
    # the partition predicate must be IN PartitionFilters, not a
    # post-scan Filter on data
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("2024-01-05" in l or "isnotnull(day" in l for l in pf), pf
    n = df.count()
    assert n > 0


def test_exchange_budgets(spark, sf_dir):
    """Shuffle-count ceilings for the heavy pipelines: a regression that
    adds an exchange shows up here before it shows up at 100 TB."""
    budgets = {
        "tpch_q1": 1,
        "agg_rollup": 1,
        "window_moving_avg": 1,
        "topk_per_group": 1,
        "dedup_exact": 1,
        "text_token_counts": 1,
        # the persisted shingle frame feeds 3 consumers, each with its
        # own partitioning — exchanges read from cache, not from scans.
        # 13 since round 2: the exact re-check joins are merge-hinted
        # (the STATIC plan shows shuffle exchanges where broadcasts
        # used to be) because the planner's size estimate for the
        # array-payload signature frame invited a driver OOM at a 10x
        # scale-up; AQE still promotes them to broadcast at runtime
        # when the actual size allows (see SCALING.md).
        "dedup_minhash_pairs": 13,
        "text_tfidf": 3,
    }
    # a populated cache swaps scans for InMemoryTableScan with different
    # (sometimes additional) exchanges — pin the cold-plan shape
    spark.catalog.clearCache()
    for name, budget in budgets.items():
        df = QUERIES[name].fn(spark, sf_dir)
        n = count_exchanges(df)
        assert n <= budget, f"{name}: {n} exchanges > budget {budget}"


def test_runtime_bloom_filter_available_for_selective_joins(spark, sf_dir):
    """At 100 TB, Spark injects a runtime bloom filter on the probe
    side of a selective shuffle join (runtime.bloomFilter.enabled,
    kept ON by the engine's sessions). The fixture scan never crosses
    the 10 GB application-side threshold, so force the threshold to 0
    to pin the PLAN SHAPE the production scan sizes would get: a
    bloom_filter_agg built from the filtered dim keys, applied to the
    fact scan side."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    thresh_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_thresh = spark.conf.get(thresh_key)
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(thresh_key, "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        assert "bloom_filter_agg" in physical_plan(j)
    finally:
        spark.conf.set(thresh_key, old_thresh)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)


def test_round3_text_op_plan_shapes(spark, sf_dir):
    """Plan discipline for the round-3 text operators: redaction is a
    pure scan->project (zero exchanges, doc_id filter pushed);
    repetition scoring is one shingle pipeline + bounded aggregation
    shuffles; contamination joins without cartesian and with bounded
    exchanges (shingle frame persisted -> exchanges read from cache)."""
    spark.catalog.clearCache()
    redact = QUERIES["text_redact"].fn(spark, sf_dir)
    assert count_exchanges(redact) == 0
    assert "doc_id" in " ".join(pushed_filters(redact))

    rep = QUERIES["text_repetition_score"].fn(spark, sf_dir)
    assert count_exchanges(rep) <= 3  # window partition + final agg
    assert "CartesianProduct" not in physical_plan(rep)

    cont = QUERIES["split_contamination"].fn(spark, sf_dir)
    plan = physical_plan(cont)
    assert "CartesianProduct" not in plan
    assert count_exchanges(cont) <= 6

    from bigdata_financial_reporting_spark.operators.cache import (
        release_operator_caches,
    )

    release_operator_caches()


def test_multitable_lsh_plan_has_no_cartesian_and_bounded_shuffles(spark, sf_dir):
    """The multi-table candidate join must ride (tbl, bkt) equi-joins,
    never a cartesian; the signature computation is two aggregations
    and the vector rejoin is hash/merge."""
    df = QUERIES["sim_lsh_topk"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert count_exchanges(df) <= 10


def test_global_shuffle_ranks_in_static_buckets(spark, sf_dir):
    """text_global_shuffle must rank inside the static hash-prefix
    buckets — one data shuffle, no range-partition sampling, offsets
    joined by broadcast. The only SinglePartition exchange allowed is
    the 256-row offsets branch, which is why the data-side window must
    be keyed on the bucket."""
    df = QUERIES["text_global_shuffle"].fn(spark, sf_dir)
    p = physical_plan(df)
    assert "rangepartitioning" not in p
    assert "windowspecdefinition(__b" in p
    assert has_broadcast_hash_join(df)


def test_vocab_coverage_uses_take_ordered(spark, sf_dir):
    """The top-100 must come out via TakeOrdered (per-partition heads)
    — a global Sort of the vocabulary would shuffle every distinct
    token to one task."""
    df = QUERIES["text_vocab_coverage"].fn(spark, sf_dir)
    p = physical_plan(df)
    assert "TakeOrderedAndProject" in p


def test_unigram_logprob_model_join_is_not_cartesian(spark, sf_dir):
    """Scoring joins tokens to the unigram model on the token key; the
    1-row (total, vocab) frame rides a broadcast."""
    df = QUERIES["text_unigram_logprob"].fn(spark, sf_dir)
    p = physical_plan(df)
    assert "CartesianProduct" not in p
    assert count_exchanges(df) <= 6


def test_winnow_fingerprint_is_single_projection(spark, sf_dir):
    """Winnowing is per-row arithmetic: scan -> one codegen projection,
    zero exchanges. Any shuffle appearing here means the rolling hash
    was accidentally reformulated as a join or window."""
    df = QUERIES["text_winnow_fingerprint"].fn(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_dynamic_partition_pruning_from_dim_join(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: when the partition column is joined
    to a FILTERED small dimension, the fact scan must receive a
    runtime `dynamicpruning` subquery filter instead of reading every
    partition — at 100 TB this is the difference between scanning one
    date's directories and scanning the lake. Static pruning (above)
    can't cover this case because the qualifying keys are only known
    after the dim filter runs."""
    import os

    ev = load_table(spark, sf_dir, "events").withColumn(
        "etype", F.col("event_type")
    )
    path = os.path.join(str(tmp_path), "ev_dpp")
    ev.write.partitionBy("etype").mode("overwrite").parquet(path)

    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 1.0), ("purchase", 9.9)],
        "etype string, weight double",
    ).filter(F.col("weight") > 5)  # selects only 'purchase'
    joined = fact.join(dim, "etype").groupBy("etype").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = physical_plan(joined, mode="formatted")
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = joined.collect()
    assert [r["etype"] for r in rows] == ["purchase"]


def test_banded_range_join_is_an_equi_join(spark, sf_dir):
    """The pure-range containment query must ride the band-bucket
    EQUI join — never BroadcastNestedLoopJoin (needs a small side) or
    CartesianProduct (quadratic). This is the property that makes it a
    large-to-large join at 100 TB."""
    df = QUERIES["join_range_banded"].fn(spark, sf_dir)
    p = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
        "ShuffledHashJoin" in p
    )


def test_topk_per_group_prunes_map_side_before_exchange(spark, sf_dir):
    """topk_per_group (round-3 verdict item 4): the low-cardinality
    group key must NOT funnel the full table through |groups| tasks.
    Spark's WindowGroupLimit(Partial) prunes each map partition to k
    rows per group BEFORE the shuffle, so the exchange carries at most
    k x groups x partitions rows. Pin the Partial stage's position.
    (Round-4 measurements at sf0.1: this plan beats both the
    groupBy(group, pid)+slice two-phase (1.52s) and a broadcast
    kth-threshold prefilter (1.75s) — see SCALING.md 'Round-4'.)"""
    df = QUERIES["topk_per_group"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan, "partial top-k pushdown missing"
    # simple-mode explain prints the tree top-down (final stage first,
    # scan last): a node EXECUTING before the exchange prints BELOW it.
    partial_at = plan.index("Partial")
    exchange_at = plan.index("Exchange")
    assert partial_at > exchange_at, (
        "WindowGroupLimit Partial must execute BEFORE the exchange "
        "(map-side prune) — in top-down explain text it must print "
        "below the Exchange line; full rows would shuffle otherwise"
    )


def test_finance_rollups_are_single_shuffle(spark, sf_dir):
    """The market-data rollups (round 4) all key their windows AND
    their aggregations on the instrument id, so each is exactly one
    hash exchange — the shape that runs shuffle-free on a tick store
    bucketed by instrument."""
    for name in ["fin_ohlc_bars", "fin_vwap", "fin_drawdown", "fin_ema_window"]:
        df = QUERIES[name].fn(spark, sf_dir)
        n = count_exchanges(df)
        assert n == 1, f"{name}: {n} exchanges, expected 1"
        assert "SinglePartition" not in physical_plan(df)


def test_beta_market_broadcasts_the_market_series(spark, sf_dir):
    """The one-row-per-day market frame must broadcast to the daily
    panel — shuffling the panel against a ~30-row series would be the
    classic small-dim mistake at 100 TB."""
    df = QUERIES["fin_beta_market"].fn(spark, sf_dir)
    assert has_broadcast_hash_join(df)
    r = plan_report(df)
    assert not r["sort_merge_join"]
    assert count_exchanges(df) <= 4


def test_gapfill_spine_join_shares_instrument_partitioning(spark, sf_dir):
    """Gap-fill = spine explode + left join + two IGNORE-NULLS windows,
    all keyed on user_id; the windows must reuse the join's exchange
    rather than add their own."""
    df = QUERIES["fin_gapfill_interpolate"].fn(spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert "SinglePartition" not in physical_plan(df)


def test_decorrelated_subquery_shapes_broadcast_the_small_side(spark, sf_dir):
    """Q17/Q2 shapes: the correlated subquery decorrelates to a
    part-sized pre-aggregate that must BROADCAST back to the fact —
    re-shuffling lineitem against it would double the fact's network
    cost at 100 TB."""
    for name in ["tpch_q17_shape", "tpch_q2_shape"]:
        df = QUERIES[name].fn(spark, sf_dir)
        assert has_broadcast_hash_join(df), name
        assert count_exchanges(df) <= 2, name


def test_conditional_and_ordered_aggregates_are_single_shuffle(spark, sf_dir):
    """FILTER-clause aggregates, bitwise/bool rollups, the weighted
    median, and the streak pipeline all partial-aggregate map-side or
    reuse one key partitioning end-to-end."""
    for name in [
        "agg_filtered_conditional",
        "agg_bool_bitwise",
        "agg_weighted_median",
        "window_longest_streak",
    ]:
        df = QUERIES[name].fn(spark, sf_dir)
        n = count_exchanges(df)
        assert n == 1, f"{name}: {n} exchanges, expected 1"


def test_chunker_and_scorer_are_map_only(spark, sf_dir):
    """The chunker (sequence+explode) and the logreg scorer are pure
    per-row transforms: ZERO exchanges — at 100 TB they scale with
    input splits, not with cluster shuffle capacity."""
    for name in ["text_chunk_overlap", "text_quality_logreg"]:
        df = QUERIES[name].fn(spark, sf_dir)
        n = count_exchanges(df)
        assert n == 0, f"{name}: {n} exchanges, expected map-only"


def test_covariance_shuffle_carries_partials_not_rows(spark, sf_dir):
    """emb_covariance_matrix must shuffle only the per-partition
    partial Gram rows (#partitions x 2080), never the embedding rows:
    exactly one exchange, placed after the mapInPandas stage."""
    df = QUERIES["emb_covariance_matrix"].fn(spark, sf_dir)
    plan = physical_plan(df)
    n = count_exchanges(df)
    assert n == 1, f"{n} exchanges, expected 1"
    assert "MapInPandas" in plan
    # the exchange must be above (planned after) the Python stage:
    # in top-down explain text the Exchange line prints before it
    assert plan.index("Exchange") < plan.index("MapInPandas")


def test_zorder_key_is_pure_codegen(spark, sf_dir):
    """The Morton interleave must stay a JVM-side integer expression —
    no Python evaluation node anywhere in the plan."""
    df = QUERIES["ops_zorder_layout"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Python" not in plan and "MapInPandas" not in plan
    assert count_exchanges(df) == 1


def test_lateral_topn_decorrelates_to_window_not_nested_loop(spark, sf_dir):
    """The LATERAL correlated subquery must decorrelate into a ranked
    window + join — a nested-loop (per-customer re-scan of orders)
    would be quadratic at 100 TB."""
    df = QUERIES["join_lateral_topn"].fn(spark, sf_dir)
    p = physical_plan(df)
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "Window" in p
    assert count_exchanges(df) <= 2


def test_second_finance_batch_stays_instrument_keyed(spark, sf_dir):
    """RSI and Bollinger are single-shuffle stacked windows; Sharpe
    adds only the daily pre-aggregation; the basket correlation is
    bounded by the day-keyed self-join — none may collapse to a
    single partition."""
    budgets = {
        "fin_rsi_window": 1,
        "fin_bollinger_bands": 1,
        "fin_sharpe_by_instrument": 2,
        "fin_return_corr_pairs": 3,
    }
    for name, budget in budgets.items():
        df = QUERIES[name].fn(spark, sf_dir)
        n = count_exchanges(df)
        assert n <= budget, f"{name}: {n} exchanges > {budget}"
        assert "SinglePartition" not in physical_plan(df), name


def test_q8_q19_shapes_broadcast_all_dims(spark, sf_dir):
    """Q8's 8-table star and Q19's disjunctive join: every dimension
    must broadcast — a sort-merge on any dim means the fact table
    shuffles against kilobyte relations — and the fact-side conjuncts
    of Q19's OR must reach the lineitem scan."""
    df8 = QUERIES["tpch_q8_shape"].fn(spark, sf_dir)
    r8 = plan_report(df8)
    assert has_broadcast_hash_join(df8)
    assert not r8["sort_merge_join"] or r8["exchanges"] <= 3

    df19 = QUERIES["tpch_q19_shape"].fn(spark, sf_dir)
    assert has_broadcast_hash_join(df19)
    assert not plan_report(df19)["sort_merge_join"]
    pf = " ".join(pushed_filters(df19))
    assert "l_quantity" in pf or "l_partkey" in pf


def test_pq_encode_broadcasts_codebook(spark, sf_dir):
    """PQ encoding joins every (vector, subspace) slice against the
    codebook — the codebook (n_subspaces x n_codes rows) must
    broadcast; shuffling the corpus against a kilobyte relation is the
    classic 100 TB anti-pattern. Python never appears: the subspace
    slice + argmin is pure codegen over higher-order functions."""
    df = QUERIES["sim_pq_encode"].fn(spark, sf_dir)
    r = plan_report(df)
    assert r["broadcast_hash_join"]
    assert not r["cartesian"]
    assert not r["rowbased_python_udf"]
    assert r["exchanges"] <= 2, f"{r['exchanges']} exchanges"


def test_ivfpq_candidate_join_carries_codes_not_vectors(spark, sf_dir):
    """IVF-PQ ANN: centroids and codebook broadcast; the candidate
    join ships (id, cell, codes) only, so the exchange budget is fixed
    and the corpus' raw vectors never enter a shuffle. The probe-cell
    expansion is a broadcast nested loop over (queries x nprobe) —
    bounded — but a true cartesian over the corpus is forbidden."""
    df = QUERIES["sim_ivfpq_topk"].fn(spark, sf_dir)
    r = plan_report(df)
    assert r["broadcast_hash_join"]
    assert not r["cartesian"]
    assert r["exchanges"] <= 5, f"{r['exchanges']} exchanges"


def test_semdedup_self_join_is_cell_bounded(spark, sf_dir):
    """SemDeDup: centroid assignment broadcasts the centroids, and the
    near-dup self-join is keyed by cell — cost bounded by the largest
    cell, never all-pairs. No cartesian product may appear and the
    exchange count stays fixed as the corpus grows."""
    df = QUERIES["dedup_semantic_semdedup"].fn(spark, sf_dir)
    r = plan_report(df)
    assert not r["cartesian"]
    assert r["exchanges"] <= 6, f"{r['exchanges']} exchanges"


def test_hampel_window_stays_partitioned(spark, sf_dir):
    """The Hampel filter is one stacked window pass per instrument:
    exactly one exchange and never a global single-partition sort."""
    df = QUERIES["window_hampel_outliers"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert "SinglePartition" not in physical_plan(df)


def test_point_in_time_scd2_join_shape(spark, sf_dir):
    """The as-of SCD2 probe must plan as a broadcast range join with
    pushed validity filters — a sort-merge over the fact side against
    the small dimension history, or any nested re-scan, would dominate
    at scale."""
    df = QUERIES["join_point_in_time_scd2"].fn(spark, sf_dir)
    r = plan_report(df)
    assert r["broadcast_hash_join"] or r["broadcast_nested_loop"]
    assert not r["cartesian"]
    assert r["exchanges"] <= 1, f"{r['exchanges']} exchanges"


def test_time_travel_reads_manifest_file_list(spark, sf_dir):
    """Manifest time travel scans exactly the pinned file list as a
    plain parquet scan — no Python in the read path and a bounded
    exchange count (the version-diff aggregation)."""
    df = QUERIES["ops_time_travel_versions"].fn(spark, sf_dir)
    r = plan_report(df)
    assert not r["rowbased_python_udf"]
    assert not r["cartesian"]
    assert r["exchanges"] <= 2, f"{r['exchanges']} exchanges"


def test_round6_tpch_shapes_posture(spark, sf_dir):
    """Round-6 shapes: Q6 is the scan — every predicate must be a
    pushed filter feeding one 1-row aggregate exchange; Q9/Q12/Q20
    broadcast every dim with a single fact shuffle; the BPE merge step
    is pure codegen (no Python) with its pair explosion bounded by the
    distinct-word table, never the corpus."""
    r6 = plan_report(QUERIES["tpch_q6_shape"].fn(spark, sf_dir))
    assert r6["exchanges"] == 1 and not r6["cartesian"]
    assert len(r6["pushed_filters"]) >= 4  # date x2, discount band, qty
    for name in ("tpch_q9_shape", "tpch_q12_shape", "tpch_q20_shape"):
        r = plan_report(QUERIES[name].fn(spark, sf_dir))
        assert r["broadcast_hash_join"], name
        assert not r["sort_merge_join"], name
        assert not r["cartesian"], name
        assert r["exchanges"] <= 1, (name, r["exchanges"])
    bpe = QUERIES["text_bpe_merge_step"].fn(spark, sf_dir)
    rb = plan_report(bpe)
    assert not rb["rowbased_python_udf"] and "MapInPandas" not in physical_plan(bpe)
    assert rb["exchanges"] <= 2


def test_round10_extension_and_vectorized_posture(spark, sf_dir):
    """Round-10 posture pins (PLANS.md rows, committed this round):

    - ``stat_anova_two_way``: exact-integer factorial moments. The
      only joins are 1-row grand/marginal-total scalars (broadcast
      nested loop on a bounded side — never a cartesian of data
      rows); 8 bounded shuffles of constant-width partials.
    - ``sim_hnsw_upper_graph``: per-layer cap-guarded broadcast of the
      (geometrically thinned) layer membership + an exact-integer
      matmul top-k inside one mapInPandas pass — ZERO shuffles; the
      100 TB cost is the map-only scan.
    - The two arrow-vectorized hot paths keep their committed shuffle
      budgets: ``dedup_embedding_cosine`` (banded LSH, broadcast +
      merge-hinted re-check, ≤5 exchanges) and
      ``emb_kmeans_lloyd_step`` (one exchange of (cluster, pos)
      partials)."""
    anova = QUERIES["stat_anova_two_way"].fn(spark, sf_dir)
    pa = physical_plan(anova)
    assert count_exchanges(anova) <= 8
    assert "CartesianProduct" not in pa
    assert "BatchEvalPython" not in pa  # no row-Python

    hnsw = QUERIES["sim_hnsw_upper_graph"].fn(spark, sf_dir)
    ph = physical_plan(hnsw)
    assert count_exchanges(hnsw) == 0, "HNSW layer graph grew a shuffle"
    assert "MapInPandas" in ph  # the Arrow matmul pass, not row-Python
    assert "BatchEvalPython" not in ph

    cos = QUERIES["dedup_embedding_cosine"].fn(spark, sf_dir)
    assert count_exchanges(cos) <= 5
    assert has_broadcast_hash_join(cos)
    assert "CartesianProduct" not in physical_plan(cos)

    lloyd = QUERIES["emb_kmeans_lloyd_step"].fn(spark, sf_dir)
    assert count_exchanges(lloyd) <= 1
