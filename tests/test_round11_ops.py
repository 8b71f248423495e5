"""Property tests for the round-11 registry extensions
(round-10 verdict item 3): the stream-stream LEFT OUTER interval
join, the trained-codebook IVF-PQ, and the streaming CDC MERGE sink.
Each key's oracle-hash parity is covered by test_oracle; these pin
the invariants the hash can't see — multi-batch equivalence, state
eviction actually emitting null rows, merge order-independence, and
training actually helping the ADC ranking.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries import QUERIES
from bigdata_financial_reporting_spark.sources.catalog import load_table


def _stage_events(spark, sf_dir, tmp_path, n_parts):
    """Write the events fixture as an n-part directory fixture so the
    file stream replays it as n micro-batches under
    maxFilesPerTrigger=1 (single-file fixtures drain in one batch,
    which can't catch cross-batch watermark bugs)."""
    staged_root = os.path.join(str(tmp_path), "sfstaged")
    os.makedirs(staged_root, exist_ok=True)
    load_table(spark, sf_dir, "events").repartition(n_parts).write.mode(
        "overwrite"
    ).parquet(os.path.join(staged_root, "events.parquet"))
    return staged_root


def test_stream_left_outer_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    """The docstring's central claim, exercised for real: with the
    fixture carved into 4 micro-batches, the availableNow drain of the
    LEFT OUTER interval join equals the batch left join EXACTLY —
    including the null rows that only exist because watermark-driven
    state eviction fired, and including unmatched views from the LAST
    interval before the cutoff (the rows a filter-before-watermark
    construction would silently swallow)."""
    staged = _stage_events(spark, sf_dir, tmp_path, 4)

    res = QUERIES["stream_stream_left_outer"].fn(spark, staged)
    got = sorted(
        (r["user_id"], r["view_id"], r["click_id"]) for r in res.collect()
    )

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(
        (F.col("event_type") == "view") & (F.col("ts") < "2024-01-05")
    ).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = ev.filter(
        (F.col("event_type") == "click") & (F.col("ts") < "2024-01-05")
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    batch = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "left_outer",
    ).select(F.col("v_user").alias("user_id"), "view_id", "click_id")
    want = sorted(
        (r["user_id"], r["view_id"], r["click_id"]) for r in batch.collect()
    )
    assert got == want

    # the join is genuinely outer on this fixture: some views have no
    # click within 2h, and among them some sit in the final 3h before
    # the cutoff — the exact rows the watermark-ordering contract
    # protects (they'd be missing if the watermark froze at the cutoff)
    nulls = [r for r in got if r[2] is None]
    assert nulls, "fixture produced no unmatched views — test is vacuous"
    last_interval_nulls = [
        r
        for r in res.filter(F.col("click_id").isNull())
        .join(
            v.select(F.col("view_id"), "v_ts"),
            "view_id",
        )
        .filter(F.col("v_ts") >= "2024-01-04 21:00:00")
        .collect()
    ]
    assert last_interval_nulls, (
        "no unmatched views in the final interval before the cutoff — "
        "the eviction-ordering contract isn't being exercised"
    )


def test_stream_cdc_merge_is_batch_order_independent(spark, sf_dir):
    """The MERGE's order-independence invariant: folding the commit
    batches in REVERSE (and interleaved) order through the same
    tombstone-retaining merge gives the identical final snapshot,
    because each key keeps its max-(version, op)-ranked row including
    deletes until read-out. This is what makes the streaming key's
    result independent of the micro-batch carve-up."""
    from bigdata_financial_reporting_spark.queries.ops_tools import (
        cdc_change_log,
    )

    frames = [df for _, df in cdc_change_log(spark, sf_dir)]
    rn = F.row_number().over(
        Window.partitionBy("k").orderBy(F.desc("version"), "op")
    )

    def fold(order):
        snap = None
        for i in order:
            cur = frames[i] if snap is None else snap.unionByName(frames[i])
            snap = cur.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
        return sorted(
            (r["k"], r["version"], r["acctbal"])
            for r in snap.filter(F.col("op") != "D").collect()
        )

    forward = fold([0, 1, 2])
    reverse = fold([2, 1, 0])
    interleaved = fold([1, 2, 0])
    assert forward == reverse == interleaved

    # and the registry key (file-stream + foreachBatch) lands on the
    # same snapshot as the pure fold
    streamed = sorted(
        (r["custkey"], r["version"], r["acctbal"])
        for r in QUERIES["stream_cdc_upsert_sink"].fn(spark, sf_dir).collect()
    )
    rounded = sorted(
        (k, v, round(a, 4) if a is not None else None) for k, v, a in forward
    )
    assert streamed == rounded


def test_stream_cdc_deletes_stay_dead_and_inserts_survive(spark, sf_dir):
    """Semantic spot-checks on the snapshot: every deleted key is
    absent even though it also has version-1/2 rows in the log (the
    tombstone can't be revived), and every synthetic negative-key
    insert survives at version 2."""
    res = QUERIES["stream_cdc_upsert_sink"].fn(spark, sf_dir)
    rows = {r["custkey"]: r for r in res.collect()}
    c = load_table(spark, sf_dir, "customer")
    deleted = [
        r["c_custkey"]
        for r in c.filter(F.col("c_custkey") % 17 == 0).collect()
    ]
    assert deleted and all(k not in rows for k in deleted)
    inserted = [
        -(r["c_custkey"] + 1)
        for r in c.filter(F.col("c_custkey") % 23 == 0).collect()
    ]
    assert inserted and all(
        rows[k]["version"] == 2 and rows[k]["acctbal"] == 999.0
        for k in inserted
    )
    # updated keys carry version 2 with the +100 balance
    upd = [
        (r["c_custkey"], r["c_acctbal"])
        for r in c.filter(
            (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 17 != 0)
        ).collect()
    ]
    assert upd and all(
        rows[k]["version"] == 2
        and abs(rows[k]["acctbal"] - round(bal + 100.0, 4)) < 1e-9
        for k, bal in upd
    )


def test_ivfpq_trained_key_shape_recall_and_determinism(spark, sf_dir):
    """The trained-codebook registry key: (1) every query emits
    exactly k=10 rows ranked 1..10; (2) reruns are bit-identical
    (the trained book is deterministic, so the whole pipeline is);
    (3) every emitted adc_d2 matches an INDEPENDENT numpy recompute
    of encode-then-ADC under the trained book — the scoring path
    (subspace argmin, table lookup, in-order fold) re-derived outside
    Spark/DuckDB entirely. (Neither cosine recall nor mean |ADC -
    true_d2| is asserted to beat the degenerate book: training
    optimizes RECONSTRUCTION MSE — pinned in
    test_trained_pq_codebook_beats_degenerate — and on unnormalized
    random vectors mean-reconstruction biases ADC low, so both
    derived metrics measurably worsen: recall 0.36 vs 0.44, error
    0.58 vs 0.35. Only the 0.3 recall floor applies.)"""
    from bigdata_financial_reporting_spark.operators.similarity import (
        cosine_topk,
    )

    spec = QUERIES["sim_ivfpq_trained_topk"]
    rows = spec.fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2, 3, 4}
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, 11))

    rerun = spec.fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rerun))

    e = load_table(spark, sf_dir, "embeddings")
    import numpy as np

    from bigdata_financial_reporting_spark.operators.similarity import (
        train_pq_codebook,
    )

    evs = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]]) for r in e.collect()
    )
    ids = [i for i, _ in evs]
    X = np.array([v for _, v in evs])
    n_sub, sub = 8, X.shape[1] // 8

    def book_matrix(cb_rows):
        # (s, code) -> sub_dim entry, from full-dim zero-padded rows
        B = np.zeros((n_sub, 16, sub))
        for r in cb_rows:
            B[r["s"]][r["code"]] = r["cv"][r["s"] * sub : (r["s"] + 1) * sub]
        return B

    trained_B = book_matrix(
        train_pq_codebook(e, "vec_id", "embedding", 8, 16, iterations=2).collect()
    )
    # independent recompute: encode every corpus vector under the
    # trained book (argmin d2 per subspace, ties to the lower code =
    # numpy's first-minimum), then ADC = sum of per-subspace d2
    # between the query's subvector and the neighbor's code entry
    recon = np.zeros_like(X)
    for s in range(n_sub):
        xs = X[:, s * sub : (s + 1) * sub]
        d2 = ((xs[:, None, :] - trained_B[s][None, :, :]) ** 2).sum(axis=2)
        recon[:, s * sub : (s + 1) * sub] = trained_B[s][d2.argmin(axis=1)]
    pos = {i: ids.index(i) for i in range(5)}
    for r in rows:
        qv = X[pos[r["query_id"]]]
        adc_ref = float(((qv - recon[ids.index(r["neighbor_id"])]) ** 2).sum())
        assert abs(r["adc_d2"] - adc_ref) < 1e-5, (
            r["query_id"],
            r["neighbor_id"],
            r["adc_d2"],
            adc_ref,
        )

    # cosine-ground-truth recall floor shared with the degenerate key
    q = e.filter(F.col("vec_id") < 5)
    exact = {}
    for r in cosine_topk(q, e, "vec_id", "vec_id", k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    denom = sum(len(v) for v in exact.values())
    hits = sum(
        1 for r in rows if r["neighbor_id"] in exact.get(r["query_id"], set())
    )
    assert hits / denom >= 0.3, f"trained IVF-PQ recall {hits / denom:.2f}"


def test_tdigest_structure_and_quantile_error(spark, sf_dir):
    """The digest's defining properties, asserted from the emitted
    clusters: (1) counts cover the corpus exactly; (2) clusters tile
    the value axis (ordered_ok everywhere); (3) the rational scale
    function actually concentrates resolution at the tails — the
    extreme clusters hold strictly fewer rows than the median
    cluster; (4) rank-space accuracy: any quantile estimated from
    cluster counts is off by at most the containing cluster's count,
    and for q=0.01/0.99 that bound is a tiny corpus fraction."""
    rows = sorted(
        QUERIES["agg_tdigest_quantiles"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    n_total = sum(r["n_rows"] for r in rows)
    exact_n = load_table(spark, sf_dir, "lineitem").count()
    assert n_total == exact_n
    assert all(r["ordered_ok"] for r in rows)
    by_bucket = {r["bucket"]: r for r in rows}
    median_n = max(
        by_bucket[b]["n_rows"] for b in (49, 50) if b in by_bucket
    )
    assert by_bucket[0]["n_rows"] < median_n
    assert by_bucket[max(by_bucket)]["n_rows"] < median_n
    # tail quantile error bound: the cluster containing rank q*N holds
    # <= ~N*dq rows where dq is the scale function's inverse width —
    # for q=0.01 the covering clusters (k(0.01)..) are < 1% of N each
    for q in (0.01, 0.99):
        target = q * n_total
        cum = 0
        for r in rows:
            cum += r["n_rows"]
            if cum >= target:
                assert r["n_rows"] <= 0.02 * n_total, (
                    q,
                    r["bucket"],
                    r["n_rows"],
                )
                break
    # value-space sanity: cluster means sit inside [lo, hi]
    for r in rows:
        mean = r["sum_price"] / r["n_rows"]
        assert r["lo"] - 1e-9 <= mean <= r["hi"] + 1e-9
