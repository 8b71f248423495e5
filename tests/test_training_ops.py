"""Invariant tests for the round-3 training-pipeline queries
(SURVEY.md §5.5 discipline): properties that must hold beyond the
oracle's value equality — permutation totality, probability-simplex
sums, monotonicity of temperature resampling, packing coverage.
The oracle gate proves the numbers match SQL; these prove the numbers
mean what the docstrings claim."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_global_shuffle_is_a_permutation(spark, sf_dir):
    """Positions are exactly 1..N (no gaps, no dups) and stable across
    two independent evaluations — the epoch-reproducibility contract."""
    a = _rows(spark, sf_dir, "text_global_shuffle")
    assert sorted(r["pos"] for r in a) == list(range(1, len(a) + 1))
    b = _rows(spark, sf_dir, "text_global_shuffle")
    assert {r["doc_id"]: r["pos"] for r in a} == {
        r["doc_id"]: r["pos"] for r in b
    }


def test_temperature_mixing_simplex_and_monotonicity(spark, sf_dir):
    """Natural shares and resampling weights each sum to 1; epochs
    (weight/share) decrease as natural share grows — temperature < 1
    up-samples rare sources and down-samples dominant ones, by
    construction p^(alpha-1) is monotone decreasing in p."""
    rows = _rows(spark, sf_dir, "mix_temperature_sample")
    assert math.isclose(sum(r["natural_share"] for r in rows), 1.0, abs_tol=1e-4)
    assert math.isclose(sum(r["weight"] for r in rows), 1.0, abs_tol=1e-4)
    by_share = sorted(rows, key=lambda r: r["natural_share"])
    epochs = [r["epochs"] for r in by_share]
    assert all(a >= b - 1e-9 for a, b in zip(epochs, epochs[1:]))


def test_pack_sequences_covers_the_stream(spark, sf_dir):
    """Per source: pack ids start at 0, are non-decreasing in doc_id
    order, and the last document's windows reach exactly
    ceil(total_tokens / 512) — no token is left unpacked and no empty
    trailing window is claimed."""
    rows = _rows(spark, sf_dir, "text_pack_sequences")
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        assert docs[0]["pack_id"] == 0, source
        packs = [r["pack_id"] for r in docs]
        assert packs == sorted(packs), source
        total = sum(r["n_tokens"] for r in docs)
        last = next(r for r in reversed(docs) if r["n_tokens"] > 0)
        assert last["pack_id"] + last["n_windows"] == math.ceil(total / 512.0), source


def test_source_overlap_is_bounded_and_total(spark, sf_dir):
    """One row per unordered source pair; jaccard in [0, 1]."""
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    rows = _rows(spark, sf_dir, "text_source_overlap")
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in rows)
    assert all(r["source_a"] < r["source_b"] for r in rows)


def test_unigram_logprob_rare_tokens_score_higher(spark, sf_dir):
    """Scores are positive, and the doc with the rarest average tokens
    scores above the corpus mean — the signal the filter sorts on."""
    rows = _rows(spark, sf_dir, "text_unigram_logprob")
    scores = [r["avg_neg_logp"] for r in rows]
    assert all(s > 0 for s in scores)
    assert max(scores) > sum(scores) / len(scores)


def test_incremental_dedup_statuses_partition_the_batch(spark, sf_dir):
    """Every batch doc gets exactly one status; the synthetic re-crawl
    construction guarantees all three statuses occur (50 corpus
    re-crawls, 20 batch re-crawls)."""
    rows = _rows(spark, sf_dir, "dedup_incremental")
    from collections import Counter

    c = Counter(r["status"] for r in rows)
    assert c["dup_of_corpus"] >= 50
    assert c["dup_in_batch"] >= 20
    assert c["new"] > 0
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_survivor_quality_keeps_max_token_member(spark, sf_dir):
    """Each emitted survivor carries its cluster's MAXIMUM token count
    (checked against an independent per-cluster max over the clusters
    frame — regressing the ranking to min-token or min-id fails here),
    and member counts sum to the corpus size (every doc is in exactly
    one cluster, singletons included)."""
    from bigdata_financial_reporting_spark.operators.cache import (
        release_operator_caches,
    )
    from bigdata_financial_reporting_spark.operators.components import (
        dedup_clusters,
    )
    from bigdata_financial_reporting_spark.operators.text import tokenize
    from bigdata_financial_reporting_spark.queries.components import (
        _near_dup_pairs,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    rows = _rows(spark, sf_dir, "dedup_survivor_quality")
    d = load_table(spark, sf_dir, "documents")
    assert sum(r["n_members"] for r in rows) == d.count()

    clusters = dedup_clusters(_near_dup_pairs(d), d, "doc_id").select(
        "id", "component"
    )
    toks = d.select(
        F.col("doc_id").alias("id"),
        F.size(tokenize(F.col("text"))).alias("n_tokens"),
    )
    true_max = {
        r["component"]: r["mx"]
        for r in clusters.join(toks, "id")
        .groupBy("component")
        .agg(F.max("n_tokens").alias("mx"))
        .collect()
    }
    assert len(rows) == len(true_max)
    for r in rows:
        assert r["survivor_tokens"] == true_max[r["component"]], r
    release_operator_caches()


def test_random_projection_jl_distortion_bound(spark, sf_dir):
    """JL with ±1 signs at out_dim=16: E[||proj||^2] = 16·||x||^2, so
    the norm_ratio witness concentrates near 1. Assert every ratio in
    a wide band (the 5-sigma-ish envelope for k=16) AND that the mean
    ratio is close to 1 — a broken sign matrix (all +1) inflates
    colinear sums and fails the mean check."""
    from bigdata_financial_reporting_spark.queries import QUERIES

    rows = QUERIES["sim_random_projection"].fn(spark, sf_dir).collect()
    assert len(rows) == 100
    ratios = [r.norm_ratio for r in rows]
    assert all(0.4 < x < 1.8 for x in ratios), (min(ratios), max(ratios))
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15, mean


def test_weighted_sample_prefers_heavier_docs(spark, sf_dir):
    """A-ES with w = n_chars: the selected docs' mean length must
    exceed the stratum mean (the point of weighting), and the draw
    must be deterministic across invocations."""
    from bigdata_financial_reporting_spark.queries import QUERIES
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    out = QUERIES["sample_weighted_topk"].fn(spark, sf_dir)
    picked = out.groupBy("source").agg(F.avg("n_chars").alias("m")).collect()
    base = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.avg("n_chars").alias("m"))
        .collect()
    )
    base_m = {r.source: r.m for r in base}
    heavier = sum(1 for r in picked if r.m > base_m[r.source])
    # per-stratum this is statistical (25 docs/stratum, mild weight
    # range): assert a strong majority of strata plus the pooled mean
    assert heavier >= 0.7 * len(picked), (
        f"only {heavier}/{len(picked)} sources drew above-mean lengths"
    )
    pooled_picked = sum(r.m for r in picked) / len(picked)
    pooled_base = sum(base_m.values()) / len(base_m)
    assert pooled_picked > pooled_base
    again = sorted(map(tuple, QUERIES["sample_weighted_topk"].fn(spark, sf_dir).collect()))
    assert sorted(map(tuple, out.collect())) == again


def test_per_stratum_topk_is_exactly_k_and_disjoint_from_hash_order(spark, sf_dir):
    from bigdata_financial_reporting_spark.queries import QUERIES

    rows = QUERIES["sample_per_stratum_topk"].fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, set()).add(r.doc_id)
    for lang, ids in per.items():
        assert len(ids) == 20, (lang, len(ids))


def test_token_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(n_distinct), with equality at uniform docs."""
    import math

    from bigdata_financial_reporting_spark.queries import QUERIES

    for r in QUERIES["text_token_entropy"].fn(spark, sf_dir).collect():
        assert -1e-9 <= r.entropy <= math.log2(r.n_distinct) + 1e-6, r


def test_length_buckets_batches_are_dense_and_bounded(spark, sf_dir):
    """Every batch within a bucket holds <= 8 docs and batch ids are
    dense from 0 (no gaps — the packing invariant)."""
    from bigdata_financial_reporting_spark.queries import QUERIES

    rows = QUERIES["batch_length_buckets"].fn(spark, sf_dir).collect()
    per = {}
    for r in rows:
        assert r.bucket == r.n_tokens // 32
        per.setdefault((r.bucket, r.batch_id), 0)
        per[(r.bucket, r.batch_id)] += 1
    buckets = {b for b, _ in per}
    for b in buckets:
        batch_ids = sorted(bid for bb, bid in per if bb == b)
        assert batch_ids == list(range(len(batch_ids)))
        for bid in batch_ids[:-1]:  # all but the last batch are full
            assert per[(b, bid)] == 8, (b, bid, per[(b, bid)])
        assert per[(b, batch_ids[-1])] <= 8


def test_bigram_logprob_flags_shuffled_text_as_less_fluent(spark, sf_dir):
    """The LM must assign higher mean surprisal to bigram-broken text:
    compare each doc's score against the corpus mean — docs are all
    drawn from the same generator here, so simply assert scores are
    finite, positive, and vary (a constant score means the context
    join collapsed)."""
    from bigdata_financial_reporting_spark.queries import QUERIES

    rows = QUERIES["text_bigram_logprob"].fn(spark, sf_dir).collect()
    scores = [r.avg_neg_log2p for r in rows]
    assert all(s > 0 for s in scores)
    assert max(scores) - min(scores) > 0.01


def test_event_rate_anomaly_spikes_are_above_threshold(spark, sf_dir):
    from bigdata_financial_reporting_spark.queries import QUERIES

    rows = QUERIES["ts_event_rate_anomaly"].fn(spark, sf_dir).collect()
    for r in rows:
        if r.is_spike:
            assert r.z is not None and r.z > 2.0 - 1e-6, r
        if r.z is None:
            assert not r.is_spike


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    """The Bloom guarantee: every actual duplicate must be flagged
    maybe (a false negative would silently drop a dup past the
    prefilter); the probe batch must exercise both outcomes or the
    test is vacuous."""
    rows = _rows(spark, sf_dir, "dedup_bloom_prefilter")
    assert all(r["bloom_maybe"] for r in rows if r["actual_dup"])
    assert any(r["actual_dup"] for r in rows)
    assert any(not r["actual_dup"] for r in rows)


def test_countmin_never_underestimates(spark, sf_dir):
    """CMS estimates are one-sided: est >= exact for every key (the
    min-of-rows can only add colliding keys' mass, never lose any)."""
    rows = _rows(spark, sf_dir, "agg_countmin_heavy_hitters")
    assert rows
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_chunk_dedup_conserves_and_dedups(spark, sf_dir):
    """Per-doc kept counts are bounded by chunk counts, the earliest
    document keeps everything (nothing precedes it), and the corpus
    total shrinks (duplicate chunks exist at this SF — verified in
    the fixture)."""
    rows = _rows(spark, sf_dir, "dedup_chunk_lines")
    assert all(0 <= r["n_kept"] <= r["n_chunks"] for r in rows)
    first = min(rows, key=lambda r: r["doc_id"])
    assert first.n_kept == first.n_chunks
    assert sum(r["n_kept"] for r in rows) < sum(r["n_chunks"] for r in rows)


def test_pagerank_sums_to_one(spark, sf_dir):
    """On an undirected graph (no dangling nodes) PageRank conserves
    probability mass at every iteration — the ranks must form a
    distribution and be strictly positive."""
    rows = _rows(spark, sf_dir, "text_pagerank_keywords")
    total = sum(r["rank"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-3), total
    assert all(r["rank"] > 0 for r in rows)


def test_recursive_spine_is_gapless(spark, sf_dir):
    """The calendar spine covers every day between min and max with
    no gaps and no duplicates — the property the recursion exists to
    guarantee."""
    import datetime as dt

    rows = _rows(spark, sf_dir, "sql_recursive_cte_spine")
    days = sorted(r["day"] for r in rows)
    d0 = dt.date.fromisoformat(days[0])
    d1 = dt.date.fromisoformat(days[-1])
    assert len(set(days)) == (d1 - d0).days + 1 == len(days)


def test_bpe_merge_step_matches_bruteforce_reference(spark, sf_dir):
    """Round-6 advisory item 7: the distributed BPE pair-count step
    (distinct-word explosion + exact integer counts + total-order
    top-20) must agree with a single-node brute force over the same
    corpus — the reference implementation a tokenizer trainer would
    write (Sennrich et al. 2016, count pass)."""
    import collections
    import re

    import duckdb

    from bigdata_financial_reporting_spark.queries import QUERIES

    got = [
        (r["sym_a"], r["sym_b"], r["merge_count"])
        for r in QUERIES["text_bpe_merge_step"].fn(spark, sf_dir).collect()
    ]

    texts = [
        t
        for (t,) in duckdb.connect()
        .execute(f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')")
        .fetchall()
    ]
    freq: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                freq[w] += 1
    pairs: collections.Counter = collections.Counter()
    for w, f in freq.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f
    want = [
        (a, b, c)
        for (a, b), c in sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:20]
    ]
    assert got == want


def test_url_canonicalization_idempotent_and_order_invariant(spark):
    """canonical_url is a closure: applying it twice equals applying it
    once (a canonicalizer that keeps moving is not a dedup key), and
    the result is invariant to query-param order and utm_* noise."""
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.dedup import (
        canonical_url,
    )

    urls = [
        "HTTPS://WWW.Ex.COM:443/A/B/?b=2&a=1&utm_source=x#frag",
        "https://www.ex.com/a/b?a=1&b=2",
        "https://www.ex.com/a/b/index.html?utm_campaign=y&b=2&a=1",
        "https://www.ex.com/a/b///",
        "https://www.ex.com/a/b?utm_only=1",
        "https://www.ex.com/plain",
        # round-7 ADVICE edges: portless-equivalence must hold with NO
        # trailing slash, :80 for http, and a ':443/' occurring INSIDE
        # a path must survive untouched
        "https://ex.com:443",
        "https://ex.com",
        "http://ex.com:80/x",
        "http://ex.com/x",
        "https://ex.com/redirect/:443/keep",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])
    canon = [r["c1"] for r in out]
    # the first three are the same resource in different styles
    assert canon[0] == canon[1] == canon[2] == "https://www.ex.com/a/b?a=1&b=2"
    # trailing slashes collapse; utm-only query drops the '?' entirely
    assert canon[3] == "https://www.ex.com/a/b"
    assert canon[4] == "https://www.ex.com/a/b"
    assert canon[5] == "https://www.ex.com/plain"
    assert canon[6] == canon[7] == "https://ex.com"
    assert canon[8] == canon[9] == "http://ex.com/x"
    assert canon[10] == "https://ex.com/redirect/:443/keep"


def test_kmeans_step_assignments_are_optimal_vs_numpy(spark, sf_dir):
    """The Lloyd-step centroids must reflect NEAREST-seed assignment:
    recompute assignments brute-force in numpy from the raw embeddings
    and compare cluster sizes — any argmin or tie-break slip shows up
    as a size mismatch."""
    import numpy as np
    import pyarrow.parquet as pq

    from bigdata_financial_reporting_spark.queries import QUERIES

    got = QUERIES["emb_kmeans_lloyd_step"].fn(spark, sf_dir).collect()
    sizes = {}
    for r in got:
        sizes[r["cluster"]] = r["n_members"]

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    X = np.round(np.array(t["embedding"], dtype=np.float64) * 1e6).astype(
        np.int64
    )
    ids = np.array(t["vec_id"])
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    seeds = X[ids < 8]
    # nearest seed, ties to the LOWEST centroid id (argmin is first-min)
    d2 = ((X[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    want = {int(c): int((assign == c).sum()) for c in range(8)}
    got_sizes = {
        int(c): int(n) for c, n in sizes.items()
    }
    for c in range(8):
        assert got_sizes.get(c, 0) == want.get(c, 0), (c, got_sizes, want)


def test_mutual_knn_graph_is_symmetric_and_mutual(spark, sf_dir):
    """Every emitted edge must be MUTUAL: recompute each endpoint's
    exact top-5 brute-force in numpy and verify both directions, and
    the edge list must carry each undirected pair once (src < dst)."""
    import numpy as np
    import pyarrow.parquet as pq

    from bigdata_financial_reporting_spark.queries import QUERIES

    edges = [
        (r["src"], r["dst"])
        for r in QUERIES["sim_knn_graph_mutual"].fn(spark, sf_dir).collect()
    ]
    assert all(a < b for a, b in edges)
    assert len(set(edges)) == len(edges)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    keep = ids < 100
    X = np.round(
        np.array(t["embedding"], dtype=np.float64)[keep] * 1e6
    ).astype(np.int64)
    ids = ids[keep]
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    knn = {}
    for i in range(len(ids)):
        # (dist, id) tie-break, exactly like the operator
        nbrs = sorted(range(len(ids)), key=lambda j: (d2[i, j], ids[j]))[:5]
        knn[int(ids[i])] = {int(ids[j]) for j in nbrs}
    want = {
        (a, b)
        for a in knn
        for b in knn[a]
        if a < b and a in knn[b]
    }
    assert set(edges) == want


def test_grid_neighbors_matches_numpy_bruteforce(spark, sf_dir):
    """The grid-blocked radius join must emit EXACTLY the pairs the
    O(n^2) brute force finds: blocking may only prune, never drop a
    true neighbor (cell size >= radius) nor duplicate one."""
    import numpy as np
    import pyarrow.parquet as pq

    from bigdata_financial_reporting_spark.queries import QUERIES

    got = {
        (r["a_id"], r["b_id"]): r["dist2"]
        for r in QUERIES["join_grid_neighbors"].fn(spark, sf_dir).collect()
    }
    keys = pq.read_table(sf_dir + "/customer.parquet", columns=["c_custkey"])
    ids = np.sort(np.asarray(keys["c_custkey"]))
    ids = ids[ids <= 20000]
    x = (ids * 40503) % 1000
    y = (ids * 69069) % 1000
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    ai, bi = np.where((d2 <= 64) & (ids[:, None] < ids[None, :]))
    want = {
        (int(ids[a]), int(ids[b])): int(d2[a, b]) for a, b in zip(ai, bi)
    }
    assert got == want


def test_matryoshka_overlap_matches_numpy(spark, sf_dir):
    """Prefix-truncation audit vs numpy: exact integer dots, top-10
    by (dot desc, id) on full and 16-d prefix, overlap counted."""
    import numpy as np
    import pyarrow.parquet as pq

    from bigdata_financial_reporting_spark.queries import QUERIES

    got = {
        r["query_id"]: (r["n_overlap_at_10"], r["prefix_top1"])
        for r in QUERIES["emb_matryoshka_prefix_topk"]
        .fn(spark, sf_dir)
        .collect()
    }
    t = pq.read_table(sf_dir + "/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    order = np.argsort(ids)
    X = np.round(np.array(t["embedding"], dtype=np.float64) * 1e6).astype(
        np.int64
    )[order]
    ids = ids[order]

    def topk(scores, exclude, k=10):
        # sort by (-score, id): stable over ids already ascending
        idx = np.lexsort((ids, -scores))
        idx = [j for j in idx if ids[j] != exclude][:k]
        return [int(ids[j]) for j in idx]

    for qpos in range(5):
        qid = int(ids[qpos])
        full = X @ X[qpos]
        pref = X[:, :16] @ X[qpos, :16]
        tf = topk(full, qid)
        tp = topk(pref, qid)
        want_overlap = len(set(tf) & set(tp))
        assert got[qid] == (want_overlap, tp[0]), (qid, got[qid])


def test_kmv_sketch_matches_python_and_is_sane(spark, sf_dir, ddb):
    """KMV re-derived in pure Python: 64th-smallest mixed hash per
    group and the half-away-division estimate; the estimate must land
    within 50% of the true distinct count at k=64."""
    from bigdata_financial_reporting_spark.functions.exact import py_half_div
    from bigdata_financial_reporting_spark.queries import QUERIES

    rows = QUERIES["agg_kmv_distinct_sketch"].fn(spark, sf_dir).collect()
    truth = {
        g: set(hv for (hv,) in ddb.execute(
            "SELECT DISTINCT (l_partkey * 2654435761) % 4294967296 "
            "FROM lineitem WHERE l_returnflag = ?", [g]).fetchall())
        for g in ("A", "N", "R")
    }
    assert {r["grp"] for r in rows} == set(truth)
    for r in rows:
        hs = sorted(truth[r["grp"]])
        assert r["n_distinct_true"] == len(hs)
        assert r["kth_min_hash"] == hs[63]
        est = py_half_div(63 * 4294967296, hs[63])
        assert r["kmv_estimate"] == est
        assert abs(est - len(hs)) / len(hs) < 0.5, (r["grp"], est, len(hs))


def test_backward_fill_and_running_median_match_pandas(spark, sf_dir):
    """bfill and the 15-row rolling median against pandas per-user
    reference (exact: carried values / integer-midpoint medians)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from bigdata_financial_reporting_spark.queries import QUERIES

    ev = (
        pq.read_table(sf_dir + "/events.parquet")
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ev["v"] = ev["value"].where(ev["event_type"] != "click")
    want_bf = ev.groupby("user_id")["v"].transform("bfill").round(6)
    got = (
        QUERIES["ts_backward_fill"].fn(spark, sf_dir).toPandas()
        .set_index("event_id")["v_bfilled"]
    )
    got_aligned = ev["event_id"].map(got)
    pd.testing.assert_series_equal(
        got_aligned.rename(None), want_bf.rename(None), check_names=False
    )

    ev["vq"] = np.round(ev["value"] * 1e6).astype(np.int64)
    want_med2 = (
        ev.groupby("user_id")["vq"]
        .transform(lambda s: s.rolling(15, min_periods=1).median())
        * 2
    ).round().astype(np.int64)
    gotm = (
        QUERIES["window_running_median"].fn(spark, sf_dir).toPandas()
        .set_index("event_id")["med2_micro"]
    )
    gotm_aligned = ev["event_id"].map(gotm).astype(np.int64)
    assert (gotm_aligned.values == want_med2.values).all()
