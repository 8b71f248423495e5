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
