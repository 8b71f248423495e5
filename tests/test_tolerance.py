"""Tolerance tests for the ≈ (no-oracle) queries (SURVEY.md §5.3):
approximate aggregates vs their exact values, seeded sampling bounds,
id-generator properties. These are the verification the t2 rows-only
check cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries import QUERIES
from bigdata_financial_reporting_spark.sources.catalog import load_table


def test_approx_count_distinct_within_5pct_per_group(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.approx_n_cust
        for r in QUERIES["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] <= 0.05, (
            f"group {k}: approx {approx[k]} vs exact {exact[k]}"
        )


def test_approx_quantiles_within_rank_tolerance(spark, sf_dir):
    """approx_percentile(accuracy=a) guarantees rank error <= n/a;
    assert each returned quantile lies inside the value band of
    target-rank +- n/a (a = 10000 here)."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = sorted(r[0] for r in li.select("l_extendedprice").collect())
    n = len(vals)
    qs = [0.25, 0.5, 0.9]
    approx = li.agg(
        F.percentile_approx("l_extendedprice", qs, 10000).alias("q")
    ).first()["q"]
    slack = max(1, n // 10000) + 1
    for q, a in zip(qs, approx):
        rank = int(q * n)
        lo = vals[max(0, rank - slack)]
        hi = vals[min(n - 1, rank + slack)]
        assert lo <= a <= hi, f"quantile {q}: {a} outside [{lo}, {hi}]"


def test_sample_seeded_bounds(spark, sf_dir):
    """Seeded sampling is deterministic only for a fixed partition
    layout (seed + partition index drive the RNG), so the contract here
    is the statistical bound, not row membership."""
    n1 = QUERIES["sample_seeded"].fn(spark, sf_dir).count()
    total = load_table(spark, sf_dir, "lineitem").count()
    frac = n1 / total
    # Bernoulli(0.1): 6-sigma band at fixture sizes is well inside this
    assert 0.07 < frac < 0.13, f"sample fraction {frac:.4f} implausible for 0.1"


def test_nondeterministic_ids_properties(spark, sf_dir):
    df = QUERIES["fn_nondeterministic_ids"].fn(spark, sf_dir)
    rows = df.collect()
    mono = [r.mono_id for r in rows]
    uids = [r.uid for r in rows]
    assert len(set(mono)) == len(mono), "monotonically_increasing_id collided"
    assert len(set(uids)) == len(uids), "uuid collided"
    assert all(0.0 <= r.r < 1.0 for r in rows), "rand(seed) out of [0,1)"
    # xxhash64 must be stable across runs (it anchors dedup identities)
    again = {r.doc_id: r.xx64 for r in df.collect()}
    first = {r.doc_id: r.xx64 for r in rows}
    assert first == again


def test_stratified_sample_per_stratum_bounds(spark, sf_dir):
    """sampleBy: each stratum's realized fraction must sit in a wide
    band around its requested fraction (Bernoulli, small strata)."""
    out = QUERIES["sample_stratified"].fn(spark, sf_dir)
    got = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    requested = {"en": 0.5, "es": 0.3, "fr": 0.3, "de": 0.3, "zh": 0.1}
    for lang, frac in requested.items():
        if totals.get(lang, 0) < 30:
            continue  # too small for a meaningful bound
        realized = got.get(lang, 0) / totals[lang]
        assert abs(realized - frac) < 0.15, f"{lang}: {realized} vs {frac}"
    # no stratum outside the requested set appears
    assert set(got) <= set(requested)
