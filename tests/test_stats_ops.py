"""Invariants for the statistical-diagnostics operators added in
round 4: bounds and structural properties that must hold beyond the
oracle's value equality (SURVEY.md §5.5 discipline)."""

from __future__ import annotations

from bigdata_financial_reporting_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_ks_statistic_is_a_proper_distance(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "agg_ks_twosample")
    assert 0.0 <= r["ks_d"] <= 1.0
    assert r["n1"] > 0 and r["n2"] > 0


def test_gini_bounds_and_sample_sizes(spark, sf_dir):
    rows = _rows(spark, sf_dir, "agg_gini_coefficient")
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["n"] > 1


def test_hhi_bounds(spark, sf_dir):
    """1/n <= HHI <= 1 for n participants."""
    rows = _rows(spark, sf_dir, "fin_hhi_concentration")
    for r in rows:
        assert 1.0 / r["n_suppliers"] - 1e-9 <= r["hhi"] <= 1.0


def test_mann_kendall_pairs_and_bounds(spark, sf_dir):
    """|S| <= n_pairs, and n_pairs = n*(n-1)/2 for the day count."""
    rows = _rows(spark, sf_dir, "ts_mann_kendall_trend")
    for r in rows:
        assert abs(r["s_stat"]) <= r["n_pairs"]


def test_cusum_changepoint_is_an_observed_day(spark, sf_dir):
    import datetime as dt

    rows = _rows(spark, sf_dir, "ts_changepoint_cusum")
    for r in rows:
        dt.date.fromisoformat(r["cp_day"])  # parses
        assert r["cusum_max"] >= 0.0


def test_welch_df_between_min_and_sum(spark, sf_dir):
    """Welch-Satterthwaite df lies in [min(n1,n2)-1, n1+n2-2]."""
    (r,) = _rows(spark, sf_dir, "agg_welch_ttest")
    assert min(r["n1"], r["n2"]) - 1 <= r["df_welch"] <= r["n1"] + r["n2"] - 2


def test_var_es_tail_ordering(spark, sf_dir):
    """Expected shortfall is at most VaR (it averages the tail at or
    below it), and the tail is ~1% of the sample."""
    rows = _rows(spark, sf_dir, "fin_var_expected_shortfall")
    for r in rows:
        assert r["es99"] <= r["var99"]
        assert r["n_tail"] > 0


def test_subsample_ci_brackets_the_mean(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "agg_subsample_ci")
    assert r["ci_lo"] <= r["mean_of_means"] <= r["ci_hi"]
    assert r["n_resamples"] == 32


def test_benford_observed_sums_to_one(spark, sf_dir):
    rows = _rows(spark, sf_dir, "agg_benford_digits")
    assert {r["digit"] for r in rows} == set(range(1, 10))
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-3


def test_audio_rms_bounds(spark, sf_dir):
    """RMS <= peak <= 128 for centered 8-bit samples; window sizes
    are 32 except possibly each clip's last window."""
    rows = _rows(spark, sf_dir, "mm_audio_rms_windows")
    assert rows
    last = {}
    for r in rows:
        assert 0.0 <= r["rms"] <= r["peak"] + 1e-9
        assert r["peak"] <= 128
        last[r["doc_id"]] = max(last.get(r["doc_id"], -1), r["win_idx"])
    for r in rows:
        if r["win_idx"] < last[r["doc_id"]]:
            assert r["n_in_win"] == 32


def test_spearman_bounds_and_synthetic_monotone(spark, sf_dir):
    """|rho| <= 1 on the fixture; a perfectly monotone synthetic series
    must score exactly 1.0 (average ranks reduce to plain ranks when
    there are no ties)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for r in _rows(spark, sf_dir, "stat_spearman_corr"):
        assert -1.0 <= r["rho"] <= 1.0
        assert r["n"] > 0

    # monotone witness through the same doubled-average-rank formula
    df = spark.createDataFrame(
        [(i, float(i), float(i * i)) for i in range(1, 50)], "k int, x double, y double"
    )
    rx = (
        F.lit(2) * F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
    )
    ry = (
        F.lit(2) * F.rank().over(Window.orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("y"))
        - 1
    )
    s = df.select(rx.alias("rx"), ry.alias("ry")).agg(
        F.corr("rx", "ry").alias("rho")
    ).collect()[0]
    assert abs(s["rho"] - 1.0) < 1e-12


def test_spearman_moments_survive_int64_overflow(spark, tmp_path):
    """Regression (found at the 10x corpus): with ~2M rows in a group,
    Σrx2² ≈ 1e19 > 2^63 — the LongType moment SUMS (not just the later
    products, which wrap from ~100k rows) overflowed silently with
    ANSI off, and rho came out ~6x off while the DuckDB oracle
    (HUGEINT) stayed exact. Drive the PRODUCTION registry function on
    a synthetic 2M-row lineitem and hash-compare against the oracle on
    the same parquet — plus exact endpoints for the monotone /
    anti-monotone halves."""
    import duckdb

    n = 1_000_000
    li = (
        spark.range(1, 2 * n + 1)
        .selectExpr(
            "id AS l_orderkey",
            "id AS l_partkey",
            "id AS l_suppkey",
            "CAST(1 AS INT) AS l_linenumber",
            "CAST(id AS DOUBLE) AS l_quantity",
            # group A: y = x (rho exactly 1); group R: y = -x (exactly -1)
            "CASE WHEN id <= 1000000 THEN CAST(id AS DOUBLE) "
            "ELSE CAST(-id AS DOUBLE) END AS l_extendedprice",
            "CAST(0.0 AS DOUBLE) AS l_discount",
            "CAST(0.0 AS DOUBLE) AS l_tax",
            "CASE WHEN id <= 1000000 THEN 'A' ELSE 'R' END AS l_returnflag",
            "'O' AS l_linestatus",
            "CAST('2024-01-01' AS TIMESTAMP) AS l_shipdate",
        )
    )
    d = str(tmp_path)
    li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    rows = {
        r["grp"]: r
        for r in QUERIES["stat_spearman_corr"].fn(spark, d).collect()
    }
    assert rows["A"]["rho"] == 1.0 and rows["A"]["n"] == n
    assert rows["R"]["rho"] == -1.0 and rows["R"]["n"] == n

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    oracle = sorted(
        tuple(r)
        for r in con.execute(QUERIES["stat_spearman_corr"].oracle).fetchall()
    )
    got = sorted((r["grp"], r["n"], r["rho"]) for r in rows.values())
    assert got == oracle


def test_mann_whitney_identity_and_bounds(spark, sf_dir):
    """U is bounded by n1*n2; identical samples give z == 0 exactly
    (the rank sums split evenly by symmetry)."""
    rows = _rows(spark, sf_dir, "stat_mann_whitney_u")
    (r,) = rows
    assert 0 <= r["u1_x2"] <= 2 * r["n1"] * r["n2"]
    assert abs(r["z"]) < 50  # sanity: finite, not blown up by ties


def test_anova_f_nonnegative_and_group_count(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "stat_anova_f")
    assert r["k"] == 5 and r["nt"] > 0
    assert r["f_stat"] >= 0.0


def test_seasonal_decompose_identity(spark, sf_dir):
    """Decomposition must reassemble: cnt == trend + seasonal +
    residual + grand-mean correction folded into seasonal — i.e.
    cnt - trend - seasonal - residual == 0 to rounding; and the
    day-of-week seasonal components sum to ~0 weighted by phase
    counts."""
    rows = _rows(spark, sf_dir, "ts_seasonal_decompose")
    assert rows
    for r in rows:
        assert abs(r["cnt"] - r["trend"] - r["seasonal"] - r["residual"]) < 2e-6


def test_url_canonicalize_groups_and_idempotence(spark, sf_dir):
    """Every canonical group must collapse exactly 3 raw variants per
    doc and pair docs sharing doc_id//2; the keeper is the even doc of
    the pair; and no canonical form retains tracking params, ports,
    fragments, or index.html."""
    rows = _rows(spark, sf_dir, "dedup_url_canonicalize")
    assert rows
    for r in rows:
        assert r["n_raw"] == 3 * r["n_docs"]
        assert r["keeper_doc"] % 2 == 0 or r["n_docs"] == 1
        c = r["canonical"]
        assert "utm_" not in c and "#" not in c and ":443" not in c
        assert "index.html" not in c and not c.endswith("/")
        assert c == c.lower()


def test_domain_rebalance_caps_and_exactness(spark, sf_dir):
    """No source exceeds its quota; a source below the cap keeps
    everything; kept counts equal the quota otherwise."""
    rows = _rows(spark, sf_dir, "mix_domain_rebalance")
    assert rows
    for r in rows:
        assert r["quota"] == min(r["n_before"], r["quota"])
        assert r["n_kept"] == min(r["n_before"], r["quota"])
        assert r["id_checksum"] is not None


def test_power_iteration_matches_numpy(spark, sf_dir):
    """The two unrolled iterations must agree with a dense numpy
    reference computed from the same micro-quantized embeddings —
    the distributed Gram path against an independent oracle."""
    import numpy as np

    from bigdata_financial_reporting_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array([[round(v * 1e6) for v in r.embedding] for r in e], dtype=object)
    n = X.shape[0]
    # exact integer covariance numerator: n*Gram - outer(colsum, colsum)
    G = X.T @ X
    s = X.sum(axis=0)
    M = G * n - np.outer(s, s)
    v1 = M.sum(axis=1)
    v2 = (M.astype(float) @ v1.astype(float))
    got = {r["pos"]: (r["v1_s"], r["v2_s"]) for r in _rows(spark, sf_dir, "emb_pca_power_iteration")}
    for i in range(64):
        assert abs(got[i][0] - float(v1[i]) / 1e12) < 1e-4
        ref2 = v2[i] / 1e30
        assert abs(got[i][1] - ref2) < max(1e-4, abs(ref2) * 1e-9)
