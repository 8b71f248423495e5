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
