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


# ---- round-8 batch invariants (round-8 verdict item 4) ----


def _stage(df, tmp_path, table):
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/{table}.parquet")
    return d


def _synth_events(spark, shift_by_group=None):
    """Two event types with very different spreads; values are dyadic
    rationals (i/8) so every double op — group median, the optional
    integer location shift, micro-quantization — is EXACT."""
    from pyspark.sql import functions as F

    shift = shift_by_group or {}
    rows = []
    eid = 0
    for g, spread, n in (("click", 1, 400), ("view", 13, 300)):
        c = shift.get(g, 0)
        for i in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    f"2024-01-{(i % 28) + 1:02d} 00:00:{i % 60:02d}",
                    i % 7,
                    g,
                    ((i % 97) - 48) * spread / 8.0 + c,
                    "{}",
                )
            )
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_levene_w_nonnegative_and_location_shift_invariant(spark, tmp_path):
    """Brown–Forsythe W is a ratio of sums of squares (>= 0), and it
    depends on the data only through |x - median_g|, so shifting each
    group by its own integer constant must leave W bit-identical (the
    medians shift exactly with the dyadic fixture values)."""
    base = _stage(_synth_events(spark), tmp_path / "base", "events")
    shifted = _stage(
        _synth_events(spark, {"click": 3, "view": -7}),
        tmp_path / "shift",
        "events",
    )
    (r0,) = QUERIES["stat_levene"].fn(spark, base).collect()
    (r1,) = QUERIES["stat_levene"].fn(spark, shifted).collect()
    assert r0["levene_w"] >= 0.0
    assert r0["k"] == 2 and r0["nt"] == 700
    assert (r1["k"], r1["nt"], r1["levene_w"]) == (
        r0["k"],
        r0["nt"],
        r0["levene_w"],
    )


def test_theta_sketch_matches_python_recompute_under_skew(spark, tmp_path):
    """Adversarial group sizes (tiny vs 5000 distinct keys): recompute
    the whole KMV/theta pipeline independently in Python (the hash is a
    fixed odd multiplier — fully deterministic) and require exact row
    equality. Two regimes pinned: (A,B) whose true overlap hashes rank
    INSIDE both k=64 sketches must match the recompute; (C,B) whose
    overlap hashes rank far outside B's sketch must be ABSENT (the
    operator emits a pair only when the sketches share a hash — no
    shared evidence, no row; the DuckDB oracle has the same shape)."""
    from bigdata_financial_reporting_spark.functions.exact import py_half_div

    def hv(pk):
        return (pk * 2654435761) % (2**32)

    universe = list(range(1, 5001))
    by_rank = sorted(universe, key=hv)
    # overlap for A: the 3 keys with the SMALLEST hashes — guaranteed
    # inside B's 64-slot sketch; C overlaps via the 3 LARGEST — outside.
    pk_a = by_rank[:3] + [6000, 6001]
    pk_c = by_rank[-3:] + [7000, 7001]
    pk_b = universe
    rows = (
        [(pk, "A") for pk in pk_a]
        + [(pk, "B") for pk in pk_b]
        + [(pk, "C") for pk in pk_c]
    )
    li = spark.createDataFrame(
        [
            (i + 1, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, flag, "O", "2024-01-01")
            for i, (pk, flag) in enumerate(rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        "cast(l_shipdate as timestamp) as l_shipdate",
    )
    d = _stage(li, tmp_path, "lineitem")
    got = sorted(
        tuple(r)
        for r in QUERIES["agg_theta_sketch_intersection"].fn(spark, d).collect()
    )

    sk = {}
    for grp, pks in (("A", pk_a), ("B", pk_b), ("C", pk_c)):
        hs = sorted(hv(pk) for pk in set(pks))
        sk[grp] = hs[:64]
    expected = []
    sets = {"A": set(pk_a), "B": set(pk_b), "C": set(pk_c)}
    for ga, gb in (("A", "B"), ("A", "C"), ("B", "C")):
        theta = min(max(sk[ga]), max(sk[gb]))
        common = set(sk[ga]) & set(sk[gb])
        if not common:
            continue
        n_common = sum(1 for h in common if h < theta)
        truth = len({hv(p) for p in sets[ga]} & {hv(p) for p in sets[gb]})
        est = py_half_div(n_common * 2**32, theta)
        expected.append((ga, gb, n_common, theta, est, truth))
    assert expected, "fixture must exercise the shared-sketch regime"
    assert ("A", "B") in {(e[0], e[1]) for e in expected}
    assert ("C", "B") not in {(e[0], e[1]) for e in expected} and (
        "B",
        "C",
    ) not in {(e[0], e[1]) for e in expected}, (
        "fixture must exercise the disjoint-sketch regime"
    )
    assert got == sorted(expected)
    for row in got:
        assert row[2] <= 64


def test_sortino_all_gains_emits_null(spark, tmp_path):
    """An instrument with no losing day has no downside deviation to
    normalise by: n_down == 0 and sortino_ann IS NULL, while a mixed
    instrument gets a finite ratio whose sign equals its mean's."""
    rows = []
    eid = 0
    for day in range(1, 21):
        eid += 1  # user 1: strictly rising price
        rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "t", 100.0 + day, "{}"))
        eid += 1  # user 2: alternating up/down
        rows.append(
            (eid, f"2024-01-{day:02d} 12:00:00", 2, "t",
             100.0 + (5.0 if day % 2 else -3.0), "{}")
        )
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).selectExpr(
        "event_id", "cast(ts as timestamp) as ts", "user_id",
        "event_type", "value", "props"
    )
    d = _stage(ev, tmp_path, "events")
    got = {r["user_id"]: r for r in QUERIES["fin_sortino"].fn(spark, d).collect()}
    assert got[1]["n_down"] == 0
    assert got[1]["mean_ret"] > 0
    assert got[1]["sortino_ann"] is None
    assert got[2]["n_down"] > 0
    assert got[2]["sortino_ann"] is not None
    assert (got[2]["sortino_ann"] > 0) == (got[2]["mean_ret"] > 0)


def test_momentum_quintiles_balanced_per_day(spark, sf_dir):
    """ntile(5) balance: within each day the bucket sizes differ by at
    most 1, larger buckets come first, and quintile labels are 1..5."""
    rows = _rows(spark, sf_dir, "fin_momentum_rank")
    assert rows
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], {})[r["quintile"]] = r["n_instruments"]
    for day, buckets in by_day.items():
        assert set(buckets) <= {1, 2, 3, 4, 5}
        sizes = [buckets[q] for q in sorted(buckets)]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)


def test_signbit_census_totals_and_negation_antisymmetry(
    spark, sf_dir, tmp_path
):
    """The census partitions the corpus (counts sum to |embeddings|);
    negating every (nonzero) coordinate must map each fingerprint to
    its 62-bit complement with the same census counts."""
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.sources.catalog import load_table

    rows = _rows(spark, sf_dir, "emb_signbit_fingerprint")
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == total

    # synthetic nonzero-coordinate corpus and its negation
    base = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (
                F.when((F.xxhash64(F.col("id"), j) % 2) == 0, F.lit(0.5))
                .otherwise(F.lit(-0.5))
            ).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 3).cast("int").alias("label"),
    )
    neg = base.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (-x).cast("float")),
    )
    d_pos = _stage(base, tmp_path / "pos", "embeddings")
    d_neg = _stage(neg, tmp_path / "neg", "embeddings")
    pos = {
        r["sign_fp"]: r["n_vectors"]
        for r in QUERIES["emb_signbit_fingerprint"].fn(spark, d_pos).collect()
    }
    ngt = {
        r["sign_fp"]: r["n_vectors"]
        for r in QUERIES["emb_signbit_fingerprint"].fn(spark, d_neg).collect()
    }
    mask = (1 << 62) - 1
    assert {fp ^ mask: n for fp, n in pos.items()} == ngt


def test_dec2d_mirrors_duckdb_beyond_2p53(spark):
    """The two-limb decimal->double render must agree with the DuckDB
    mirror BIT-FOR-BIT on randomized magnitudes past 2^53 (where the
    engines' native casts diverge by an ulp on ~1e-3 of values), both
    signs, and the limb boundaries."""
    import random
    import struct

    import duckdb

    from bigdata_financial_reporting_spark.functions.exact import (
        duck_dec2d,
        spark_dec2d,
    )

    rng = random.Random(87)
    vals = [0, 1, -1, 2**53, -(2**53), 10**15 - 1, 10**15, 10**15 + 1]
    vals += [rng.randrange(2**53, 9 * 10**33) * rng.choice((1, -1)) for _ in range(192)]
    spark_sql = "SELECT " + ", ".join(
        spark_dec2d(f"cast('{v}' as decimal(38,0))") + f" AS c{i}"
        for i, v in enumerate(vals)
    )
    duck_sql = "SELECT " + ", ".join(
        duck_dec2d(f"CAST('{v}' AS HUGEINT)") + f" AS c{i}"
        for i, v in enumerate(vals)
    )
    s_row = spark.sql(spark_sql).collect()[0]
    d_row = duckdb.connect().execute(duck_sql).fetchone()
    for i, v in enumerate(vals):
        sb = struct.pack("<d", s_row[i])
        db = struct.pack("<d", d_row[i])
        assert sb == db, f"dec2d mismatch at {v}: {s_row[i]!r} vs {d_row[i]!r}"


# ---- round-10 extensions: two-way ANOVA + HNSW upper graph ----


def test_anova_two_way_matches_python_recompute(spark, sf_dir):
    """Full independent recompute of the factorial decomposition from
    the raw fixture rows (exact integer moments in Python bigints, the
    same fixed-order term folds), plus the structural identities:
    SS terms nonnegative-up-to-fold-roundoff and df bookkeeping."""
    from collections import defaultdict

    from bigdata_financial_reporting_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).collect()
    cells = defaultdict(lambda: [0, 0, 0])  # n, s, qq
    for r in li:
        q = round(r.l_quantity)
        c = cells[(r.l_returnflag, r.l_linestatus)]
        c[0] += 1
        c[1] += q
        c[2] += q * q
    n_t = sum(c[0] for c in cells.values())
    s_t = sum(c[1] for c in cells.values())
    q_t = sum(c[2] for c in cells.values())
    cells_term = sum(
        float(c[1]) * float(c[1]) / c[0]
        for _, c in sorted(cells.items())
    )
    am, bm = defaultdict(lambda: [0, 0]), defaultdict(lambda: [0, 0])
    for (a, b), c in cells.items():
        am[a][0] += c[0]
        am[a][1] += c[1]
        bm[b][0] += c[0]
        bm[b][1] += c[1]
    a_term = sum(float(v[1]) ** 2 / v[0] for _, v in sorted(am.items()))
    b_term = sum(float(v[1]) ** 2 / v[0] for _, v in sorted(bm.items()))
    ka, kb = len(am), len(bm)
    grand = float(s_t) ** 2 / n_t
    ssw = float(q_t) - cells_term
    msw = ssw / (n_t - ka * kb)
    f_a = ((a_term - grand) / (ka - 1)) / msw
    f_b = ((b_term - grand) / (kb - 1)) / msw
    f_ab = (
        (cells_term - a_term - b_term + grand) / ((ka - 1) * (kb - 1))
    ) / msw

    (r,) = _rows(spark, sf_dir, "stat_anova_two_way")
    assert (r["ka"], r["kb"], r["n"]) == (ka, kb, n_t)
    for got, ref in ((r["f_a"], f_a), (r["f_b"], f_b), (r["f_ab"], f_ab)):
        assert abs(got - ref) < max(1e-5, abs(ref) * 1e-6), (got, ref)
    assert r["f_a"] >= 0 and r["f_b"] >= 0 and r["f_ab"] >= 0


def test_anova_two_way_zero_interaction_on_additive_design(spark, tmp_path):
    """A perfectly additive balanced design (x = mu + alpha_a + beta_b,
    no noise) must yield f_ab == 0 exactly (SS_AB is an exact-integer
    expression that cancels), while f_a and f_b blow up to huge values
    (SSW == 0 -> division by zero -> NULL/inf guard: with zero within-
    cell variance the denominator is 0.0; assert the interaction
    NUMERATOR is what vanishes by constructing nonzero within-cell
    noise that is identical across cells)."""
    rows = []
    key = 0
    # additive cell means: alpha in {0,10,20}, beta in {0,5}; two
    # replicates per cell at mean+-1 -> SSW > 0, SS_AB == 0 exactly
    for ai, a in enumerate(["A", "N", "R"]):
        for bi, b in enumerate(["F", "O"]):
            mu = 30 + 10 * ai + 5 * bi
            for d in (-1, 1):
                key += 1
                rows.append((key, 1, 1, 1, float(mu + d), 1.0, 0.0, 0.0,
                             a, b, "2024-01-01"))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
        "cast(l_shipdate as timestamp) as l_shipdate",
    )
    d = _stage(li, tmp_path, "lineitem")
    (r,) = QUERIES["stat_anova_two_way"].fn(spark, d).collect()
    assert (r["ka"], r["kb"], r["n"]) == (3, 2, 12)
    assert r["f_ab"] == 0.0
    assert r["f_a"] > r["f_b"] > 0


def test_hnsw_upper_graph_matches_numpy_recompute(spark, sf_dir):
    """Independent numpy recompute of every layer's exact top-3 from
    the raw fixture (same hash levels, same integer quantization, same
    (cosine desc, id asc) tie-break) must equal the operator's output
    row for row; plus the structural invariants: nested memberships,
    rank contiguity, no self-links."""
    import numpy as np

    from bigdata_financial_reporting_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in e], dtype=np.int64)
    Q = np.rint(np.array([r.embedding for r in e], dtype=np.float64) * 1e6)
    nq = (Q * Q).sum(axis=1)
    h = ((ids % 1000000007) * 2654435761) % (2**32)
    expected = []
    for layer in (4, 5, 6):
        sel = (h % (2**layer) == 0) & (nq > 0)
        lids, lq, lnq = ids[sel], Q[sel], nq[sel]
        if len(lids) < 2:
            continue
        cos = (lq @ lq.T) / np.sqrt(np.outer(lnq, lnq))
        for i in range(len(lids)):
            mask = np.arange(len(lids)) != i
            order = np.lexsort((lids[mask], -cos[i][mask]))[:3]
            for rk, j in enumerate(order, start=1):
                expected.append(
                    (
                        layer,
                        int(lids[i]),
                        rk,
                        int(lids[mask][j]),
                        round(float(cos[i][mask][j]), 6),
                    )
                )
    got = sorted(
        (r["layer"], r["vec_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in _rows(spark, sf_dir, "sim_hnsw_upper_graph")
    )
    assert got == sorted(expected)
    for layer, vid, rk, nid, c in got:
        assert nid != vid and -1.000001 <= c <= 1.000001
    # nested memberships: every layer-6 node also appears at 4 and 5
    members = {
        layer: {vid for (la, vid, *_rest) in got if la == layer}
        for layer in (4, 5, 6)
    }
    assert members[6] <= members[5] <= members[4]


# ---- round-11: residual invariants for the round-10 batch ----


def test_anova_two_way_randomized_cells_recompute(spark, tmp_path):
    """Randomized factorial designs (seeded): the Spark key must match
    a Python-bigint recompute cell for cell, and the recomputed
    decomposition must satisfy SSA + SSB + SS_AB + SSW == SS_total
    (the factorial partition identity the fixed-order folds encode)."""
    import random
    from collections import defaultdict

    rng = random.Random(0xA1)
    for trial in range(3):
        levels_a = ["A", "N", "R", "X"][: rng.randint(2, 4)]
        levels_b = ["F", "O", "P"][: rng.randint(2, 3)]
        rows, key = [], 0
        for a in levels_a:
            for b in levels_b:
                for _ in range(rng.randint(2, 6)):
                    key += 1
                    rows.append(
                        (key, 1, 1, 1, float(rng.randint(1, 50)),
                         1.0, 0.0, 0.0, a, b, "2024-01-01")
                    )
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate string",
        ).selectExpr(
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus",
            "cast(l_shipdate as timestamp) as l_shipdate",
        )
        d = _stage(li, tmp_path / f"t{trial}", "lineitem")
        (r,) = QUERIES["stat_anova_two_way"].fn(spark, d).collect()

        cells = defaultdict(lambda: [0, 0, 0])
        for row in rows:
            q = round(row[4])
            c = cells[(row[8], row[9])]
            c[0] += 1
            c[1] += q
            c[2] += q * q
        n_t = sum(c[0] for c in cells.values())
        s_t = sum(c[1] for c in cells.values())
        q_t = sum(c[2] for c in cells.values())
        cells_term = sum(
            float(c[1]) ** 2 / c[0] for _, c in sorted(cells.items())
        )
        am, bm = defaultdict(lambda: [0, 0]), defaultdict(lambda: [0, 0])
        for (a, b), c in cells.items():
            am[a][0] += c[0]
            am[a][1] += c[1]
            bm[b][0] += c[0]
            bm[b][1] += c[1]
        a_term = sum(float(v[1]) ** 2 / v[0] for _, v in sorted(am.items()))
        b_term = sum(float(v[1]) ** 2 / v[0] for _, v in sorted(bm.items()))
        ka, kb = len(am), len(bm)
        grand = float(s_t) ** 2 / n_t
        ssa, ssb = a_term - grand, b_term - grand
        ssab = cells_term - a_term - b_term + grand
        ssw = float(q_t) - cells_term
        sst = float(q_t) - grand
        # the factorial partition identity on the recompute
        assert abs((ssa + ssb + ssab + ssw) - sst) <= 1e-6 * max(1.0, sst)
        msw = ssw / (n_t - ka * kb)
        assert (r["ka"], r["kb"], r["n"]) == (ka, kb, n_t)
        for got, ss, dff in (
            (r["f_a"], ssa, ka - 1),
            (r["f_b"], ssb, kb - 1),
            (r["f_ab"], ssab, (ka - 1) * (kb - 1)),
        ):
            ref = (ss / dff) / msw
            assert abs(got - ref) < max(1e-5, abs(ref) * 1e-6), (got, ref)


def test_hnsw_layer_cap_fails_loudly(spark, sf_dir):
    """A layer over the broadcast cap must raise the documented
    ValueError (the OOM-proofing contract), not truncate or spill."""
    import pytest

    from bigdata_financial_reporting_spark.operators.similarity import (
        hnsw_upper_layer_graph,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="members"):
        hnsw_upper_layer_graph(
            e, "vec_id", "embedding", min_layer=1, max_layer=1, cap=1
        )


def test_hnsw_exactness_guard_rejects_oversized_values(spark):
    """Vectors whose micro-quantized magnitude breaks the exact-integer
    dot-product bound (qmax^2 * dim >= 2^53) must fail loudly (the
    round-10 advice guard), never silently lose bit-stability."""
    import pytest

    from bigdata_financial_reporting_spark.operators.similarity import (
        hnsw_upper_layer_graph,
    )

    # |x| = 16 -> qv = 1.6e7; qv^2 * 64 = 1.6e16 >= 2^53 (~9.0e15),
    # while nq = 1.6e16 stays far below int64 max (no wrap en route)
    vecs = [(i, [16.0] * 64) for i in range(1, 65)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="rescale"):
        hnsw_upper_layer_graph(df, "vec_id", "embedding",
                               min_layer=1, max_layer=1)


def test_hnsw_negation_invariance_and_level_halving(spark, sf_dir):
    """cos(-a,-b) == cos(a,b) and levels hash only ids, so negating the
    whole corpus must reproduce the graph bit for bit; and each deeper
    layer's population is a hash-deterministic ~halving of the previous
    (asserted as a loose band — the halving is exact in expectation,
    binomial in realization)."""
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.similarity import (
        hnsw_upper_layer_graph,
    )
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    neg = e.select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    kw = dict(min_layer=2, max_layer=4, k=3)
    got = sorted(
        map(tuple, hnsw_upper_layer_graph(e, "vec_id", "embedding",
                                          **kw).collect())
    )
    got_neg = sorted(
        map(tuple, hnsw_upper_layer_graph(neg, "vec_id", "embedding",
                                          **kw).collect())
    )
    assert got and got == got_neg
    sizes = {
        layer: len({r[1] for r in got if r[0] == layer})
        for layer in (2, 3, 4)
    }
    for shallow, deep in ((2, 3), (3, 4)):
        if sizes[shallow] >= 40:
            ratio = sizes[deep] / sizes[shallow]
            assert 0.25 <= ratio <= 0.75, sizes
