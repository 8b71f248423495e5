"""Property tests for the second round-11 extension batch: the
Wilcoxon signed-rank paired test, the Jarque-Bera normality test, and
the manifest orphan-file VACUUM. Each key's oracle-hash parity is
covered by test_oracle; these pin what the hash can't see — an
independent numpy recomputation of the rank statistic, the cross-key
moment identity JB = n/6*(g1^2 + g2^2/4) against the sibling kurtosis
key, and the only-orphans-die / idempotence contract of the vacuum.
"""

from __future__ import annotations

import os

import numpy as np

from bigdata_financial_reporting_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_wilcoxon_matches_numpy_midrank_recompute(spark, sf_dir):
    """Independent recomputation: pull the raw paired differences from
    the fixture, midrank |d| with numpy, and require the key's exact
    integer W+*2 and its 6dp z to match."""
    import duckdb

    con = duckdb.connect()
    d = con.execute(
        f"""
        SELECT CAST(round(l_tax * 100) AS BIGINT)
               - CAST(round(l_discount * 100) AS BIGINT) AS d
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchnumpy()["d"]
    con.close()
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(ad), dtype=np.float64)
    sorted_ad = ad[order]
    i = 0
    while i < len(sorted_ad):
        j = i
        while j < len(sorted_ad) and sorted_ad[j] == sorted_ad[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based midrank
        i = j
    w_plus = float(ranks[d > 0].sum())
    n = len(d)
    _, counts = np.unique(ad, return_counts=True)
    tie3 = float((counts.astype(np.float64) ** 3 - counts).sum())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / np.sqrt(var)

    (r,) = _rows(spark, sf_dir, "stat_wilcoxon_signed_rank")
    assert r["n_nonzero"] == n
    assert r["w_plus_x2"] == int(round(2 * w_plus))
    assert abs(r["z"] - z) < 1e-5


def test_wilcoxon_rank_sum_bounds(spark, sf_dir):
    """0 <= W+ <= n(n+1)/2, so the doubled statistic is bounded by
    n(n+1); ties must exist in a cents-valued domain this narrow."""
    (r,) = _rows(spark, sf_dir, "stat_wilcoxon_signed_rank")
    n = r["n_nonzero"]
    assert 0 <= r["w_plus_x2"] <= n * (n + 1)
    assert n > 0


def test_jarque_bera_cross_key_moment_identity(spark, sf_dir):
    """JB = n/6 * (g1^2 + g2^2/4) must reconcile with the SIBLING
    key's unrounded excess kurtosis on every shared instrument — two
    independently-written moment pipelines over the same bars."""
    jb_rows = {r["user_id"]: r for r in _rows(spark, sf_dir, "fin_jarque_bera")}
    kurt_rows = {
        r["user_id"]: r for r in _rows(spark, sf_dir, "fin_kurtosis_returns")
    }
    assert jb_rows
    shared = set(jb_rows) & set(kurt_rows)
    assert len(shared) == len(jb_rows)  # n>=4 filter only drops, never adds
    for uid in shared:
        jb = jb_rows[uid]
        g2 = kurt_rows[uid]["kurt_excess"]
        n = jb["n_returns"]
        assert n == kurt_rows[uid]["n_returns"]
        expect = n / 6.0 * (jb["skew_g1"] ** 2 + g2 * g2 / 4.0)
        # skew_g1 is rounded at 6dp; JB error from that is ~n*g1*1e-6
        tol = 1e-4 + n * (abs(jb["skew_g1"]) + 1.0) * 1e-5
        assert abs(jb["jb"] - expect) <= tol, (uid, jb["jb"], expect)
        assert jb["jb"] >= -1e-9


def test_jarque_bera_matches_numpy_for_one_instrument(spark, sf_dir):
    """Full numpy recomputation of g1 and JB for the instrument with
    the most returns (quantized exactly as the key quantizes)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH bars AS (
          SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                 arg_max(value, epoch_us(ts)::HUGEINT * 10000000
                                + event_id) AS close
          FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        )
        SELECT user_id, day, close FROM bars ORDER BY user_id, day
        """
    ).fetchall()
    con.close()
    by_uid: dict[int, list[float]] = {}
    for uid, _day, close in rows:
        by_uid.setdefault(uid, []).append(float(close))
    uid, closes = max(by_uid.items(), key=lambda kv: len(kv[1]))
    rq = []
    for prev, cur in zip(closes, closes[1:]):
        if prev > 0 and cur > 0:
            rq.append(round(np.log(cur / prev) * 1e6))
    x = np.array(rq, dtype=np.float64)
    n = len(x)
    m2 = ((x - x.mean()) ** 2).sum()
    m3 = ((x - x.mean()) ** 3).sum()
    m4 = ((x - x.mean()) ** 4).sum()
    g1 = np.sqrt(n) * m3 / m2**1.5
    g2 = n * m4 / m2**2 - 3.0
    jb = n / 6.0 * (g1**2 + g2**2 / 4.0)

    row = [r for r in _rows(spark, sf_dir, "fin_jarque_bera") if r["user_id"] == uid]
    assert row, f"instrument {uid} missing from fin_jarque_bera"
    (r,) = row
    assert r["n_returns"] == n
    assert abs(r["skew_g1"] - g1) < 1e-4
    assert abs(r["jb"] - jb) < 1e-3 + abs(jb) * 1e-6


def test_vacuum_deletes_only_orphans_and_is_idempotent(spark, tmp_path):
    """Direct operator contract: stage two live versions plus an
    aborted commit; vacuum must reap exactly the aborted files, leave
    both snapshots byte-identical, and a second vacuum must be a
    no-op (idempotence)."""
    from bigdata_financial_reporting_spark.operators.manifest import (
        commit_version,
        files_of,
        vacuum_orphans,
    )

    table_dir = os.path.join(str(tmp_path), "vac")
    df1 = spark.range(10).withColumnRenamed("id", "k")
    df2 = spark.range(10, 20).withColumnRenamed("id", "k")
    v1 = commit_version(df1, table_dir)
    v2 = commit_version(df2, table_dir, base_files=files_of(table_dir, v1))
    live_before = set(files_of(table_dir, v1)) | set(files_of(table_dir, v2))
    aborted = os.path.join(table_dir, "commit-deadbeef0000")
    spark.range(100, 105).write.parquet(aborted)
    orphan_files = {
        os.path.join(aborted, f)
        for f in os.listdir(aborted)
        if f.endswith(".parquet")
    }

    deleted = vacuum_orphans(table_dir)
    assert set(deleted) == orphan_files
    assert not os.path.exists(aborted)  # emptied staging dir removed
    for f in live_before:
        assert os.path.exists(f), f"vacuum deleted a live file: {f}"
    got = {
        r["k"]
        for r in spark.read.parquet(*files_of(table_dir, v2)).collect()
    }
    assert got == set(range(20))
    assert vacuum_orphans(table_dir) == []


def test_vacuum_survives_subdirs_and_spares_inflight_staging(spark, tmp_path):
    """Round-11 advice guards: (a) an orphan staging dir that also
    holds a SUBDIRECTORY (a killed writer's _temporary) must have its
    orphan parquet reaped without the cleanup crashing on
    IsADirectoryError — the dir itself stays because not every entry
    was this vacuum's to remove; (b) a freshly created, still-EMPTY
    staging dir (an in-flight writer that hasn't written yet) is not
    touched at all."""
    from bigdata_financial_reporting_spark.operators.manifest import (
        commit_version,
        vacuum_orphans,
    )

    table_dir = os.path.join(str(tmp_path), "vac2")
    commit_version(spark.range(5).withColumnRenamed("id", "k"), table_dir)

    aborted = os.path.join(table_dir, "commit-cafecafe0000")
    spark.range(50, 55).write.parquet(aborted)
    os.makedirs(os.path.join(aborted, "_temporary", "0"))
    orphan_files = {
        os.path.join(aborted, f)
        for f in os.listdir(aborted)
        if f.endswith(".parquet")
    }
    inflight = os.path.join(table_dir, "commit-0123456789ab")
    os.makedirs(inflight)

    deleted = vacuum_orphans(table_dir)
    assert set(deleted) == orphan_files
    # dir with the leftover subdirectory survives (cleanup skipped it)
    assert os.path.isdir(os.path.join(aborted, "_temporary"))
    assert not any(f.endswith(".parquet") for f in os.listdir(aborted))
    # the empty in-flight staging dir was not this vacuum's to reap
    assert os.path.isdir(inflight)


def test_vacuum_key_reports_clean_disk(spark, sf_dir):
    rows = {r["version"]: r for r in _rows(spark, sf_dir, "ops_vacuum_orphan_files")}
    assert set(rows) == {0, 1, 2}
    assert all(r["disk_clean"] for r in rows.values())
    assert rows[0]["live"] is False and rows[1]["live"] and rows[2]["live"]
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    nation = load_table(spark, sf_dir, "nation")
    assert rows[0]["n_rows"] == nation.filter("n_nationkey >= 20").count()
    assert rows[1]["n_rows"] == nation.filter("n_nationkey < 10").count()
    assert rows[2]["n_rows"] == nation.filter("n_nationkey < 20").count()
