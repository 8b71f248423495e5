"""Property tests for the third round-11 extension batch: the Friedman
blocked rank test, the Parkinson / Garman-Klass range volatility, and
the zero-copy shallow clone. Oracle-hash parity is test_oracle's job;
these pin what the hash can't see — an independent numpy midrank
recomputation of Q, the GK<->Parkinson inequality and a per-instrument
numpy recompute, and the clone's isolation / zero-copy / single-winner
contracts driven directly on the operator.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from bigdata_financial_reporting_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def _midranks(values: np.ndarray) -> np.ndarray:
    """1-based midranks (average rank over ties), independent of the
    engine's doubled-rank identity."""
    order = np.argsort(values, kind="stable")
    ranks = np.empty(len(values), dtype=np.float64)
    sv = values[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def test_friedman_matches_numpy_midrank_recompute(spark, sf_dir):
    """Rebuild the (block x treatment) cell table from the fixture,
    midrank each block with numpy, and recompute the tie-corrected Q
    via the classic (chi2 / tie-correction) route — a DIFFERENT
    algebraic path than the key's doubled-rank Conover form; they are
    equal identically, so 6dp agreement is required."""
    import duckdb

    con = duckdb.connect()
    cells = con.execute(
        f"""
        SELECT user_id, event_type,
               sum(CAST(round(value * 1000000.0) AS HUGEINT)) AS v
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    k = con.execute(
        f"SELECT count(DISTINCT event_type) FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    con.close()
    by_block: dict[int, dict[str, int]] = {}
    for uid, et, v in cells:
        by_block.setdefault(uid, {})[et] = int(v)
    complete = {u: d for u, d in by_block.items() if len(d) == k}
    n = len(complete)
    assert n > 0

    types = sorted({et for d in complete.values() for et in d})
    rank_sums = dict.fromkeys(types, 0.0)
    tie_corr_sum = 0.0  # sum over blocks of (t^3 - t)
    for d in complete.values():
        vals = np.array([d[t] for t in types], dtype=np.float64)
        ranks = _midranks(vals)
        for t, r in zip(types, ranks):
            rank_sums[t] += r
        _, counts = np.unique(vals, return_counts=True)
        tie_corr_sum += float((counts.astype(np.float64) ** 3 - counts).sum())
    rj = np.array([rank_sums[t] for t in types])
    chi2 = 12.0 / (n * k * (k + 1)) * (rj**2).sum() - 3.0 * n * (k + 1)
    c = 1.0 - tie_corr_sum / (n * (k**3 - k))
    q = chi2 / c

    (r,) = _rows(spark, sf_dir, "stat_friedman")
    assert r["k"] == k
    assert r["n_blocks"] == n
    assert abs(r["q_stat"] - q) < 1e-4, (r["q_stat"], q)


def test_friedman_shape_and_bounds(spark, sf_dir):
    """Q >= 0 (it is a scaled sum of squares), and Q is bounded by the
    no-ties maximum n(k-1) reached when every block ranks identically."""
    (r,) = _rows(spark, sf_dir, "stat_friedman")
    assert r["q_stat"] >= 0.0
    assert r["q_stat"] <= r["n_blocks"] * (r["k"] - 1) + 1e-9


def test_parkinson_matches_numpy_for_one_instrument(spark, sf_dir):
    """Full numpy recomputation of both estimators for the instrument
    with the most bar days, quantized exactly as the key quantizes."""
    import duckdb

    con = duckdb.connect()
    bars = con.execute(
        f"""
        SELECT user_id, max(value) AS high, min(value) AS low,
               arg_min(value, epoch_us(ts)::HUGEINT * 10000000 + event_id)
                 AS open_px,
               arg_max(value, epoch_us(ts)::HUGEINT * 10000000 + event_id)
                 AS close_px
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY user_id, strftime(ts, '%Y-%m-%d')
        """
    ).fetchall()
    con.close()
    by_uid: dict[int, list[tuple]] = {}
    for uid, hi, lo, op, cl in bars:
        if lo > 0:
            by_uid.setdefault(uid, []).append((hi, lo, op, cl))
    uid, days = max(by_uid.items(), key=lambda kv: len(kv[1]))
    hq = np.array(
        [round(np.log(h / lo) * 1e6) for h, lo, _, _ in days], dtype=np.float64
    )
    cq = np.array(
        [round(np.log(c / o) * 1e6) for _, _, o, c in days], dtype=np.float64
    )
    n = len(days)
    ln2 = 0.6931471805599453
    park = (hq**2).sum() / 1e12 / (4.0 * ln2 * n)
    gk = (0.5 * (hq**2).sum() / 1e12 - (2.0 * ln2 - 1.0) * (cq**2).sum() / 1e12) / n

    row = [
        r for r in _rows(spark, sf_dir, "fin_parkinson_vol") if r["user_id"] == uid
    ]
    assert row, f"instrument {uid} missing from fin_parkinson_vol"
    (r,) = row
    assert r["n_days"] == n
    assert abs(r["parkinson_var"] - park) < 1e-5
    assert abs(r["garman_klass_var"] - gk) < 1e-5


def test_parkinson_gk_inequalities(spark, sf_dir):
    """Parkinson is a scaled square (never negative); GK drops a
    non-negative term from 0.5*E[hq^2], so GK <= 2*ln2 * Parkinson
    identically (0.5*E[h^2] = 2*ln2*park)."""
    rows = _rows(spark, sf_dir, "fin_parkinson_vol")
    assert rows
    ln2 = 0.6931471805599453
    for r in rows:
        assert r["parkinson_var"] >= 0.0
        assert r["garman_klass_var"] <= 2.0 * ln2 * r["parkinson_var"] + 1e-6


def test_clone_isolation_zero_copy_and_single_winner(spark, tmp_path):
    """Direct operator contract: the clone keeps reading the cloned
    snapshot after the source commits again; the clone dir holds no
    parquet of its own; cloning onto an existing table loses the
    manifest-v1 race loudly."""
    from bigdata_financial_reporting_spark.operators.manifest import (
        clone_table,
        commit_version,
        files_of,
    )

    src = os.path.join(str(tmp_path), "src")
    dst = os.path.join(str(tmp_path), "dst")
    v1 = commit_version(spark.range(10).withColumnRenamed("id", "k"), src)
    cloned = clone_table(src, dst)
    assert set(cloned) == set(files_of(src, v1))
    commit_version(
        spark.range(10, 25).withColumnRenamed("id", "k"),
        src,
        base_files=files_of(src, v1),
    )
    got = {r["k"] for r in spark.read.parquet(*files_of(dst, 1)).collect()}
    assert got == set(range(10))  # v2 of the source is invisible
    assert not any(
        f.endswith(".parquet") for _, _, fs in os.walk(dst) for f in fs
    )
    with pytest.raises(RuntimeError, match="manifest-v1"):
        clone_table(src, dst)


def test_clone_key_reports(spark, sf_dir):
    rows = {(r["side"], r["version"]): r for r in _rows(spark, sf_dir, "ops_clone_shallow")}
    assert set(rows) == {("src", 1), ("src", 2), ("src", 3), ("clone", 1)}
    assert all(r["zero_copy"] for r in rows.values())
    from bigdata_financial_reporting_spark.sources.catalog import load_table

    nation = load_table(spark, sf_dir, "nation")
    assert rows[("src", 1)]["n_rows"] == nation.filter("n_nationkey < 10").count()
    assert rows[("src", 2)]["n_rows"] == nation.filter("n_nationkey < 20").count()
    assert rows[("src", 3)]["n_rows"] == nation.count()
    assert rows[("clone", 1)]["n_rows"] == rows[("src", 2)]["n_rows"]
