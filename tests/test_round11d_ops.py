"""Property tests for the fourth round-11 extension batch: Bartlett's
variance-homogeneity test and the nearest-direction as-of join.
Oracle-hash parity is test_oracle's job; these pin an independent
numpy recomputation of Bartlett's T, its consistency with the sibling
Levene key, the nearest join's minimality/tie/no-match contracts
against a DuckDB recompute, and the operator's tie rules on a
hand-built frame.
"""

from __future__ import annotations

import numpy as np

from bigdata_financial_reporting_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_bartlett_matches_numpy_recompute(spark, sf_dir, ddb):
    """Independent recomputation via the classic textbook route
    (per-group float variances, no decimal staging)."""
    raw = ddb.execute(
        "SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for g, v in raw:
        groups.setdefault(g, []).append(v)
    ss = {
        g: float(((np.array(v, dtype=np.float64) - np.mean(v)) ** 2).sum())
        for g, v in groups.items()
    }
    n = {g: len(v) for g, v in groups.items()}
    k, nt = len(groups), sum(n.values())
    sp2 = sum(ss.values()) / (nt - k)
    t = (nt - k) * np.log(sp2) - sum(
        (n[g] - 1) * np.log(ss[g] / (n[g] - 1)) for g in groups
    )
    c = 1 + (sum(1.0 / (n[g] - 1) for g in groups) - 1.0 / (nt - k)) / (
        3 * (k - 1)
    )
    (r,) = _rows(spark, sf_dir, "stat_bartlett")
    assert r["k"] == k and r["nt"] == nt
    assert abs(r["bartlett_t"] - t / c) < 1e-4


def test_bartlett_levene_same_population(spark, sf_dir):
    """Both homoscedasticity keys must see the same groups and both
    statistics are non-negative by construction."""
    (b,) = _rows(spark, sf_dir, "stat_bartlett")
    (lv,) = _rows(spark, sf_dir, "stat_levene")
    assert b["k"] == lv["k"] and b["nt"] == lv["nt"]
    assert b["bartlett_t"] >= 0.0
    assert lv["levene_w"] >= 0.0


def test_asof_nearest_minimality_and_nomatch(spark, sf_dir, ddb):
    """The chosen distance must equal the true minimum |event ts -
    asof ts| per order (recomputed in one DuckDB pass), and direction
    is NULL exactly for custkeys with no events."""
    got = {
        r["o_orderkey"]: r for r in _rows(spark, sf_dir, "join_asof_nearest")
    }
    truth = dict(
        ddb.execute(
            """
        SELECT o.o_orderkey,
               min(abs(epoch_us(e.ts)
                       - epoch_us(TIMESTAMP '2023-12-24'
                                  + INTERVAL (o.o_orderkey % 1080) HOUR)))
        FROM orders o JOIN events e ON e.user_id = o.o_custkey
        GROUP BY o.o_orderkey
        """
        ).fetchall()
    )
    assert set(k for k, r in got.items() if r["direction"] is not None) == set(
        truth
    )
    for key, min_dt in truth.items():
        r = got[key]
        assert r["dt_us"] == min_dt, (key, r["dt_us"], min_dt)
        assert r["nearest_event_id"] is not None
    for key, r in got.items():
        if r["direction"] is None:
            assert r["nearest_event_id"] is None and r["dt_us"] is None


def test_asof_nearest_operator_tie_rules(spark):
    """Hand-built frame: equidistant candidates go backward; an
    equal-ts event is a zero-distance backward match; a left row
    before all events goes forward; equal-ts backward ties break to
    the LARGEST right id, forward ties to the SMALLEST."""
    from pyspark.sql import functions as F

    from bigdata_financial_reporting_spark.operators.asof import (
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [
            (1, "2024-01-10 00:00:00"),  # equidistant: 1d back, 1d fwd
            (2, "2024-01-09 00:00:00"),  # exact hit (tie on id -> larger)
            (3, "2024-01-01 00:00:00"),  # before all -> forward
            (4, "2024-01-20 00:00:00"),  # after all -> backward
        ],
        "k int, t string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-09 00:00:00", 101),
            (1, "2024-01-09 00:00:00", 102),  # same ts, larger id
            (1, "2024-01-11 00:00:00", 103),
            (1, "2024-01-11 00:00:00", 104),
            (2, "2024-01-09 00:00:00", 201),
            (2, "2024-01-09 00:00:00", 202),
            (3, "2024-01-05 00:00:00", 301),
            (3, "2024-01-05 00:00:00", 302),  # fwd tie -> SMALLEST id
            (4, "2024-01-05 00:00:00", 401),
        ],
        "k int, ts string, rid long",
    )
    right = right.withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["k"]: r
        for r in asof_join_nearest(
            left, right, on="k", left_ts="t", right_ts="ts",
            right_cols=["rid"], right_id="rid",
        ).collect()
    }
    assert out[1]["__dir"] == "b" and out[1]["rid"] == 102  # tie -> backward, largest id
    assert out[2]["__dir"] == "b" and out[2]["__dt_us"] == 0 and out[2]["rid"] == 202
    assert out[3]["__dir"] == "f" and out[3]["rid"] == 301  # forward, smallest id
    assert out[4]["__dir"] == "b" and out[4]["rid"] == 401
