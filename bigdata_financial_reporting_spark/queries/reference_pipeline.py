"""The reference's one query shape, re-expressed Spark-first.

Reference pipeline (controller/script.py:22-100): CSV scan -> fillna(0)
-> date-range filter -> global lag window -> daily % return columns ->
global avg -> CSV sinks. Here it runs on the ``events`` fixture:
``value`` plays the price series, ``ts`` the date.

Scale notes: the reference's ``Window.orderBy`` with no partitionBy
(script.py:39) collapses all rows onto one task. The registry keeps
that shape only as the small-input compatibility query
(``ref_daily_returns``); the scale-correct form is
``ref_per_user_returns`` (partitioned by series key), which is also the
flagship ``entry()`` pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

LO, HI = "2024-01-05 00:00:00", "2024-01-12 00:00:00"


def _filtered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # na.fill mirrors reference R7 (script.py:87); fixture has no nulls
    # but semantics are pinned: zero divisors yield NULL returns.
    return ev.na.fill(0).filter((F.col("ts") >= LO) & (F.col("ts") < HI))


@register(
    "ref_daily_returns",
    oracle=f"""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           round(value, 6) AS value,
           round((value / lag(value) OVER (ORDER BY ts, event_id) - 1) * 100, 6) AS ret
    FROM events
    WHERE ts >= TIMESTAMP '{LO}' AND ts < TIMESTAMP '{HI}'
    """,
    category="reference",
)
def ref_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8-R11: range filter -> global lag window -> % return.

    Global-order window = reference compatibility mode (small inputs
    only). Tie-break on event_id pins determinism.
    """
    w = Window.orderBy("ts", "event_id")
    return _filtered_events(spark, sf_dir).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.round("value", 6).alias("value"),
        F.round((F.col("value") / F.lag("value").over(w) - 1) * 100, 6).alias("ret"),
    )


@register(
    "ref_avg_daily_return",
    oracle=f"""
    WITH r AS (
      SELECT (value / lag(value) OVER (ORDER BY ts, event_id) - 1) * 100 AS ret
      FROM events
      WHERE ts >= TIMESTAMP '{LO}' AND ts < TIMESTAMP '{HI}'
    )
    SELECT round(avg(ret), 6) AS avg_ret, count(*) AS n_rows FROM r
    """,
    category="reference",
)
def ref_avg_daily_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: global avg over the return column (avg skips the first-row
    NULL, matching reference semantics)."""
    w = Window.orderBy("ts", "event_id")
    rets = _filtered_events(spark, sf_dir).select(
        ((F.col("value") / F.lag("value").over(w) - 1) * 100).alias("ret")
    )
    return rets.agg(
        F.round(F.avg("ret"), 6).alias("avg_ret"), F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "ref_daily_returns_scalable",
    oracle=f"""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           round(value, 6) AS value,
           round((value / lag(value) OVER (ORDER BY ts, event_id) - 1) * 100, 6) AS ret
    FROM events
    WHERE ts >= TIMESTAMP '{LO}' AND ts < TIMESTAMP '{HI}'
    """,
    category="reference",
)
def ref_daily_returns_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME global-order result as ref_daily_returns, computed
    scalably: range-partitioned parallel lag + a broadcast boundary
    stitch instead of the reference's all-rows-to-one-task window
    (operators/global_window.py). Identical oracle to ref_daily_returns
    — the rewrite must be invisible in the values."""
    from bigdata_financial_reporting_spark.operators.global_window import (
        global_pct_change,
    )

    ev = _filtered_events(spark, sf_dir)
    out = global_pct_change(ev, ["ts", "event_id"], "value", "ret")
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.round("value", 6).alias("value"),
        F.round("ret", 6).alias("ret"),
    )


@register(
    "ref_per_user_returns",
    oracle=f"""
    WITH r AS (
      SELECT user_id,
             (value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) * 100 AS ret
      FROM events
      WHERE ts >= TIMESTAMP '{LO}' AND ts < TIMESTAMP '{HI}'
    )
    SELECT user_id, round(avg(ret), 6) AS avg_ret, count(ret) AS n_ret
    FROM r GROUP BY user_id
    """,
    category="reference",
)
def ref_per_user_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-correct reference pipeline: per-series (user) partitioned
    window, then per-series mean return. One shuffle on user_id; no
    single-partition collapse."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rets = _filtered_events(spark, sf_dir).select(
        "user_id",
        ((F.col("value") / F.lag("value").over(w) - 1) * 100).alias("ret"),
    )
    return rets.groupBy("user_id").agg(
        F.round(F.avg("ret"), 6).alias("avg_ret"), F.count("ret").alias("n_ret")
    )
