"""Time-series rollup query: hour->day->week cascade over events."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.functions.exact import (
    duck_half_div,
    spark_half_div,
)
from bigdata_financial_reporting_spark.operators.rollup_ts import timeseries_rollup
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

# DuckDB computes every level directly from raw data; Spark's cascade
# must match exactly (algebraic re-aggregation, no avg-of-avg). Sums
# run in exact integer micro-units (HUGEINT here, decimal(38,0) in the
# cascade) so the cascaded and direct sums are bit-identical at any
# scale — a raw double sum drifted past the 4dp rounding at the 10x
# corpus (round-6 at-scale red).
_S4 = duck_half_div("sum(CAST(round(value * 1000000.0) AS BIGINT))", "100")
_A6 = duck_half_div(
    "sum(CAST(round(value * 1000000.0) AS BIGINT))", "count(*)"
)
_LEVEL_SQL = f"""
    SELECT '{{g}}' AS granularity,
           strftime(date_trunc('{{g}}', ts), '%Y-%m-%d %H:%M:%S') AS bucket_s,
           event_type,
           count(*) AS n,
           CAST({_S4} AS DOUBLE) / 10000.0 AS v_sum,
           round(min(value), 6) AS v_min,
           round(max(value), 6) AS v_max,
           CAST({_A6} AS DOUBLE) / 1000000.0 AS v_avg
    FROM events
    GROUP BY 2, 3
"""


@register(
    "rollup_timeseries",
    oracle=" UNION ALL ".join(
        _LEVEL_SQL.format(g=g) for g in ["hour", "day", "week"]
    ),
    category="rollup",
)
def rollup_timeseries(spark, sf_dir):
    """Multi-granularity rollup (hour/day/week) in one scan: coarser
    levels re-aggregate the finer level's partials. Oracle recomputes
    each level from raw rows — the cascade must agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    out = timeseries_rollup(
        ev, "ts", ["event_type"], "value", ["hour", "day", "week"],
        quantize=1_000_000,
    )
    return out.select(
        "granularity",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "event_type",
        "n",
        # v_sum (4dp) and v_avg (6dp) render from the exact micro-unit
        # cascade sum with pure-integer half-away division — the
        # cascaded and direct sums are bit-identical at any scale, and
        # no float round() ever runs (exact-half divergence class,
        # functions/exact.py)
        (F.expr(spark_half_div("v_sum_units", "100")).cast("double") / 10000.0)
        .alias("v_sum"),
        F.round("v_min", 6).alias("v_min"),
        F.round("v_max", 6).alias("v_max"),
        (
            F.expr(spark_half_div("v_sum_units", "n")).cast("double")
            / 1000000.0
        ).alias("v_avg"),
    )
