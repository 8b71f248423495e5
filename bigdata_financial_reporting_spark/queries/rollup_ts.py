"""Time-series rollup query: hour->day->week cascade over events."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.rollup_ts import timeseries_rollup
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

# DuckDB computes every level directly from raw data; Spark's cascade
# must match exactly (algebraic re-aggregation, no avg-of-avg).
_LEVEL_SQL = """
    SELECT '{g}' AS granularity,
           strftime(date_trunc('{g}', ts), '%Y-%m-%d %H:%M:%S') AS bucket_s,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS v_sum,
           round(min(value), 6) AS v_min,
           round(max(value), 6) AS v_max,
           round(round(sum(value), 4) / count(*), 6) AS v_avg
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
    out = timeseries_rollup(ev, "ts", ["event_type"], "value", ["hour", "day", "week"])
    return out.select(
        "granularity",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "event_type",
        "n",
        F.round("v_sum", 4).alias("v_sum"),
        F.round("v_min", 6).alias("v_min"),
        F.round("v_max", 6).alias("v_max"),
        # v_avg derives from the ROUNDED sum on both sides: cascaded and
        # direct float summation differ in the last bits, so rounding
        # the raw quotient can straddle a decimal boundary; dividing
        # identical rounded sums cannot.
        F.round(F.round(F.col("v_sum"), 4) / F.col("n"), 6).alias("v_avg"),
    )
