"""Skew-mitigation queries: salted aggregation / salted join.

Both produce EXACTLY the unsalted result (salting redistributes work,
never changes values), so the oracles are the plain GROUP BY / JOIN —
the strongest possible check that the mitigation is transparent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.skew import salted_agg, salted_join
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS value_sum,
           round(avg(value), 6) AS value_avg,
           round(max(value), 6) AS value_max
    FROM events
    GROUP BY event_type
    """,
    category="skew",
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation on a low-cardinality key
    (event_type: every key is 'hot' — the worst case for a plain hash
    agg at scale). Result is bit-identical to the direct groupBy."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": "count(*)",
            "value_sum_raw": "sum(value)",
            "value_avg_raw": "avg(value)",
            "value_max_raw": "max(value)",
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round("value_sum_raw", 4).alias("value_sum"),
        F.round("value_avg_raw", 6).alias("value_avg"),
        F.round("value_max_raw", 6).alias("value_max"),
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 4) AS price_sum
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    """,
    category="skew",
)
def skew_salted_join(spark, sf_dir):
    """Salted equi-join (big orders x replicated customer slice) then
    aggregate; equals the plain join bit-for-bit."""
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .withColumnRenamed("c_custkey", "custkey")
        .select("custkey", "c_mktsegment")
    )
    joined = salted_join(o, c, on="custkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("price_sum"),
    )
