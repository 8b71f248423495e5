"""Skew-mitigation queries: salted aggregation / salted join.

Both produce EXACTLY the unsalted result (salting redistributes work,
never changes values), so the oracles are the plain GROUP BY / JOIN —
the strongest possible check that the mitigation is transparent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.functions.exact import (
    cents,
    duck_cents,
    duck_dec2d,
    duck_half_div,
    duck_units,
    micro_units,
    spark_dec2d,
    spark_half_div,
)
from bigdata_financial_reporting_spark.operators.skew import salted_agg, salted_join
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST({vs} AS DOUBLE) / 10000.0 AS value_sum,
           CAST({va} AS DOUBLE) / 1000000.0 AS value_avg,
           round(max(value), 6) AS value_max
    FROM events
    GROUP BY event_type
    """.format(
        vs=duck_half_div("sum(" + duck_units("value") + ")", "100"),
        va=duck_half_div("sum(" + duck_units("value") + ")", "count(*)"),
    ),
    category="skew",
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation on a low-cardinality key
    (event_type: every key is 'hot' — the worst case for a plain hash
    agg at scale). Result is bit-identical to the direct groupBy. The
    value sum/avg run on exact micro-unit integers because salting
    makes the double merge DOUBLY order-dependent (per-salt partials
    then the per-key merge) — with decimal partials both phases are
    exact; max is order-independent as-is."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_u", micro_units(F.col("value"))
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": "count(*)",
            "value_sum_u": "sum(value_u)",
            "value_max_raw": "max(value)",
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        (
            F.expr(spark_half_div("value_sum_u", "100")).cast("double")
            / 10000.0
        ).alias("value_sum"),
        (
            F.expr(spark_half_div("value_sum_u", "n")).cast("double")
            / 1000000.0
        ).alias("value_avg"),
        F.round("value_max_raw", 6).alias("value_max"),
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           {ps} / 100.0 AS price_sum
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    """.format(ps=duck_dec2d("sum(" + duck_cents("o_totalprice") + ")")),
    category="skew",
)
def skew_salted_join(spark, sf_dir):
    """Salted equi-join (big orders x replicated customer slice) then
    aggregate; equals the plain join bit-for-bit — the price sum runs
    in exact integer cents so the doubly-shuffled merge stays exact."""
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
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("o_totalprice"))).alias("price_c"),
        )
        .select(
            "o_orderpriority",
            "n",
            (F.expr(spark_dec2d("price_c")) / 100.0).alias("price_sum"),
        )
    )
