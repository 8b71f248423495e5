"""Bucketed-table co-location test (SURVEY.md §7.4 'bucketing for
co-located joins'): two tables bucketed on the join key must join with
ZERO shuffle exchanges, and the result must equal the plain join."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.plans.inspect import count_exchanges
from bigdata_financial_reporting_spark.sources.catalog import load_table
from bigdata_financial_reporting_spark.sources.writers import write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(
        o, "b_orders", ["o_custkey"], 8, path=os.path.join(str(tmp_path), "bo")
    )
    write_bucketed(
        c, "b_customer", ["c_custkey"], 8, path=os.path.join(str(tmp_path), "bc")
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    to, tc = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so co-location is what's being tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(to).join(
            spark.table(tc), F.col("o_custkey") == F.col("c_custkey")
        )
        assert count_exchanges(joined) == 0, "bucketed join still shuffles"

        # and an un-bucketed read of the same data DOES shuffle
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        plain = o.join(c, o.o_custkey == c.c_custkey)
        assert count_exchanges(plain) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    to, tc = bucketed_tables
    bucketed = (
        spark.table(to)
        .join(spark.table(tc), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .first()
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .first()
    )
    assert bucketed.n == plain.n and bucketed.s == plain.s
