"""Ops-tool queries: table profiling (the approx-ndv column is dropped
from the oracle projection — it is tolerance-tested in
tests/test_ops_tools.py instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.profile import profile_table
from bigdata_financial_reporting_spark.queries.registry import register
from bigdata_financial_reporting_spark.sources.catalog import load_table

_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column,
           count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           CAST(min({c}) AS VARCHAR) AS min_s,
           CAST(max({c}) AS VARCHAR) AS max_s
    FROM customer
    """
    for c in _COLS
)


@register("ops_table_profile", oracle=_ORACLE, category="ops")
def ops_table_profile(spark, sf_dir):
    """Single-pass per-column profile of customer. Floats render via
    the same cast-to-string on both engines; approx ndv is excluded
    here (tolerance-tested separately)."""
    c = load_table(spark, sf_dir, "customer")
    return profile_table(c).select("column", "n_rows", "n_nulls", "min_s", "max_s")


@register(
    "ops_validate_quality",
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM orders)
    SELECT * FROM (
      SELECT 'not_null:o_custkey' AS rule, n.n_rows,
             (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
      FROM n
      UNION ALL
      SELECT 'unique:o_orderkey', n.n_rows,
             (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)
      FROM n
      UNION ALL
      SELECT 'in_range:o_totalprice(0,300000)', n.n_rows,
             (SELECT count(*) FROM orders
              WHERE o_totalprice IS NOT NULL
                AND o_totalprice NOT BETWEEN 0 AND 300000)
      FROM n
      UNION ALL
      SELECT 'accepted_values:o_orderstatus(O,F,P)', n.n_rows,
             (SELECT count(*) FROM orders
              WHERE o_orderstatus IS NOT NULL
                AND o_orderstatus NOT IN ('O', 'F', 'P'))
      FROM n
    )
    """,
    category="ops",
)
def ops_validate_quality(spark, sf_dir):
    """Expectations-style validation of orders in one aggregation pass:
    null check, key uniqueness, numeric range, accepted categorical
    values. The ingest gate shape for training-data batches."""
    from bigdata_financial_reporting_spark.operators.quality import (
        accepted_values,
        in_range,
        not_null,
        unique,
        validate,
    )

    o = load_table(spark, sf_dir, "orders")
    rules = [
        not_null("o_custkey"),
        unique("o_orderkey"),
        in_range("o_totalprice", 0, 300000),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
    ]
    return validate(o, rules).select("rule", "n_rows", "n_violations")
