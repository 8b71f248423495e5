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
