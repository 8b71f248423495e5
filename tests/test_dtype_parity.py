"""Typed-rendering parity between Spark and the DuckDB oracle.

The driver's correctness gate hashes *typed* values via the
Arrow/pandas path, so a column that is BIGINT on one side and DOUBLE on
the other (identical values) still hash-mismatches — exactly what sank
fn_date / fn_math / fn_decimal_money in round 1 (DuckDB epoch()→DOUBLE,
floor()→DOUBLE, sum(BIGINT)→HUGEINT→float64). The value-level oracle
mirror in test_oracle.py compares with Python ``==`` where
``68423 == 68423.0``, so it cannot catch this class.

This test fetches both sides as pandas and asserts the *kind* of every
column matches: all integer widths collapse to "i" (the driver is
width-insensitive: fn_string passed round 1 with Spark int32 vs DuckDB
int64), floats to "f", object columns by their sample Python type with
list/ndarray collapsed together (agg_collect_sorted passed round 1 with
Spark list vs DuckDB ndarray).
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_financial_reporting_spark.queries import QUERIES

from test_oracle import _ORACLE_SMOKE, _tiered

ORACLE_SPECS = [s for s in QUERIES.values() if s.oracle is not None]


def kind(series) -> str:
    k = series.dtype.kind
    if k in "iu":
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        return "datetime"
    nonnull = series.dropna()
    if len(nonnull) == 0:
        return "null"
    v = nonnull.iloc[0]
    if isinstance(v, (list, tuple, np.ndarray)):
        return "seq"
    return type(v).__name__


@pytest.mark.parametrize(
    "spec", _tiered(ORACLE_SPECS, _ORACLE_SMOKE), ids=lambda s: s.name
)
def test_dtype_kind_parity(spec, spark, ddb, sf_dir):
    sp = spec.fn(spark, sf_dir).toPandas()
    dp = ddb.execute(spec.oracle).df()
    assert sorted(sp.columns) == sorted(dp.columns)
    mism = {
        c: (kind(sp[c]), kind(dp[c]))
        for c in sp.columns
        if kind(sp[c]) != kind(dp[c])
    }
    assert not mism, (
        f"{spec.name}: typed-rendering divergence (driver hash would fail): {mism}"
    )
