"""Differential tests: every registered query with an oracle runs on
both engines and must agree on row count, column names, and an
order-insensitive canonicalized value multiset — a local mirror of the
driver's t2 correctness gate."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from bigdata_financial_reporting_spark.queries import QUERIES


def canon_value(v):
    """Canonicalize one cell so Spark and DuckDB renderings compare equal."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard against -0.0 and float noise beyond 6dp
        r = round(v, 6)
        return 0.0 if r == 0 else r
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dt.timedelta):
        return v.total_seconds()
    return v


def canon_rows(cols, rows):
    """Sort columns by name, canonicalize cells, return sorted multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


ORACLE_SPECS = [s for s in QUERIES.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in QUERIES.values() if s.oracle is None]


def assert_no_complex_output_types(sdf, name):
    """Registry-wide guard (round-3 verdict item 2): the external
    driver's canonicalizer does a pandas ``sort_values`` over every
    output column and crashes on list/dict cells (``TypeError:
    unhashable type: 'list'`` — cost two hard driver failures in r3).
    No driver-facing schema may contain Array/Map/Struct; serialize
    with to_json/concat_ws instead (cf. agg_collect_sorted). No
    whitelist — every registered query must comply."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} would crash the "
        f"driver canonicalizer — serialize via to_json/concat_ws"
    )


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_match(spec, spark, ddb, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    assert_no_complex_output_types(sdf, spec.name)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    # Two engines agreeing on an EMPTY result proves nothing (a date
    # window outside the fixture's range, an unreachable threshold).
    # Every registered query must produce rows at the test SF.
    assert len(s_rows) > 0, f"{spec.name}: vacuous oracle match on 0 rows"
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not mism, f"{spec.name}: {len(mism)} mismatched rows; first 3: {mism[:3]}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spec, spark, sf_dir):
    """No-oracle (approximate/streaming) queries must at least run,
    produce a stable schema, and return rows (an empty result checks
    nothing); value checks live in dedicated tests."""
    sdf = spec.fn(spark, sf_dir)
    assert_no_complex_output_types(sdf, spec.name)
    assert sdf.columns
    assert sdf.count() > 0, f"{spec.name}: empty result"
