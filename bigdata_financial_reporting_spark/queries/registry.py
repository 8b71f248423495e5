"""Registry plumbing for the driver contract (__spark_entry__.py).

Determinism rules every registered query follows (SURVEY.md §2B
preamble):

- computed/aggregate columns are aliased identically in Spark and SQL;
- float outputs are rounded to 6 decimals on BOTH sides;
- date/timestamp outputs are rendered as strings on BOTH sides
  (``date_format`` / ``strftime``) so engine-internal precision
  (micros vs nanos) cannot leak into the hash;
- approximate / streaming queries register with ``oracle=None`` and are
  verified by tolerance or batch-equivalence tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for ≈ (rows-only) checks
    category: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, category: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
