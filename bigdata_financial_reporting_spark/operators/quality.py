"""Data-quality validation: expectations evaluated in one pass.

The pre-ingest gate a training-data pipeline runs before accepting a
batch: declare rules per column, get one row per rule with the
violation count — computed in a SINGLE aggregation over one scan
(conditional counts, no per-rule jobs).

Rule kinds:
- ``not_null(col)``
- ``unique(col)``            (needs one extra distinct count per rule)
- ``in_range(col, lo, hi)``  (inclusive bounds; NULLs don't violate)
- ``matches(col, regex)``    (NULLs don't violate)
- ``accepted_values(col, values)``
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    col: str
    args: tuple = field(default_factory=tuple)

    @property
    def name(self) -> str:
        extra = f"({','.join(map(str, self.args))})" if self.args else ""
        return f"{self.kind}:{self.col}{extra}"


def not_null(col: str) -> Rule:
    return Rule("not_null", col)


def unique(col: str) -> Rule:
    return Rule("unique", col)


def in_range(col: str, lo, hi) -> Rule:
    return Rule("in_range", col, (lo, hi))


def matches(col: str, regex: str) -> Rule:
    return Rule("matches", col, (regex,))


def accepted_values(col: str, values: list) -> Rule:
    return Rule("accepted_values", col, tuple(values))


def _violation_expr(r: Rule) -> Column:
    c = F.col(r.col)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "in_range":
        lo, hi = r.args
        return c.isNotNull() & ~c.between(lo, hi)
    if r.kind == "matches":
        return c.isNotNull() & ~c.rlike(r.args[0])
    if r.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(list(r.args))
    raise ValueError(f"unknown rule kind {r.kind!r}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: ``rule, n_rows, n_violations, passed``.

    Row-level rules share one aggregation pass; each ``unique`` rule
    adds a count-distinct to the same pass (uniqueness violations =
    n_rows - n_nulls - n_distinct... counted as duplicate EXTRA rows).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r.kind == "unique":
            aggs.append(F.count(r.col).alias(f"__cnt_{i}"))
            aggs.append(F.countDistinct(r.col).alias(f"__ndv_{i}"))
        else:
            aggs.append(
                F.count(F.when(_violation_expr(r), 1)).alias(f"__v_{i}")
            )
    wide = df.agg(*aggs)

    entries = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("__n").alias("n_rows"),
                (
                    (F.col(f"__cnt_{i}") - F.col(f"__ndv_{i}"))
                    if r.kind == "unique"
                    else F.col(f"__v_{i}")
                ).cast("long").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return (
        wide.select(F.explode(entries).alias("e"))
        .select("e.*")
        .withColumn("passed", F.col("n_violations") == 0)
    )
