"""Physical-plan introspection.

The 100 TB posture is a property of the PLAN, not of small-data timings:
a query that broadcasts its dims, pushes its filters into the scan,
prunes columns, and shuffles once will scale; one that doesn't, won't —
regardless of how fast it looks at sf0.01. These helpers turn
``df.explain`` output into assertable facts so tests (and CI) can pin
the plan shape, not just the result values.

All parsing works on the formatted explain string — stable enough
across Spark 3.5/4.x for the coarse properties asserted here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "simple") -> str:
    """The physical plan as a string (what ``df.explain`` prints).

    Default is "simple": one node per line with inline arguments
    (``Exchange hashpartitioning(...)``, ``*(3) HashAggregate``), which
    is what the regex helpers below parse. "formatted" splits arguments
    away from node names and is for human reading.
    """
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded;
    AQE-reused exchanges print as ReusedExchange, not counted) — the
    dominant cost driver at scale."""
    plan = physical_plan(df)
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            plan,
        )
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the file scan (``PushedFilters: [...]``).

    Parses formatted mode: simple mode truncates long scan attribute
    lists with ``...``.
    """
    plan = physical_plan(df, mode="formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ``ReadSchema`` — column pruning made
    visible (a 2-column projection must not read 16 columns). Formatted
    mode: simple mode truncates scan attributes."""
    plan = physical_plan(df, mode="formatted")
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct whole-stage-codegen span ids (the ``*(n)`` markers in
    simple mode); wider spans = more of the query compiled into single
    JVM loops."""
    plan = physical_plan(df)
    return sorted({int(x) for x in re.findall(r"\*\((\d+)\)", plan)})


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by bench diagnostics."""
    plan = physical_plan(df)
    return {
        "broadcast_hash_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "broadcast_nested_loop": "BroadcastNestedLoopJoin" in plan,
        "cartesian": "CartesianProduct" in plan,
        "exchanges": len(
            re.findall(
                r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
                plan,
            )
        ),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "pushed_filters": pushed_filters(df),
        "codegen_spans": len(wholestage_codegen_ids(df)),
        "rowbased_python_udf": "BatchEvalPython" in plan,
        "arrow_python_udf": "ArrowEvalPython" in plan,
    }
