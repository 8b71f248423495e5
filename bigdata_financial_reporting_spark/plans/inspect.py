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


_EXCHANGE_RE = re.compile(
    r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)"
)


def _node_depth(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-*()0123456789":
        i += 1
    return i


def _collect_cached_exchanges(
    lines: list[str], cached: dict[str, int]
) -> int:
    """Live exchange count over ``lines``, extracting every cached
    build (``InMemoryRelation`` subtree) into ``cached`` — RECURSIVELY,
    so an inner cached build embedded in an outer cached build's
    printed body is deduplicated against its live references too
    (round-14 ADVICE: the flat version charged such nested builds once
    inside the outer body AND once at their live reference). Each
    distinct cached body's value in ``cached`` is its OWN live
    exchange count, with nested cached builds excluded (they carry
    their counts under their own keys)."""
    live = 0
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        d = _node_depth(line)
        if "InMemoryRelation" in line:
            # slice off the OUTER tree-art prefix so the same cached
            # subtree printed at different tree positions compares equal
            key_head = line[d:]
            j = i + 1
            body_lines: list[str] = []
            while j < n:
                nxt = lines[j]
                if nxt.strip() and _node_depth(nxt) <= d:
                    break
                body_lines.append(nxt[d:].rstrip())
                j += 1
            # the printer may leave trailing blank lines after a body
            # depending on tree position — normalize so identical
            # builds compare equal
            while body_lines and not body_lines[-1]:
                body_lines.pop()
            key = key_head + "\n" + "\n".join(body_lines)
            if key not in cached:
                cached[key] = 0  # reserve before recursing
                cached[key] = _collect_cached_exchanges(body_lines, cached)
            i = j
            continue
        live += len(_EXCHANGE_RE.findall(line))
        i += 1
    return live


def _executed_exchange_count(plan: str) -> int:
    """Shuffle exchanges that actually EXECUTE, from simple-mode plan
    text. The plan printer repeats a cached build's whole subtree under
    every ``InMemoryTableScan`` referencing it, so a raw text count
    charges a persisted frame's exchanges once per consumer even
    though the build runs once at materialization (round-14: the scan-
    dedup persists made raw counts go UP while executed shuffles went
    down). Count live exchanges plus each DISTINCT InMemoryRelation
    subtree's exchanges once — including builds nested inside other
    builds' printed bodies."""
    # the printer re-numbers expression ids / plan ids per reference of
    # the same cached relation — canonicalize before deduplicating
    plan = re.sub(r"#\d+", "#x", re.sub(r"plan_id=\d+", "plan_id=x", plan))
    cached: dict[str, int] = {}
    live = _collect_cached_exchanges(plan.splitlines(), cached)
    return live + sum(cached.values())


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges that execute per action (broadcast
    exchanges excluded; AQE-reused exchanges print as ReusedExchange,
    not counted; a persisted frame's build exchanges counted once, not
    once per InMemoryTableScan reference) — the dominant cost driver
    at scale."""
    return _executed_exchange_count(physical_plan(df))


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
        "exchanges": _executed_exchange_count(plan),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "pushed_filters": pushed_filters(df),
        "codegen_spans": len(wholestage_codegen_ids(df)),
        "rowbased_python_udf": "BatchEvalPython" in plan,
        "arrow_python_udf": "ArrowEvalPython" in plan,
    }
