"""Audit: per-query physical-plan scan counts and exchange counts.

Detects the multi-consumer-without-persist pattern: a query whose
physical plan contains N scans of the same parquet file recomputes
its shared subtree N times per action (Catalyst does not reuse
subtrees across branches with different downstream partitioning).
Prints, for every registry key, the number of Scan parquet nodes per
table, total exchanges, and InMemoryTableScan count, sorted by the
worst duplicate-scan factor. Optimization-round triage tool.

Run: python scripts/audit_scans.py [key ...]
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_financial_reporting_spark.session import get_session  # noqa: E402
from bigdata_financial_reporting_spark.queries import QUERIES  # noqa: E402
from bigdata_financial_reporting_spark.operators.cache import (  # noqa: E402
    release_operator_caches,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

SKIP_PREFIXES = ("stream_",)  # streaming drains execute at build time

SCAN_RE = re.compile(r"FileScan parquet \[[^\]]*\][^\n]*?(\w+)\.parquet")


def _depth(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-*(0123456789)":
        i += 1
    return i


def _live_scans(plan: str) -> Counter:
    """FileScan nodes per table, EXCLUDING those inside an
    InMemoryRelation subtree (the cached build, executed once at
    materialization — the plan printer repeats it under every
    InMemoryTableScan, which would double-count)."""
    out: Counter = Counter()
    cached_depth: int | None = None
    for line in plan.splitlines():
        d = _depth(line)
        if cached_depth is not None and d <= cached_depth:
            cached_depth = None
        if "InMemoryRelation" in line and cached_depth is None:
            cached_depth = d
            continue
        if cached_depth is not None:
            continue
        m = SCAN_RE.search(line)
        if m:
            out[m.group(1)] += 1
    return out


def main() -> None:
    spark = get_session("audit-scans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(QUERIES)
    rows = []
    for name in names:
        if name.startswith(SKIP_PREFIXES) and not sys.argv[1:]:
            continue
        try:
            df = QUERIES[name].fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            rows.append((name, -1, {}, 0, 0, f"ERROR {type(exc).__name__}: {exc}"[:120]))
            release_operator_caches()
            continue
        scans = _live_scans(plan)
        exch = plan.count("Exchange ") + plan.count("Exchange\n")
        exch = len(re.findall(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", plan))
        imts = plan.count("InMemoryTableScan")
        worst = max(scans.values()) if scans else 0
        rows.append((name, worst, dict(scans), exch, imts, ""))
        release_operator_caches()
    rows.sort(key=lambda r: (-r[1], -r[3]))
    for name, worst, scans, exch, imts, err in rows:
        if err:
            print(f"{name:36s} {err}")
        else:
            sc = ", ".join(f"{t}x{c}" for t, c in sorted(scans.items()) if c > 1) or "-"
            print(f"{name:36s} worst_scan={worst:2d} exch={exch:2d} imts={imts:2d} dup_scans: {sc}")


if __name__ == "__main__":
    main()
