"""Regenerate QUERIES.md from the live query registry."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bigdata_financial_reporting_spark.queries import QUERIES

lines = [
    "# Query registry — complete inventory",
    "",
    "Auto-generated from `bigdata_financial_reporting_spark.queries.QUERIES`",
    "(regenerate with `python scripts/gen_queries_md.py`). Every entry is a",
    "`(spark, sf_dir) -> DataFrame` callable exported through",
    "`__spark_entry__.queries()`; **oracle** = exact DuckDB SQL hash-match,",
    "**rows-only** = approximate/sampling query verified by tolerance or",
    "recall tests instead (see tests/).",
    "",
]
cats = {}
for spec in QUERIES.values():
    cats.setdefault(spec.category or "misc", []).append(spec)
total_o = sum(1 for s in QUERIES.values() if s.oracle)
lines.append(f"**{len(QUERIES)} queries** — {total_o} oracle, {len(QUERIES)-total_o} rows-only.")
lines.append("")
for cat in sorted(cats):
    specs = sorted(cats[cat], key=lambda s: s.name)
    lines.append(f"## {cat} ({len(specs)})")
    lines.append("")
    lines.append("| query | check | summary |")
    lines.append("|---|---|---|")
    for s in specs:
        doc = (s.fn.__doc__ or "").strip().split("\n")[0].rstrip()
        kind = "oracle" if s.oracle else "rows-only"
        lines.append(f"| `{s.name}` | {kind} | {doc} |")
    lines.append("")
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
open(out, "w").write("\n".join(lines))
print(f"wrote {out}")
