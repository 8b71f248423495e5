#!/usr/bin/env python3
"""Compute the driver re-check list: registry keys whose implementing
source changed since their LAST driver check (round-7 verdict item 1).

The external driver hash-checks ~50 keys/round; a key whose code was
modified after its last driver row carries stale evidence — locally
green, but the driver hash is the hard signal. This script derives,
for every key in the registry:

1. its last driver-check round (max round over CORRECTNESS_r*.json);
2. the git commit that snapshot the NEWEST round (the commit that
   ADDED the latest artifact) — the diff window is latest-artifact..
   HEAD for EVERY key, because older windows were already triaged by
   previous rounds' syncs: each round's recheck list is computed,
   pinned into RECHECK_FIRST, and either drained by the driver or
   aged into the staleness rotation, so re-litigating a round-8 diff
   at round 14 only re-flags keys whose evidence the rotation is
   already refreshing oldest-first (and, with the transitive closure
   below, would amplify those historical diffs into ~most of the
   budget);
3. whether the key's implementing function changed in that window, at
   two levels:
   - DIRECT: a diff hunk (new-file line range) overlaps the function's
     current source span (decorator + body, via ast at HEAD);
   - HELPER: the function's source references a top-level name (from
     any module under bigdata_financial_reporting_spark/) whose own
     definition span was touched by a hunk — catches e.g. a key whose
     rendering goes through functions/exact.py:spark_dec2d when that
     helper changed. The changed-name set is the TRANSITIVE closure
     over the package's top-level-def reference graph (round 14: a
     plan change inside operators/similarity._nearest_cells flows
     through ivf_topk/ivfpq_topk into every IVF-family key, and the
     one-level analysis missed all of them), with ubiquitous
     infrastructure names excluded from propagation so one load_table
     refactor cannot burn the whole driver budget.

Output: JSON to stdout — {"recheck": [{key, last_round, reasons}...]}
sorted oldest-check-first. ``--update-check`` exits 1 if the list
disagrees with driver_order.RECHECK_FIRST (used by tests; the tuple in
driver_order.py stays static so the driver export never depends on git
being available at import time).
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = "bigdata_financial_reporting_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def last_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for k in json.loads(p.read_text()):
            last[k] = max(last.get(k, 0), rnd)
    return last


def round_commits() -> dict[int, str]:
    out: dict[int, str] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        sha = _git(
            "log", "--diff-filter=A", "--format=%H", "--", p.name
        ).split()
        if sha:
            out[rnd] = sha[-1]
    return out


def changed_spans(base: str) -> dict[str, list[tuple[int, int]]]:
    """file -> new-file line ranges touched since ``base`` (HEAD side)."""
    diff = _git("diff", "--unified=0", f"{base}..HEAD", "--", PKG)
    spans: dict[str, list[tuple[int, int]]] = {}
    cur: str | None = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            cur = line[6:]
        elif line.startswith("@@") and cur:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            start = int(m.group(1))
            count = int(m.group(2) or "1")
            # count==0 → pure deletion at this point; still mark the
            # neighbouring line so span overlap catches it
            spans.setdefault(cur, []).append((start, start + max(count, 1) - 1))
    return spans


def _top_level_defs(path: Path) -> list[tuple[str, int, int]]:
    """(name, start, end) for every top-level def/assign in a module."""
    try:
        tree = ast.parse(path.read_text())
    except (OSError, SyntaxError):
        return []
    out = []
    for node in tree.body:
        end = getattr(node, "end_lineno", node.lineno)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            # include decorators in the span
            start = min([node.lineno] + [d.lineno for d in node.decorator_list])
            out.append((node.name, start, end))
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out.append((tgt.id, node.lineno, end))
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            out.append((node.target.id, node.lineno, end))
    return out


def _overlaps(span: tuple[int, int], ranges: list[tuple[int, int]]) -> bool:
    s, e = span
    return any(not (b < s or a > e) for a, b in ranges)


def compute_recheck() -> list[dict]:
    sys.path.insert(0, str(REPO))
    import inspect

    from bigdata_financial_reporting_spark.queries.registry import QUERIES

    last = last_rounds()
    commits = round_commits()

    # key -> (relpath, span, source text)
    key_site: dict[str, tuple[str, tuple[int, int], str]] = {}
    for name, spec in QUERIES.items():
        fn = inspect.unwrap(spec.fn)
        src_file = Path(inspect.getsourcefile(fn)).resolve()
        lines, start = inspect.getsourcelines(fn)
        rel = str(src_file.relative_to(REPO))
        key_site[name] = (rel, (start, start + len(lines) - 1), "".join(lines))

    # Helpers referenced by a large share of keys (load_table & co.) are
    # infrastructure: a change there is exercised by EVERY local-canon
    # run, and flagging all callers would burn the whole driver budget
    # on one refactor. Only narrowly-shared helpers carry signal.
    word = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
    ref_count: dict[str, int] = {}
    for _, (_, _, src) in key_site.items():
        for n in set(word.findall(src)):
            ref_count[n] = ref_count.get(n, 0) + 1
    ubiquitous = {n for n, c in ref_count.items() if c >= 0.2 * len(key_site)}

    # Package-wide top-level-def reference graph for the transitive
    # helper closure: name -> set of names its own source mentions.
    # Names are treated package-globally (they are unique enough in
    # practice; a rare collision only errs toward a harmless extra
    # recheck row).
    defs_cache: dict[str, list[tuple[str, int, int]]] = {}
    def_refs: dict[str, set[str]] = {}
    for path in sorted((REPO / PKG).rglob("*.py")):
        rel = str(path.relative_to(REPO))
        defs_cache[rel] = _top_level_defs(path)
        try:
            mod_lines = path.read_text().splitlines()
        except OSError:
            continue
        for dname, s, e in defs_cache[rel]:
            src = "\n".join(mod_lines[s - 1 : e])
            def_refs.setdefault(dname, set()).update(
                set(word.findall(src)) - {dname}
            )

    # Per-key diff window, bounded one artifact back. A key checked in
    # the NEWEST round diffs newest-artifact..HEAD (older windows were
    # triaged and pinned by previous rounds' syncs; see module
    # docstring). A key whose last driver row is OLDER than the newest
    # artifact diffs from the artifact BEFORE the newest one: round 14
    # pinned a 65-key recheck list against a ~50-key driver budget, so
    # 15 keys' code changes landed in the r13..r14 window and were
    # never re-verified — the newest-artifact window silently dropped
    # them from the rotation (round-14 verdict item 10). One round of
    # lookback is exactly the reachable debt: anything older was
    # drained by construction while the pinned lists still fit the
    # budget.
    rounds_desc = sorted(commits, reverse=True)
    latest_sha = commits[rounds_desc[0]]
    prev_sha = commits[rounds_desc[1]] if len(rounds_desc) > 1 else latest_sha

    def window_names(base_sha: str):
        spans = changed_spans(base_sha)
        names: set[str] = set()
        for rel, ranges in spans.items():
            if not rel.endswith(".py") or rel not in defs_cache:
                continue
            for dname, s, e in defs_cache[rel]:
                if _overlaps((s, e), ranges):
                    names.add(dname)
        # transitive closure: a def is dirty if its span changed or it
        # references a dirty (non-ubiquitous) def — fixpoint over the
        # package graph, so _nearest_cells -> ivf_topk -> key-level
        # match works at any helper depth
        closure = set(names) - ubiquitous
        grew = True
        while grew:
            grew = False
            for dname, refs in def_refs.items():
                if dname in closure or dname in ubiquitous:
                    continue
                if refs & closure:
                    closure.add(dname)
                    grew = True
        return spans, closure

    latest_round = rounds_desc[0]
    windows = {
        latest_sha: window_names(latest_sha),
        prev_sha: window_names(prev_sha),
    }

    out = []
    for name, (rel, span, src) in key_site.items():
        rnd = last.get(name)
        if rnd is None:
            continue  # never checked — handled by the unseen tiers
        base = latest_sha if rnd >= latest_round else prev_sha
        spans, closure = windows[base]
        reasons = []
        if rel in spans and _overlaps(span, spans[rel]):
            reasons.append("direct")
        else:
            # helper-level: referenced top-level names whose definition
            # changed in ANOTHER module (same-module overlap is direct)
            refs = set(word.findall(src))
            hits = sorted(
                n
                for n in closure & refs
                if n != name
                and n not in ubiquitous
                and not _defined_here(n, rel, defs_cache)
            )
            if hits:
                reasons.append("helpers:" + ",".join(hits[:6]))
        if reasons:
            out.append({"key": name, "last_round": rnd, "reasons": reasons})
    out.sort(key=lambda r: (r["last_round"], r["key"]))
    return out


def _defined_here(name: str, rel: str, defs_cache: dict) -> bool:
    return any(d[0] == name for d in defs_cache.get(rel, []))


def main() -> int:
    recheck = compute_recheck()
    print(json.dumps({"recheck": recheck}, indent=1))
    if "--update-check" in sys.argv:
        from bigdata_financial_reporting_spark.queries.driver_order import (
            RECHECK_FIRST,
        )

        want = tuple(r["key"] for r in recheck)
        if tuple(RECHECK_FIRST) != want:
            print(
                f"RECHECK_FIRST stale:\nwant: {want}\nhave: {tuple(RECHECK_FIRST)}",
                file=sys.stderr,
            )
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
