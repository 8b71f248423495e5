"""Builder-side full bench artifact (round-12 verdict item 7).

The driver's BENCH_r{N}.json is a truncated tail (r12 shipped with
``parsed: null`` — the medians dict cut mid-stream), which left the
round-over-round drift question unanswerable from committed evidence.
This generator runs the same bench.py harness and commits the FULL
record — every per-key median/min/max, the host context it ran under,
and an interleaved A/B rerun of three long-untouched keys
(`tpch_q5_shape`, `join_broadcast_dims`, `window_moving_avg`, sources
unchanged since r03-r06): if the A/B spread on untouched keys matches
the board-wide movement, the movement is host noise; if an individual
key moved while the untouched keys held, it is a real change.

Usage:  python scripts/gen_bench_local.py        # writes BENCH_LOCAL.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AB_KEYS = ["tpch_q5_shape", "join_broadcast_dims", "window_moving_avg"]
AB_ROUNDS = 4


def _host_context() -> dict:
    ctx: dict = {"cpus": os.cpu_count()}
    try:
        with open("/proc/meminfo") as fh:
            mem = dict(
                line.split(":", 1) for line in fh if ":" in line
            )
        ctx["mem_total_kb"] = int(mem["MemTotal"].strip().split()[0])
        ctx["mem_available_kb"] = int(mem["MemAvailable"].strip().split()[0])
        ctx["commit_limit_kb"] = int(mem["CommitLimit"].strip().split()[0])
    except Exception:
        pass
    try:
        ctx["loadavg_1m"] = os.getloadavg()[0]
    except OSError:
        pass
    try:
        with open("/proc/version") as fh:
            ctx["kernel"] = fh.read().strip()[:120]
    except Exception:
        pass
    return ctx


def _git(args: list[str]) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        print(f"bench.py failed rc={proc.returncode}", file=sys.stderr)
        return 1
    bench = json.loads(proc.stdout.strip().splitlines()[-1])

    # Interleaved A/B reruns of the untouched keys in a fresh session:
    # round-robin order (A B C A B C ...) so a mid-run host
    # disturbance shows up as correlated movement across all three,
    # not as one key's "regression".
    from bigdata_financial_reporting_spark.operators.cache import (
        release_operator_caches,
    )
    from bigdata_financial_reporting_spark.queries import QUERIES
    from bigdata_financial_reporting_spark.session import get_session

    spark = get_session("bdfr-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for k in AB_KEYS:  # warm
        QUERIES[k].fn(spark, sf_dir).count()
        release_operator_caches()
    samples: dict[str, list[float]] = {k: [] for k in AB_KEYS}
    for _ in range(AB_ROUNDS):
        for k in AB_KEYS:
            s0 = time.perf_counter()
            QUERIES[k].fn(spark, sf_dir).count()
            samples[k].append(round(time.perf_counter() - s0, 3))
            release_operator_caches()
    ab = {
        k: {
            "samples": v,
            "median": round(statistics.median(v), 3),
            "spread": round(max(v) / min(v), 2) if min(v) > 0 else None,
        }
        for k, v in samples.items()
    }

    record = {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "git_sha": _git(["rev-parse", "HEAD"]),
        "git_dirty": bool(_git(["status", "--porcelain"])),
        "sf_dir": sf_dir,
        "wall_sec_total": round(time.time() - t0, 1),
        "host": _host_context(),
        "bench": bench,
        "ab_untouched_keys": ab,
        "ab_note": (
            "interleaved round-robin reruns of three keys whose sources "
            "are unchanged since r03-r06; correlated movement across "
            "them = host noise, isolated movement elsewhere = real"
        ),
    }
    out = os.path.join(REPO, "BENCH_LOCAL.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out} (bench total {bench.get('value')}s, ab={ {k: v['median'] for k, v in ab.items()} })")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
