"""Driver-environment rehearsal: run the next driver rotation window
under a DEFAULT-config SparkSession.

The external driver builds its own session — none of the engine's
PERF_CONF tuning (shuffle partitions, broadcast threshold, Arrow,
AQE advisory sizes) applies there; only the semantic pins that
``__spark_entry__`` re-applies per call do. A key that is green under
the test session but depends on engine tuning for correctness would
fail its one driver check and burn a rotation slot. This script runs
the first N = 50 keys of ``ordered_names()`` (exactly the window the
driver will truncate to) on a default ``local[*]`` session with
NOTHING set beyond what ``__spark_entry__.queries()`` itself applies,
and diffs against DuckDB with the suite's canonicalizer.

Run from the repo root:  python scripts/check_driver_env.py [N]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from test_oracle import canon_rows  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    # deliberately bare: the driver's session, not the engine's
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.ui.enabled", "false")
        .appName("driver-env-rehearsal")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    window = list(queries)[:n]
    t0 = time.time()
    bad = []
    for name in window:
        try:
            sdf = queries[name](spark, SF_DIR)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                # rows-only key (oracle=None): the driver records a
                # weaker non-empty check — mirror it, don't KeyError
                ok = len(s_rows) > 0
                tag = "ok  " if ok else "BAD "
                print(f"{tag} {name} (rows-only, {len(s_rows)} rows)")
                if not ok:
                    bad.append(name)
                continue
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            ok = (
                len(s_rows) == len(d_rows)
                and sorted(sdf.columns) == sorted(d_cols)
                and canon_rows(sdf.columns, s_rows) == canon_rows(d_cols, d_rows)
            )
        except Exception as exc:
            ok = False
            print(f"ERR  {name}: {type(exc).__name__}: {exc}"[:200])
        if not ok:
            bad.append(name)
        else:
            print(f"ok   {name}")
    print(
        f"\n{len(window) - len(bad)}/{len(window)} keys green under the "
        f"default-config session in {time.time() - t0:.0f}s"
    )
    spark.stop()
    if bad:
        print("FAILED:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
