"""Oracle-check specific keys at one or more SF dirs (triage tool).

Usage: python scripts/check_one.py key [key ...] [--sf /root/testdata/sf0.01 ...]
Default SFs: sf0.001 and sf0.01.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from bigdata_financial_reporting_spark.oracle_compare import (  # noqa: E402
    compare_entry,
    entry_green,
    fetch_duck,
    fetch_spark,
)
from bigdata_financial_reporting_spark.operators.cache import (  # noqa: E402
    release_operator_caches,
)
from bigdata_financial_reporting_spark.queries import QUERIES  # noqa: E402
from bigdata_financial_reporting_spark.session import get_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    sfs = []
    keys = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            keys.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_session("check-one", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for name in keys:
            spec = QUERIES[name]
            t0 = time.time()
            s_cols, s_rows = fetch_spark(spec.fn(spark, sf))
            d_cols, d_rows = fetch_duck(con, spec.oracle)
            entry = compare_entry(s_cols, s_rows, d_cols, d_rows)
            ok = entry_green(entry)
            rc |= 0 if ok else 1
            print(
                f"{os.path.basename(sf)} {name}: "
                f"{'GREEN' if ok else 'RED ' + str(entry)[:400]} "
                f"({time.time()-t0:.1f}s)"
            )
            release_operator_caches()
        con.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
