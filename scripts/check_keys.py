"""Fast single-key mirror of the driver's compare: run one or more
registry keys Spark-vs-DuckDB on sf0.01 and print the per-key verdict.
Does NOT touch LOCAL_CORRECTNESS.json — use gen_local_correctness.py
for the full artifact.

Usage:  python scripts/check_keys.py sim_quantize_int8 sim_centroid_per_label
        python scripts/check_keys.py --category similarity
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from bigdata_financial_reporting_spark.queries import QUERIES  # noqa: E402
from bigdata_financial_reporting_spark.oracle_compare import tune_duck  # noqa: E402
from bigdata_financial_reporting_spark.session import pin_semantics  # noqa: E402
from test_dtype_parity import kind  # noqa: E402
from test_oracle import canon_rows  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--category":
        names = [n for n, s in QUERIES.items() if s.category == args[1]]
    else:
        names = args
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        print(f"unknown or missing keys: {unknown}")
        sys.exit(2)

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("check-keys")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_semantics(spark)

    def connect():
        c = duckdb.connect()
        tune_duck(c)
        for t in TABLES:
            path = os.path.join(SF_DIR, f"{t}.parquet")
            # staged 10x tables are multi-file DIRECTORIES <t>.parquet/
            pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
            )
        return c

    con = connect()

    failures = 0
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            sp = spec.fn(spark, SF_DIR).toPandas()
            if spec.oracle is None:
                print(f"{name}: rows_only rows={len(sp)} ({time.time()-t0:.1f}s)")
                continue
            try:
                dp = con.execute(spec.oracle).df()
            except duckdb.Error:
                # allocator-state-dependent OOM after a heavy oracle
                # (round-7 sweep lesson) — retry once on a fresh
                # connection before reporting an error
                con.close()
                con = connect()
                dp = con.execute(spec.oracle).df()

            def cell(v):
                return list(v) if isinstance(v, np.ndarray) else v

            s_rows = [tuple(cell(x) for x in r) for r in sp.itertuples(index=False)]
            d_rows = [tuple(cell(x) for x in r) for r in dp.itertuples(index=False)]
            rows = len(sp) == len(dp)
            schema = sorted(sp.columns) == sorted(dp.columns)
            values = canon_rows(list(sp.columns), s_rows) == canon_rows(
                list(dp.columns), d_rows
            )
            kinds = schema and all(kind(sp[c]) == kind(dp[c]) for c in sp.columns)
            ok = rows and schema and values and kinds
            failures += 0 if ok else 1
            print(
                f"{name}: {'GREEN' if ok else 'FAIL'} rows={len(sp)}/{len(dp)} "
                f"schema={schema} values={values} kinds={kinds} "
                f"({time.time()-t0:.1f}s)"
            )
            if not ok:
                if not schema:
                    print(f"  spark cols: {sorted(sp.columns)}")
                    print(f"  duck  cols: {sorted(dp.columns)}")
                elif not values:
                    sc = canon_rows(list(sp.columns), s_rows)
                    dc = canon_rows(list(dp.columns), d_rows)
                    diff_s = [r for r in sc if r not in set(dc)][:3]
                    diff_d = [r for r in dc if r not in set(sc)][:3]
                    print(f"  spark-only rows (≤3): {diff_s}")
                    print(f"  duck-only  rows (≤3): {diff_d}")
                elif not kinds:
                    for c in sp.columns:
                        if kind(sp[c]) != kind(dp[c]):
                            print(f"  col {c}: spark={kind(sp[c])} duck={kind(dp[c])}")
        except Exception as exc:
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
