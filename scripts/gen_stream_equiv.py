"""Emit STREAM_EQUIV.json — machine-readable streaming batch-equivalence.

The driver's hash gate cannot execute streaming queries' multi-batch
semantics, so this artifact records, per §2B.10 query:

- the availableNow-drained streaming result vs its DuckDB batch oracle
  (row count + order-insensitive canonical value match) at sf0.01;
- the outcome of the multi-batch watermark TIMING tests
  (tests/test_streaming.py run via pytest), which no batch oracle can
  express.

Run from the repo root:  python scripts/gen_stream_equiv.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from bigdata_financial_reporting_spark.queries import QUERIES  # noqa: E402
from bigdata_financial_reporting_spark.session import pin_semantics  # noqa: E402
from test_oracle import canon_rows  # noqa: E402  (the local gate's canon)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("stream-equiv")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_semantics(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = {}
    for name, spec in QUERIES.items():
        if spec.category != "streaming":
            continue
        t0 = time.time()
        sdf = spec.fn(spark, SF_DIR)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        entry = {
            "spark_rows": len(s_rows),
            "wall_sec": round(time.time() - t0, 3),
        }
        if spec.oracle is not None:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            entry["oracle_rows"] = len(d_rows)
            entry["rows_match"] = len(s_rows) == len(d_rows)
            entry["values_match"] = canon_rows(s_cols, s_rows) == canon_rows(
                d_cols, d_rows
            )
        else:
            entry["oracle_rows"] = None
            entry["rows_match"] = None
            entry["values_match"] = None
        queries[name] = entry

    timing = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_streaming.py", "-q", "--tb=no"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = [ln for ln in timing.stdout.strip().splitlines() if ln.strip()]

    from bigdata_financial_reporting_spark.oracle_compare import provenance

    out = {
        "_provenance": provenance(),
        "sf_dir": SF_DIR,
        "queries": queries,
        "all_equivalent": all(
            e["values_match"] is not False for e in queries.values()
        ),
        "watermark_timing_tests": {
            "command": "pytest tests/test_streaming.py",
            "exit_code": timing.returncode,
            "summary": tail[-1] if tail else "",
        },
    }
    path = os.path.join(REPO, "STREAM_EQUIV.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
