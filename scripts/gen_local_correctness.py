"""Emit LOCAL_CORRECTNESS.json — the builder's full mirror of the
driver's t2 gate, covering EVERY registry key (the external driver
truncated at 50 keys in round 1).

Per query: Spark vs DuckDB row count, column-name set, order-insensitive
canonical value match (tests/test_oracle.py's canon), and pandas
dtype-kind parity (the typed-rendering check that catches the
int-vs-float divergences the driver's value hash fails on). Rows-only
(approximate/streaming) keys record row count + non-empty.

Run from the repo root:  python scripts/gen_local_correctness.py
"""

from __future__ import annotations

import json
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
from bigdata_financial_reporting_spark.session import pin_semantics  # noqa: E402
from test_dtype_parity import kind  # noqa: E402
from test_oracle import canon_rows  # noqa: E402

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
        .appName("local-correctness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_semantics(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    out = {}
    t_all = time.time()
    for name, spec in QUERIES.items():
        entry = {}
        try:
            sdf = spec.fn(spark, SF_DIR)
            sp = sdf.toPandas()
            entry["spark_rows"] = len(sp)
            if spec.oracle is None:
                entry["mode"] = "rows_only"
                entry["non_empty"] = len(sp) > 0
            else:
                dp = con.execute(spec.oracle).df()
                entry["mode"] = "oracle"
                entry["oracle_rows"] = len(dp)
                entry["rows_match"] = len(sp) == len(dp)
                entry["schema_match"] = sorted(sp.columns) == sorted(dp.columns)
                # DuckDB's pandas path yields ndarray cells for lists;
                # canon handles list/tuple, so normalize.
                def cell(v):
                    return list(v) if isinstance(v, np.ndarray) else v

                s_rows = [
                    tuple(cell(x) for x in r) for r in sp.itertuples(index=False)
                ]
                d_rows = [
                    tuple(cell(x) for x in r) for r in dp.itertuples(index=False)
                ]
                entry["values_match"] = canon_rows(
                    list(sp.columns), s_rows
                ) == canon_rows(list(dp.columns), d_rows)
                entry["dtype_kind_match"] = all(
                    kind(sp[c]) == kind(dp[c]) for c in sp.columns
                )
        except Exception as exc:  # one broken query must not void the run
            entry["error"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = entry

    oracle_keys = [n for n, e in out.items() if e.get("mode") == "oracle"]
    ok = [
        n
        for n in oracle_keys
        if out[n].get("values_match")
        and out[n].get("dtype_kind_match")
        and out[n].get("rows_match")
    ]
    record = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "n_oracle": len(oracle_keys),
        "n_oracle_fully_green": len(ok),
        "n_rows_only": sum(1 for e in out.values() if e.get("mode") == "rows_only"),
        "wall_sec": round(time.time() - t_all, 1),
        "queries": out,
    }
    path = os.path.join(REPO, "LOCAL_CORRECTNESS.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(
        f"{record['n_oracle_fully_green']}/{record['n_oracle']} oracle queries "
        f"fully green, {record['n_rows_only']} rows-only, "
        f"{record['wall_sec']}s -> {path}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
