"""Emit SCALE_CORRECTNESS.json — the driver's t2 gate re-run AT SCALE
(default: the 10x staged corpus, /tmp/sf1x).

Why this exists: correctness divergence can be scale-dependent. The
round-6 Spearman bug was invisible at sf0.01 and sf0.1's oracle tests
(moments fit int64) and only wrapped at ~2M rows/group on the 10x
corpus — rho came out ~6x off while every smaller-SF gate stayed
green. Neither the external driver (sf0.01) nor LOCAL_CORRECTNESS
(sf0.01) can see that class; this sweep closes the gap by running
EVERY oracle-paired registry key on Spark AND DuckDB at the staged
scale and comparing with the same driver-strict canon the per-key
tests use (bitwise floats after the query's own rounding, -0.0 ban,
dtype-kind parity).

Both engines get a per-query wall cap: a handful of ground-truth
oracles are deliberately quadratic (all-pairs cosine / Jaccard) and
would take hours at 10x for no additional evidence — capped keys are
recorded under timeouts, never skipped silently. The DuckDB cap
reuses check_negzero's interrupt-with-drain; the Spark cap cancels
the query's job group (interruptOnCancel) from a timer thread.

Usage:
    python scripts/gen_scale_correctness.py             # /tmp/sf1x
    python scripts/gen_scale_correctness.py /some/dir   # explicit dir
Stage the 10x corpus first if absent: python scripts/gen_scale10x.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from bigdata_financial_reporting_spark.queries import QUERIES  # noqa: E402
from bigdata_financial_reporting_spark.session import get_session  # noqa: E402
from check_negzero import _execute_capped  # noqa: E402
from test_dtype_parity import kind  # noqa: E402
from test_oracle import canon_rows  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: per-engine, per-query wall cap (seconds). Generous enough for every
#: linear/linearithmic key at 10x; only the all-pairs ground truths
#: (dedup_* exact-verify oracles, join_self) hit it, and each of those
#: already has a driver-green row at sf0.01.
PER_QUERY_SECONDS = 90.0


class _SparkTimeout(Exception):
    pass


def _spark_df_capped(spark, df, tag: str):
    """df.toPandas() with a wall cap via job-group cancellation."""
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag, interruptOnCancel=True)
    fired: list[bool] = []

    def _cancel():
        fired.append(True)
        sc.cancelJobGroup(tag)

    timer = threading.Timer(PER_QUERY_SECONDS, _cancel)
    timer.start()
    try:
        return df.toPandas()
    except Exception as exc:
        if fired:
            raise _SparkTimeout(tag) from exc
        raise
    finally:
        timer.cancel()
        timer.join()
        sc.setJobGroup("", "")


def _views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # 10x staging writes multi-file table DIRECTORIES
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    if not os.path.isdir(sf_dir):
        print(f"{sf_dir} not staged — run scripts/gen_scale10x.py first")
        return 2

    # get_session, not a bare builder: it sizes the local driver heap
    # like an executor (8g — the bare 1g default OOMs on the exact-
    # percentile aggregate at 10x) and pins the result semantics.
    spark = get_session(
        "scale-correctness",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    _views(con, sf_dir)

    out: dict[str, dict] = {}
    t_all = time.time()
    for name, spec in QUERIES.items():
        entry: dict = {}
        t_q = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            sp = _spark_df_capped(spark, sdf, f"scale-{name}")
            entry["spark_rows"] = len(sp)
            if spec.oracle is None:
                entry["mode"] = "rows_only"
                entry["non_empty"] = len(sp) > 0
            else:
                cols, rows = _execute_capped(
                    con, spec.oracle, seconds=PER_QUERY_SECONDS
                )
                import pandas as pd

                dp = pd.DataFrame(rows, columns=cols)
                entry["mode"] = "oracle"
                entry["oracle_rows"] = len(dp)
                entry["rows_match"] = len(sp) == len(dp)
                entry["schema_match"] = sorted(sp.columns) == sorted(dp.columns)

                def cell(v):
                    return list(v) if isinstance(v, np.ndarray) else v

                s_rows = [
                    tuple(cell(x) for x in r)
                    for r in sp.itertuples(index=False)
                ]
                d_rows = [
                    tuple(cell(x) for x in r)
                    for r in dp.itertuples(index=False)
                ]
                entry["values_match"] = canon_rows(
                    list(sp.columns), s_rows
                ) == canon_rows(list(dp.columns), d_rows)
                # dtype-kind parity only when both sides are non-empty:
                # a fetchall()-built frame has object dtypes on empty.
                if len(sp) and len(dp):
                    entry["dtype_kind_match"] = all(
                        kind(sp[c]) == kind(dp[c]) for c in sp.columns
                    )
        except _SparkTimeout:
            entry["timeout"] = "spark"
        except duckdb.InterruptException:
            entry["timeout"] = "duckdb"
        except Exception as exc:  # one broken query must not void the run
            entry["error"] = f"{type(exc).__name__}: {exc}"[:300]
        entry["sec"] = round(time.time() - t_q, 2)
        out[name] = entry

    oracle_keys = [n for n, e in out.items() if e.get("mode") == "oracle"]
    green = [
        n
        for n in oracle_keys
        if out[n].get("values_match")
        and out[n].get("rows_match")
        and out[n].get("schema_match")
        and out[n].get("dtype_kind_match", True)
    ]
    red = [n for n in oracle_keys if n not in green]
    timeouts = [n for n, e in out.items() if "timeout" in e]
    errors = [n for n, e in out.items() if "error" in e]
    record = {
        "sf_dir": sf_dir,
        "per_query_cap_sec": PER_QUERY_SECONDS,
        "n_queries": len(out),
        "n_oracle_compared": len(oracle_keys),
        "n_oracle_green": len(green),
        "oracle_red": red,
        "n_rows_only": sum(
            1 for e in out.values() if e.get("mode") == "rows_only"
        ),
        "timeouts": timeouts,
        "errors": errors,
        "wall_sec": round(time.time() - t_all, 1),
        "queries": out,
    }
    path = os.path.join(REPO, "SCALE_CORRECTNESS.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(
        f"{record['n_oracle_green']}/{record['n_oracle_compared']} oracle "
        f"queries green at {sf_dir}; red={red or '[]'} "
        f"timeouts={len(timeouts)} errors={len(errors)} "
        f"({record['wall_sec']}s) -> {path}"
    )
    spark.stop()
    return 1 if (red or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
