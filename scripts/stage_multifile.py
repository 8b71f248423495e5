"""Stage a 32-file copy of an sf fixture dir (same rows, real layout).

Every /root/testdata fixture is a SINGLE parquet file with a single
row-group, so scans cannot split below one task and the bench floor is
serial scan time — a layout artifact no real deployment has (SCALING.md,
round-2 verdict item 5). This stages the same data as 32 files per big
table so the bench can report both layouts:

    python scripts/stage_multifile.py                 # stage (idempotent)
    SPARK_GRAFT_SF_DIR=/tmp/sf0.1x32 python bench.py  # multi-file numbers

Small dimension tables are symlinked unchanged (they are broadcast
anyway; splitting them would only add file-listing overhead).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from bigdata_financial_reporting_spark.session import pin_semantics  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_DST_DIR", "/tmp/sf0.1x32")
N_FILES = 32
BIG = ["lineitem", "orders", "events", "documents", "embeddings"]
SMALL = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("stage-multifile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_semantics(spark)
    os.makedirs(DST, exist_ok=True)
    t0 = time.time()
    for table in BIG:
        out = f"{DST}/{table}.parquet"
        if os.path.exists(out):
            continue
        (
            spark.read.parquet(f"{SRC}/{table}.parquet")
            .repartition(N_FILES)
            .write.mode("overwrite")
            .parquet(out)
        )
    for t in SMALL:
        p = f"{DST}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{SRC}/{t}.parquet", p)
    print(f"staged {N_FILES}-file layout at {DST} in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
