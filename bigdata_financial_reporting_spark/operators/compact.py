"""Small-file compaction — the unglamorous operator every long-lived
100 TB lake needs.

Streaming jobs and frequent small appends leave thousands of tiny
parquet files; scans then pay per-file open/footer costs and the
driver pays listing costs. ``compact_parquet`` rewrites a directory to
approximately ``target_file_bytes`` per file, preserving content
(verified by tests) and optionally a partitioning column layout."""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` with ~``target_file_bytes`` per output file.

    Returns a summary dict (files/bytes before and after). The rewrite
    stages into ``path + '.compact_tmp'`` and swaps only after a
    successful write, so a failed compaction leaves the source intact.
    """
    before_bytes = dir_bytes(path)
    before_files = sum(
        1
        for _r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") or (not f.startswith(("_", ".")))
    )
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(before_bytes / target_file_bytes))

    tmp = path.rstrip("/") + ".compact_tmp"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    from bigdata_financial_reporting_spark.sources.fs import swap_directory

    swap_directory(spark, tmp, path)

    after_files = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if not f.startswith(("_", "."))
    )
    return {
        "before_files": before_files,
        "after_files": after_files,
        "before_bytes": before_bytes,
        "after_bytes": dir_bytes(path),
        "target_file_bytes": target_file_bytes,
    }
