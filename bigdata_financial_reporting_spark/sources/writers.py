"""File sinks.

Scale posture: multi-part partitioned parquet is the default; the
single-file CSV the reference forced everywhere (``coalesce(1)`` +
driver-side part renaming, reference controller/script.py:57-61 and
app.py:457-491) is an explicit opt-in helper for small results only.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink — the engine's native format."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table — the co-located-join storage layout.

    Two tables bucketed by the same key into the same bucket count
    join WITHOUT a shuffle: each task reads matching bucket files from
    both sides (verified by plan in tests/test_bucketing.py). At 100 TB
    this converts the recurring fact-fact join cost from a full
    shuffle per query into a one-time layout cost at write.

    Bucketing requires the table catalog (``saveAsTable``); ``path``
    makes it an external table at that location.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_single_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Write a SMALL result as exactly one CSV file at ``path``.

    Replaces the reference's coalesce(1)-then-rename-the-part-file dance
    (controller/app.py:457-491) with one helper. Refuses nothing — the
    caller asserts smallness; this is for collected report outputs.
    """
    tmp = tempfile.mkdtemp(prefix="single_csv_")
    out_dir = os.path.join(tmp, "out")
    try:
        df.coalesce(1).write.mode("overwrite").option(
            "header", str(header).lower()
        ).csv(out_dir)
        parts = glob.glob(os.path.join(out_dir, "part-*.csv"))
        if len(parts) != 1:
            raise RuntimeError(f"expected exactly one part file, got {parts}")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        shutil.move(parts[0], path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
