"""Manifest-based table versioning: snapshot isolation and time travel
on plain parquet, no table-format dependency.

A *version* is an immutable JSON manifest listing the exact data files
that make up the table at that version. Writers NEVER mutate existing
files or manifests: a commit writes new parquet files plus a new
manifest (v1, v2, ...), so readers pinned to a manifest see a
consistent snapshot regardless of concurrent commits — the core
mechanism under Iceberg/Delta, reduced to its portable essence. At
100 TB this is how you get reproducible training runs ("the corpus AS
OF v7") and safe concurrent compaction: the file list is the contract,
the directory is just storage.

No analogue in the reference (it overwrites CSVs in place,
controller/script.py:96-100); this is the versioned replacement for
that sink.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-v{version}.json")


def latest_version(table_dir: str) -> int:
    """Highest committed version, or 0 when the table does not exist."""
    if not os.path.isdir(table_dir):
        return 0
    vs = [
        int(f[len("manifest-v") : -len(".json")])
        for f in os.listdir(table_dir)
        if f.startswith("manifest-v") and f.endswith(".json")
    ]
    return max(vs, default=0)


def commit_version(
    df: DataFrame, table_dir: str, base_files: list[str] | None = None
) -> int:
    """Write ``df`` as new immutable data files and commit the next
    manifest. ``base_files``: files from the previous version to KEEP
    (logical append keeps all of them; rewrite/overwrite passes a
    subset or none). Returns the committed version number."""
    os.makedirs(table_dir, exist_ok=True)
    staging = os.path.join(table_dir, f"commit-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    new_files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    files = sorted((base_files or []) + new_files)
    # Exclusive-create is the commit point: os.rename CLOBBERS on
    # POSIX, so two concurrent writers allocating the same version
    # number would silently overwrite each other's manifest. mode='x'
    # makes the loser see FileExistsError and retry with the next
    # number — optimistic concurrency, every commit preserved.
    version = latest_version(table_dir) + 1
    while True:
        manifest = {"version": version, "files": files}
        try:
            with open(_manifest_path(table_dir, version), "x") as fh:
                json.dump(manifest, fh)
            return version
        except FileExistsError:
            version += 1


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Snapshot read AS OF ``version``: scan exactly the manifest's
    file list (Spark accepts a multi-path parquet load, so pruning and
    parallelism work as for any scan)."""
    with open(_manifest_path(table_dir, version)) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    if not files:
        raise ValueError(f"version {version} of {table_dir} lists no files")
    return spark.read.parquet(*files)


def files_of(table_dir: str, version: int) -> list[str]:
    with open(_manifest_path(table_dir, version)) as fh:
        return list(json.load(fh)["files"])
