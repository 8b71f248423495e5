"""Filesystem-agnostic directory swap via the Hadoop FileSystem API.

``os.rename``/``shutil`` only work on the driver's local filesystem —
they silently no-op the deployment targets (hdfs://, s3a://). Routing
through ``Path.getFileSystem(hadoopConf)`` gives the same code path on
every scheme Spark itself can write to.

Atomicity: plain directory rename cannot swap two paths atomically
(object stores don't even have atomic rename). The contract here is
crash-safe, not atomic: the new data is fully written at ``tmp`` BEFORE
the live table is touched, the displaced table is kept at
``<target>.swap_old`` until the new one is in place, and a failed
second rename rolls the old table back — so at every instant the data
exists under a deterministic path and recovery is a single rename.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def swap_directory(spark: SparkSession, tmp_path: str, target_path: str) -> None:
    """Replace the table at ``target_path`` with the one staged at
    ``tmp_path``; works on any Hadoop-supported scheme."""
    fs, tmp = _fs_and_path(spark, tmp_path)
    _, target = _fs_and_path(spark, target_path)
    old_raw = target_path.rstrip("/") + ".swap_old"
    _, old = _fs_and_path(spark, old_raw)

    if not fs.exists(tmp):
        raise IOError(f"staged directory missing: {tmp_path}")
    if fs.exists(old):
        fs.delete(old, True)  # leftover from an interrupted earlier swap
    if fs.exists(target) and not fs.rename(target, old):
        raise IOError(f"could not move {target_path} aside to {old_raw}")
    if not fs.rename(tmp, target):
        # put the old table back so the target never dangles empty
        if fs.exists(old):
            fs.rename(old, target)
        raise IOError(f"could not move {tmp_path} into place at {target_path}")
    if fs.exists(old):
        fs.delete(old, True)
