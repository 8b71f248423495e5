"""Keyed upsert (MERGE) into a parquet directory.

Plain parquet has no transaction log, so MERGE is read-join-rewrite:
target rows matched by key take the source's values (update), unmatched
source rows append, unmatched target rows carry over. The rewrite
stages to a temp directory and swaps only after success (same pattern
as compact_parquet) so a failed merge leaves the target intact.

Scale posture: the join is keyed (shuffle on the merge key, or
broadcast when the source is small); the rewrite cost is the price of
log-less storage — a table-format layer (e.g. a transaction log with
file-level add/remove) turns this into a metadata operation, and this
operator is the semantic reference for that upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.sources.fs import swap_directory


def upsert_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    broadcast_source: bool = False,
) -> dict:
    """MERGE ``source`` into the parquet table at ``target_path`` on
    ``key_cols``: matched keys updated, new keys inserted. Source must
    be key-unique (enforced — duplicate source keys make the merge
    ambiguous). Returns counts."""
    dup = (
        source.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(f"source has duplicate keys on {key_cols}")

    target = spark.read.parquet(target_path)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs "
            f"source {sorted(source.columns)}"
        )

    src = F.broadcast(source) if broadcast_source else source
    # anti-join keeps target rows whose key is NOT being updated;
    # union with the full source = updated + inserted rows.
    kept = target.join(src.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(source)

    n_target = target.count()
    n_kept = kept.count()
    n_source = source.count()

    tmp = target_path.rstrip("/") + ".merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swap_directory(spark, tmp, target_path)

    return {
        "updated": n_target - n_kept,
        "inserted": n_source - (n_target - n_kept),
        "total_after": n_kept + n_source,
    }
