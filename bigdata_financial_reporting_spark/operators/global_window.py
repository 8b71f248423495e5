"""Scalable global-order window: lag over a TOTAL order without the
single-partition collapse.

The reference's ``Window.orderBy(date)`` with no partitionBy moves the
whole table onto ONE task (reference controller/script.py:39 — Spark
even logs a warning). That is the worst scaling decision in the
reference; this operator is the fix for workloads that genuinely need a
global order (single logical series, cross-series cumulative metrics):

1. ``repartitionByRange`` on the order key: partitions hold disjoint,
   consecutive key ranges — a parallel global sort (Spark's own
   ``orderBy`` machinery, sampled boundaries).
2. Per-partition ``lag`` via a window keyed on ``spark_partition_id()``
   — ordinary parallel window work.
3. The only rows still missing their predecessor are each partition's
   FIRST rows; their predecessors are each partition's LAST rows — at
   most one row per partition. Aggregate those (num_partitions rows,
   trivially broadcastable at any scale), shift by one partition, and
   patch the firsts with a broadcast join.

Total cost: one range shuffle + one broadcast of num_partitions rows —
versus the reference's all-rows-to-one-task collapse. Result is
IDENTICAL to the naive global window (same total order, tie-broken by
the caller's order columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_lag(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "__lag",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = lag(value_col) over the global order
    defined by ``order_cols`` (must be a total order for deterministic
    results)."""
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    order = [F.col(c) for c in order_cols]
    # Persisted for CORRECTNESS, not just speed: repartitionByRange
    # samples the data to pick boundaries, so two independent
    # evaluations of this subtree could assign rows to different
    # partitions — the boundary stitch below requires every consumer to
    # see the SAME __pid assignment. Tracked so callers' cache-release
    # points free it like every other operator-internal persist.
    parts = track(
        df.repartitionByRange(*([num_partitions] if num_partitions else []), *order)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    w = Window.partitionBy("__pid").orderBy(*order)
    within = parts.withColumn(out_col, F.lag(value_col).over(w))

    # Last row of each partition = the predecessor for partition pid+1's
    # first row. max_by over the order-key struct picks it in one agg.
    okey = F.struct(*order)
    lasts = (
        parts.groupBy("__pid")
        .agg(F.max_by(F.col(value_col), okey).alias("__prev_val"))
        .select((F.col("__pid") + 1).alias("__pid"), "__prev_val")
    )

    # First row per partition: no within-partition predecessor.
    first_w = Window.partitionBy("__pid").orderBy(*order)
    flagged = within.withColumn("__rn", F.row_number().over(first_w))
    patched = (
        flagged.join(F.broadcast(lasts), "__pid", "left")
        .withColumn(
            out_col,
            F.when(F.col("__rn") == 1, F.col("__prev_val")).otherwise(F.col(out_col)),
        )
        .drop("__pid", "__rn", "__prev_val")
    )
    return patched


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "pos",
    num_partitions: int | None = None,
    bucket_col: Column | None = None,
) -> DataFrame:
    """``row_number()`` over the global order defined by ``order_cols``
    (must be a total order), without the single-partition collapse:
    rank within disjoint order-respecting groups in parallel, then add
    per-group offsets. The offset table is one row per group — the only
    unpartitioned window in the plan runs over those rows, never over
    the data.

    Two grouping strategies:

    - ``bucket_col`` given: it must be a COARSENING of the order —
      rows sort by bucket first, e.g. a fixed-width prefix of the
      first order column (hash keys qualify; arbitrary keys usually
      don't). Then ONE hash shuffle of the data on the static bucket
      suffices, with no boundary sampling and no persist: bucket
      assignment is a pure function of the row, so every consumer
      recomputes it identically.
    - otherwise: ``repartitionByRange`` on the order key (works for
      any key distribution), which costs the range shuffle plus the
      window's hash shuffle on the partition id, and a persist so the
      sampled boundaries stay consistent across consumers (callers
      own the cache lifetime, as with the shingle frames in
      operators/dedup).
    """
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    order = [F.col(c) for c in order_cols]
    if bucket_col is not None:
        parts = df.withColumn("__b", bucket_col)
    else:
        parts = track(
            df.repartitionByRange(
                *([num_partitions] if num_partitions else []), *order
            )
            .withColumn("__b", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    w = Window.partitionBy("__b").orderBy(*order)
    within = parts.withColumn("__rn", F.row_number().over(w))

    counts = parts.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(wo), F.lit(0)).alias("__off")
    )
    return (
        within.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__b", "__rn", "__off")
    )


def global_pct_change(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Daily-%-return shape over a global order, scalably:
    ``(v / global_lag(v) - 1) * 100``. NULL for the first row and for
    zero predecessors (ANSI off), matching the reference semantics."""
    lagged = global_lag(df, order_cols, value_col, "__prev", num_partitions)
    return lagged.withColumn(
        out_col, (F.col(value_col) / F.col("__prev") - 1) * 100
    ).drop("__prev")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sums of ``value_cols`` over the TOTAL order defined by
    ``order_cols`` (must be a total order), without the
    single-partition collapse: range-partition on the order key, local
    running sums per partition, then add per-partition prefix offsets
    — the offset table is one row per PARTITION, so the only
    unpartitioned window runs over ~#partitions rows, never the data.
    Output columns are ``run_<value_col>``. Same persist-for-
    correctness contract as global_lag: repartitionByRange samples
    boundaries, so the partition assignment is pinned by the tracked
    persist (callers own the cache lifetime)."""
    from pyspark.storagelevel import StorageLevel

    from bigdata_financial_reporting_spark.operators.cache import track

    order = [F.col(c) for c in order_cols]
    parts = track(
        df.repartitionByRange(
            *([num_partitions] if num_partitions else []), *order
        )
        .withColumn("__b", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.select(
        "*", *[F.sum(v).over(w_in).alias(f"__local_{v}") for v in value_cols]
    )
    totals = parts.groupBy("__b").agg(
        *[F.sum(v).alias(f"__tot_{v}") for v in value_cols]
    )
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b",
        *[
            F.coalesce(F.sum(f"__tot_{v}").over(wo), F.lit(0)).alias(
                f"__off_{v}"
            )
            for v in value_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__b")
    for v in value_cols:
        out = out.withColumn(
            f"run_{v}", F.col(f"__local_{v}") + F.col(f"__off_{v}")
        ).drop(f"__local_{v}", f"__off_{v}", f"__tot_{v}")
    return out.drop("__b")
