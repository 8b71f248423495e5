"""Time-series / product-analytics operators: batch sessionization,
forward fill, snapshot diff, cohort retention.

All pure DataFrame compositions — partitioned windows and keyed
aggregations, one shuffle each on the natural key."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: float,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts after
    ``gap_minutes`` of inactivity. Adds ``session_id`` (1-based per
    key, ordered by time) — the batch mirror of
    ``F.session_window`` streaming aggregation."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    # Cast through timestamp first: TIMESTAMP_NTZ inputs reject a direct
    # numeric cast, and for TimestampType the extra cast is a no-op.
    sec = F.col(ts_col).cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    new_session = (
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Carry the last non-null observation forward per key (the
    time-series ffill). Leading NULLs (no prior observation) stay
    NULL. Pass ``order_tiebreak`` when timestamps can collide —
    without a total order the filled value at a tie is
    partition-layout-dependent."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def backward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Carry the NEXT non-null observation backward per key (the
    time-series bfill, :func:`forward_fill`'s mirror). Trailing NULLs
    (no later observation) stay NULL. Same total-order caveat: pass
    ``order_tiebreak`` when timestamps can collide."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Change-data-capture between two snapshots with identical
    schemas: one row per differing key with ``change_type`` in
    {'inserted', 'deleted', 'updated'}. Unchanged keys are omitted.
    Full outer join on the key; non-key columns compared null-safely.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    val_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in new.columns],
        F.lit(True).alias("__in_new"),
    )
    cond = [F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}")) for k in key_cols]
    j = o.join(n, cond, "full_outer")

    same_vals = F.lit(True)
    for c in val_cols:
        same_vals = same_vals & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))

    change = (
        F.when(F.col("__in_old").isNull(), "inserted")
        .when(F.col("__in_new").isNull(), "deleted")
        .when(~same_vals, "updated")
    )
    keyed = j.withColumn("change_type", change).filter(
        F.col("change_type").isNotNull()
    )
    return keyed.select(
        *[
            F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k)
            for k in key_cols
        ],
        "change_type",
        *[F.col(f"__o_{c}").alias(f"old_{c}") for c in val_cols],
        *[F.col(f"__n_{c}").alias(f"new_{c}") for c in val_cols],
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity
    bucket (the cohort); for each (cohort, age-in-buckets) the count of
    distinct users still active. Two aggregations + a broadcastable
    first-seen join."""
    # NTZ-safe: date_trunc of a TIMESTAMP_NTZ column is itself NTZ and
    # rejects the numeric casts below; normalize to TimestampType first.
    b = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    firsts = df.groupBy(key_col).agg(F.min(b).alias("cohort"))
    activity = df.select(F.col(key_col), b.alias("bucket")).distinct()
    joined = activity.join(firsts, key_col)
    age = (
        (F.col("bucket").cast("double") - F.col("cohort").cast("double"))
        / (7 * 86400 if bucket == "week" else 86400)
    ).cast("long")
    return (
        joined.withColumn("age", age)
        .groupBy("cohort", "age")
        .agg(F.countDistinct(key_col).alias("n_active"))
    )


def scd2_versions(df, key: str, state: str, ts: str, tiebreak: str):
    """SCD2 version table from a change stream: collapse consecutive
    equal states per key (gaps-and-islands lag compare), close each
    version with the next change's timestamp (open version: NULL).
    Both windows order by (ts, tiebreak) — the tiebreak matters: two
    change rows sharing a timestamp would otherwise get engine-
    arbitrary lead() ordering and flip valid_to/is_current between
    runs. One hash shuffle on the key, shared by both windows.
    Returns (key, state, valid_from, valid_to) with original types.
    Shared by ops_scd2_build and join_point_in_time_scd2.

    NULL states are first-class (ADVICE round 4): the change predicate
    is a null-safe inequality, so a non-NULL -> NULL transition opens a
    version (plain ``!=`` yields NULL and silently drops it) and a row
    FOLLOWING a NULL state is a change only if its state really
    differs — ``__prev IS NULL`` alone conflates "first row" with
    "previous state was NULL", so the true first row is detected with
    row_number() instead."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes = (
        df.withColumn("__prev", F.lag(state).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col(state).eqNullSafe(F.col("__prev"))
        )
        .select(key, state, ts, tiebreak)
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return changes.select(
        F.col(key),
        F.col(state).alias("state"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
    )
