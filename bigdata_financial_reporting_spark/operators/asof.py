"""As-of join (latest right row with ts <= left ts, per key).

Spark has no native ASOF JOIN (DuckDB does); this is the documented
composite from SURVEY.md §2B.3. Two strategies:

- ``strategy="union"`` (default, the scale path): tag and union both
  sides on (key, ts), then carry the latest right-side payload forward
  with ``last(..., ignorenulls=True)`` over a partitioned window.
  ONE shuffle on the key, no join blowup, no candidate explosion —
  this is the form that survives 100 TB with skewed keys.
- ``strategy="join"``: range join (key equal AND right.ts <= left.ts)
  then keep rank-1 per left row. Simple, but the intermediate is
  O(|matches|) — quadratic on hot keys; kept for small/broadcastable
  right sides.

Determinism: ties on right ts are broken by the largest ``right_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_id: str | None = None,
    strategy: str = "union",
) -> DataFrame:
    """Attach to each left row the latest right row with
    ``right_ts <= left_ts`` matching on key ``on``. Right payload
    columns come back NULL when no such row exists."""
    if strategy == "join":
        return _asof_via_join(left, right, on, left_ts, right_ts, right_cols, right_id)
    return _asof_via_union(left, right, on, left_ts, right_ts, right_cols, right_id)


def _asof_via_union(left, right, on, left_ts, right_ts, right_cols, right_id):
    # Join semantics: a NULL key matches nothing. The window below
    # groups NULL keys into one partition, where a null-key left row
    # would otherwise inherit a null-key right row's payload — so drop
    # null-key RIGHT rows up front; last(ignorenulls) then yields NULL
    # payload for null-key left rows, same as the join strategy.
    # (Null-key left rows still pass through as one window partition;
    # if they dominate the input, filter them around the operator.)
    right = right.filter(F.col(on).isNotNull())
    payload = [c for c in right_cols]
    tie = F.col(right_id) if right_id else F.lit(0)
    l_tag = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload) + ">"
        ).alias("__right"),
    )
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        tie.cast("long").alias("__tie"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("__left"),
        F.struct(*[F.col(c) for c in payload]).alias("__right"),
    )
    # Right rows sort before left rows at equal ts (is_left ASC after ts),
    # so an event AT the left timestamp is visible to it; larger __tie
    # wins among equal-ts right rows.
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "__asof", F.last("__right", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col("__left").getField(c).alias(c) for c in left.columns],
        *[F.col("__asof").getField(c).alias(c) for c in payload],
    )
    return out


def _asof_via_join(left, right, on, left_ts, right_ts, right_cols, right_id):
    lid = "__lrow"
    lw = left.withColumn(lid, F.monotonically_increasing_id())
    r = right.select(
        F.col(on).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        (F.col(right_id) if right_id else F.lit(0)).alias("__rtie"),
    )
    joined = lw.join(
        r, (F.col(on) == F.col("__rkey")) & (F.col("__rts") <= F.col(left_ts)), "left"
    )
    w = Window.partitionBy(lid).orderBy(
        F.col("__rts").desc_nulls_last(), F.col("__rtie").desc_nulls_last()
    )
    ranked = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return ranked.select(
        *left.columns, *[F.col(f"__r_{c}").alias(c) for c in right_cols]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_id: str | None = None,
) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof
    direction='nearest'``): attach the right row whose timestamp is
    closest to ``left_ts`` in EITHER direction, ties to the backward
    (<=) side. Backward candidate ties on equal ts break to the
    LARGEST ``right_id`` (the backward operator's convention); forward
    candidate ties to the SMALLEST (the first row strictly after).

    Scale posture: the same single-shuffle union trick as
    ``asof_join`` — both candidates come from ONE (key)-partitioned
    ordered window pass (``last`` over the preceding frame, ``first``
    over the following frame), so there is no range-join candidate
    blowup and hot keys cost one sort, not a quadratic join. Appends
    ``__dir`` ('b'/'f', NULL when keyless) and ``__dt_us`` (exact
    microsecond distance) alongside the payload columns."""
    right = right.filter(F.col(on).isNotNull())
    payload = [c for c in right_cols]
    tie = F.col(right_id) if right_id else F.lit(0)
    rtypes = dict(right.dtypes)
    pay_t = (
        "struct<__rts_us:bigint,"
        + ",".join(f"{c}:{rtypes[c]}" for c in payload)
        + ">"
    )
    l_tag = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(pay_t).alias("__right"),
    )
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        tie.cast("long").alias("__tie"),
        F.lit(None).cast(
            "struct<"
            + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns)
            + ">"
        ).alias("__left"),
        F.struct(
            F.unix_micros(F.col(right_ts)).alias("__rts_us"),
            *[F.col(c) for c in payload],
        ).alias("__right"),
    )
    # Right rows sort before left at equal ts: an equal-ts event is a
    # backward (dt=0) candidate and never a forward one.
    order = [
        F.col("__ts").asc(),
        F.col("__is_left").asc(),
        F.col("__tie").asc(),
    ]
    w_b = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    merged = (
        l_tag.unionByName(r_tag)
        .withColumn("__bwd", F.last("__right", ignorenulls=True).over(w_b))
        .withColumn("__fwd", F.first("__right", ignorenulls=True).over(w_f))
    )
    t_us = F.unix_micros(F.col("__ts"))
    dt_b = t_us - F.col("__bwd.__rts_us")
    dt_f = F.col("__fwd.__rts_us") - t_us
    use_b = F.col("__bwd").isNotNull() & (
        F.col("__fwd").isNull() | (dt_b <= dt_f)
    )
    chosen = F.when(use_b, F.col("__bwd")).otherwise(F.col("__fwd"))
    direction = F.when(chosen.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(use_b, F.lit("b")).otherwise(F.lit("f"))
    )
    dt = F.when(use_b, dt_b).otherwise(dt_f)
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col("__left").getField(c).alias(c) for c in left.columns],
        *[chosen.getField(c).alias(c) for c in payload],
        direction.alias("__dir"),
        dt.alias("__dt_us"),
    )
    return out
