"""Banded range join — the large-to-large interval join Spark lacks.

A pure range predicate (``point BETWEEN start AND end`` with no equi
key) gives Catalyst only BroadcastNestedLoopJoin (needs one small
side) or CartesianProduct (quadratic). The banding rewrite turns it
into an EQUI join both engines' optimizers know how to scale (this is
the manual form of the range-join optimization that closed-source
Spark distributions apply automatically):

1. pick a band width comparable to the typical interval length;
2. each POINT row gets exactly one bucket: floor(point / band);
3. each INTERVAL row explodes into every bucket its [start, end)
   span overlaps — with band ~ interval length that's O(1) rows;
4. equi-join on the bucket, then re-apply the exact range predicate.

Each matching pair meets in EXACTLY one bucket (the point's), so no
dedup pass is needed — output cardinality equals the naive join's.
Both sides shuffle by bucket: large-to-large parallelizes on any
cluster, skew bounded by rows-per-band (pick the band accordingly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows on
    ``start <= point < end`` via band buckets.

    ``point_col`` (on ``points``) and ``start_col``/``end_col`` (on
    ``intervals``) must be timestamps. Returns the joined frame with
    all columns from both sides (bucket helpers dropped). Column names
    must not collide between the two inputs.

    ``how`` is restricted to ``inner``/``left``: the interval side is
    pre-exploded into one row per covered bucket, so for ``right``/
    ``full`` an UNMATCHED interval would surface once per bucket
    instead of once — null-extended duplicates. The point side is
    never exploded, so ``left`` (preserving points) is exact.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"banded_range_join supports how='inner'|'left', got {how!r}: "
            "the exploded interval side would duplicate unmatched rows "
            "(one per covered bucket) under right/full"
        )

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / (band_seconds * 1_000_000)).cast("long")

    p = points.withColumn("__pb", bucket(F.col(point_col)))
    # end is exclusive: an interval touching a bucket boundary at its
    # end does not cover that bucket unless it extends into it.
    i = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(
                bucket(F.col(start_col)),
                bucket(
                    F.timestamp_micros(
                        F.unix_micros(F.col(end_col)) - F.lit(1)
                    )
                ),
            )
        ),
    )
    joined = p.join(
        i,
        (F.col("__pb") == F.col("__ib"))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col)),
        how,
    )
    return joined.drop("__pb", "__ib")


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    band_seconds: int,
) -> DataFrame:
    """Interval-OVERLAP join (``l_start < r_end AND r_start < l_end``,
    half-open) via the same banding: both sides explode into covered
    buckets, overlapping pairs share at least one bucket, and the
    first-common-bucket condition ``bucket == greatest(bucket(l_start),
    bucket(r_start))`` emits each pair EXACTLY once — no distinct pass
    over the output. Column names must not collide."""

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / (band_seconds * 1_000_000)).cast("long")

    def spanned(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        return df.withColumn(
            out,
            F.explode(
                F.sequence(
                    bucket(F.col(s)),
                    bucket(F.timestamp_micros(F.unix_micros(F.col(e)) - F.lit(1))),
                )
            ),
        )

    l = spanned(left, left_start, left_end, "__lb")
    r = spanned(right, right_start, right_end, "__rb")
    joined = l.join(
        r,
        (F.col("__lb") == F.col("__rb"))
        & (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (
            F.col("__lb")
            == F.greatest(bucket(F.col(left_start)), bucket(F.col(right_start)))
        ),
    )
    return joined.drop("__lb", "__rb")
