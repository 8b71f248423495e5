"""Time-series rollups: multi-granularity bucketed aggregates
(the "hypertable continuous aggregate" shape, expressed relationally).

``timeseries_rollup`` computes the same aggregates at several time
granularities in ONE pass: bucket to the FINEST granularity, aggregate,
then re-aggregate the (tiny) fine-grained partials upward. The raw
data is scanned and shuffled once; each coarser level aggregates the
previous level's output — the classic OLAP rollup cascade, sized so
level N+1's input is level N's output (thousands of rows, not
billions).

Aggregates must be algebraic for the cascade to be exact: sum/count/
min/max pass through, avg decomposes into sum+count.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.operators.cache import track

#: granularity -> truncation understood by date_trunc
_TRUNC = {
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
}
#: coarse -> next finer level (the cascade order)
_ORDER = ["minute", "hour", "day", "week", "month"]


def timeseries_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    granularities: list[str],
    quantize: int | None = None,
) -> DataFrame:
    """Aggregates of ``value_col`` per (granularity bucket, keys).

    Returns columns: ``granularity, bucket_start, *keys, n, v_sum,
    v_min, v_max, v_avg``. Exact at every level (cascade re-aggregates
    partial sums/counts, never averages of averages).

    ``quantize``: when set (e.g. 1_000_000 for micro-units), ``v_sum``
    accumulates exact integer units in decimal(38,0) and converts to
    double ONCE at the end — order-independent, so the cascaded sum is
    bit-identical to a direct sum over raw rows at any scale. Raw
    double sums are merge-order-dependent and drift at ~1e6+ rows per
    bucket (round-6 at-scale red). min/max are order-safe either way.
    """
    unknown = [g for g in granularities if g not in _TRUNC]
    if unknown:
        raise ValueError(f"unknown granularities {unknown}; pick from {_ORDER}")
    gs = sorted(granularities, key=_ORDER.index)

    v = F.col(value_col)
    if quantize is not None:
        v_in = F.round(v * F.lit(float(quantize))).cast("long").cast("decimal(38,0)")
    else:
        v_in = v
    finest = gs[0]
    # Every non-final level feeds TWO consumers — its own union branch
    # and the next-coarser aggregation — and Catalyst does not reuse a
    # subtree across union branches: unpersisted, the week branch of an
    # hour/day/week rollup re-scanned and re-aggregated the RAW table
    # through hour AND day (three full scans per action, measured in
    # the round-14 audit). The per-level partials are bucket-count-
    # sized (never corpus-sized), so persisting them is model-state
    # cheap and restores the cascade's designed cost: ONE raw scan +
    # one shuffle of map-collapsed partials, then tiny re-aggregations.
    # track()-scoped like every operator-internal persist.
    level = track(
        df.select(
            F.date_trunc(_TRUNC[finest], F.col(ts_col)).alias("bucket_start"),
            *[F.col(k) for k in keys],
            v_in.alias("__v"),
            v.alias("__vraw"),
        )
        .groupBy("bucket_start", *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__v").alias("v_sum"),
            F.min("__vraw").alias("v_min"),
            F.max("__vraw").alias("v_max"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = level.select(F.lit(finest).alias("granularity"), "*")
    prev = level
    for i, g in enumerate(gs[1:]):
        nxt = (
            prev.select(
                F.date_trunc(_TRUNC[g], F.col("bucket_start")).alias("bucket_start"),
                *keys,
                "n",
                "v_sum",
                "v_min",
                "v_max",
            )
            .groupBy("bucket_start", *keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("v_sum").alias("v_sum"),
                F.min("v_min").alias("v_min"),
                F.max("v_max").alias("v_max"),
            )
        )
        if i < len(gs) - 2:  # non-final levels have two consumers
            nxt = track(nxt.persist(StorageLevel.MEMORY_AND_DISK))
        out = out.unionByName(nxt.select(F.lit(g).alias("granularity"), "*"))
        prev = nxt
    if quantize is not None:
        # keep the exact integer units alongside the double rendering:
        # callers that emit rounded-resolution cells must derive them
        # from v_sum_units with integer half-away division (a float
        # round() of a quantized-derived value diverges cross-engine
        # on exact decimal halves — see functions/exact.py)
        out = out.withColumn("v_sum_units", F.col("v_sum")).withColumn(
            "v_sum", F.col("v_sum").cast("double") / F.lit(float(quantize))
        )
    return out.withColumn("v_avg", F.col("v_sum") / F.col("n"))
