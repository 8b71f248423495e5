"""Table profiling: per-column statistics in one pass.

The ANALYZE/profiling shape every warehouse needs before planning work
on an unknown 100 TB table: row count, null counts, min/max, and
approximate distinct counts for every column, computed in a SINGLE
aggregation over one scan (not a per-column loop — one pass, map-side
partials, one reduce)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: types whose min/max render stably across engines
_ORDERED = (
    T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.DecimalType,
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
)


def profile_table(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """One-row-per-column profile: ``column, n_rows, n_nulls, n_distinct
    (approx), min_s, max_s`` (min/max as strings so heterogeneous
    column types fit one result schema; None for unordered types)."""
    cols = df.schema.fields
    n_rows = F.count(F.lit(1))

    aggs = [n_rows.alias("__n")]
    for f in cols:
        c = F.col(f.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"__nulls_{f.name}"))
        aggs.append(
            F.approx_count_distinct(c, approx_rsd).alias(f"__ndv_{f.name}")
        )
        if isinstance(f.dataType, _ORDERED):
            aggs.append(F.min(c).cast("string").alias(f"__min_{f.name}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{f.name}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{f.name}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{f.name}"))
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column
    entries = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{f.name}").alias("n_nulls"),
                F.col(f"__ndv_{f.name}").alias("n_distinct"),
                F.col(f"__min_{f.name}").alias("min_s"),
                F.col(f"__max_{f.name}").alias("max_s"),
            )
            for f in cols
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")
