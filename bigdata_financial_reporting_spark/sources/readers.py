"""File sources: parquet / CSV / JSON.

Explicit schemas are the default posture (no inference pass over 100 TB)
but inference stays available as a convenience, matching the reference's
CSV reader (reference controller/script.py:22-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan (generalizes reference R6, controller/script.py:22-27)."""
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("sep", sep)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
