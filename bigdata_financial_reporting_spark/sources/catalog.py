"""Fixture-table catalog: explicit schemas, no inferSchema on hot paths.

The reference relied on ``inferSchema=true`` (an extra full pass over
the input per job — reference controller/script.py:25). At 100 TB an
inference pass is unaffordable, so every known table gets a declared
``StructType`` and the reader validates against it.

``events.parquet`` is TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark scans it as a long
which we convert to a microsecond timestamp (the fixture's nanos are
exact multiples of 1000, verified — no precision loss).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts declared as LongType: nanosAsLong scan, converted in load_table.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

#: Dimension tables small enough to broadcast at any realistic scale.
BROADCAST_TABLES = {"region", "nation"}


def _norm_fields(fields, table: str) -> list[tuple[str, str]]:
    """Canonicalize a schema for drift comparison.

    - timestamp vs timestamp_ntz depends on the session's
      inferTimestampNTZ setting, not the file; with the timezone pinned
      to UTC they are value-equivalent, so fold them.
    - ``events.ts`` may scan as bigint (TIMESTAMP(NANOS) under
      nanosAsLong) or as a real timestamp (micros on disk); both are
      canonicalized to TimestampType by the readers, so both are
      accepted here — the declared LongType must not reject a
      micros-precision fixture (round-2 ADVICE).
    """
    out = []
    for f in fields:
        dt = f.dataType.simpleString().replace("timestamp_ntz", "timestamp")
        if table == "events" and f.name == "ts" and dt == "bigint":
            dt = "timestamp"
        out.append((f.name, dt))
    return out


def validate_schema(schema: T.StructType, name: str, path: str) -> None:
    """Check an on-disk schema against the declared catalog StructType;
    drift raises instead of flowing silently into every downstream
    query. Shared by the batch reader (load_table) and the streaming
    reader (streaming/runner.events_stream) so both surfaces validate
    identically. Unknown tables pass (no declared schema to enforce)."""
    declared = TABLE_SCHEMAS.get(name)
    if declared is None:
        return
    got = _norm_fields(schema.fields, name)
    want = _norm_fields(declared.fields, name)
    if got != want:
        raise ValueError(
            f"on-disk schema drift for table {name!r} at {path}: "
            f"got {got}, declared {want}"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with canonical types.

    ``events.ts`` comes back as a proper TimestampType (micros) no
    matter the on-disk precision. For cataloged tables the on-disk
    schema (from the parquet footer — no data pass) is checked against
    the declared StructType via ``validate_schema``.
    """
    # Defensive: the driver may hand us a session without our configs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    validate_schema(df.schema, name, path)
    ts_dtype = dict(df.dtypes).get("ts")
    if name == "events" and ts_dtype == "bigint":
        # Integer DIV, not `/`: float division of large nano longs loses
        # the low microsecond digit.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif name == "events" and ts_dtype == "timestamp_ntz":
        # Micros-on-disk without UTC adjustment scans as TIMESTAMP_NTZ
        # under inferTimestampNTZ; with the session zone pinned to UTC
        # the cast to TimestampType is value-identical and restores the
        # documented canonical type (NTZ also rejects numeric casts that
        # downstream epoch arithmetic relies on).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    """Register the fixture tables as temp views for ``spark.sql``."""
    for name in names or TABLE_SCHEMAS:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
