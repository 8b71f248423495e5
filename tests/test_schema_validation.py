"""Shared schema-drift gate (round-2 verdict item 6 + ADVICE): batch
(load_table) and streaming (events_stream) readers validate on-disk
schemas identically, and events.ts is accepted at EITHER precision —
nanos-as-long or a real micros timestamp — both canonicalized to
TimestampType."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.sources.catalog import (
    load_table,
    validate_schema,
)
from bigdata_financial_reporting_spark.streaming.runner import (
    events_stream,
    run_available_now,
)


def _stage_events(spark, tmp_path, df):
    """Stage as a single FILE named events.parquet (the fixture layout —
    the stream source symlinks the file, not a directory)."""
    import glob
    import shutil

    d = str(tmp_path / "fixtures")
    staging = str(tmp_path / "_staging")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    [part] = glob.glob(os.path.join(staging, "part-*.parquet"))
    shutil.move(part, os.path.join(d, "events.parquet"))
    return d


def _micros_events(spark):
    return spark.createDataFrame(
        [
            Row(event_id=1, ts="2024-01-01 00:00:00.123456", user_id=7,
                event_type="click", value=1.5, props="{}"),
            Row(event_id=2, ts="2024-01-01 00:00:01.000001", user_id=7,
                event_type="view", value=2.5, props="{}"),
        ]
    ).select(
        F.col("event_id").cast("long"),
        F.to_timestamp("ts").alias("ts"),
        F.col("user_id").cast("long"),
        "event_type",
        "value",
        "props",
    )


def test_load_table_accepts_micros_precision_events(spark, tmp_path):
    d = _stage_events(spark, tmp_path, _micros_events(spark))
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    [r] = df.filter("event_id = 1").collect()
    assert r.ts.microsecond == 123456


def test_events_stream_accepts_micros_precision_events(spark, tmp_path):
    d = _stage_events(spark, tmp_path, _micros_events(spark))
    out = run_available_now(events_stream(spark, d), output_mode="append")
    rows = {r.event_id: r for r in out.collect()}
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert rows[1].ts.microsecond == 123456


def test_batch_and_stream_reject_drift_identically(spark, tmp_path):
    bad = _micros_events(spark).withColumnRenamed("value", "amount")
    d = _stage_events(spark, tmp_path, bad)
    with pytest.raises(ValueError, match="schema drift"):
        load_table(spark, d, "events")
    with pytest.raises(ValueError, match="schema drift"):
        events_stream(spark, d)


def test_validate_schema_passes_unknown_tables(spark):
    # No declared schema -> nothing to enforce (ad-hoc datasets).
    df = spark.createDataFrame([Row(x=1)])
    validate_schema(df.schema, "some_adhoc_table", "/nowhere")


def test_nanos_fixture_still_loads_both_paths(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp"
    stream = run_available_now(
        events_stream(spark, sf_dir).groupBy().count(), output_mode="complete"
    )
    [r] = stream.collect()
    assert r["count"] == batch.count()
