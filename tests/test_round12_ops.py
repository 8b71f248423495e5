"""Property tests for the round-12 extensions: the stream-stream FULL
OUTER interval join, the at-least-once -> exactly-once streaming dedup,
and the OPQ Hadamard rotation step on the PQ path. Oracle-hash parity
is covered by test_oracle; these pin what the hash can't see — the
multi-batch watermark flush on BOTH join sides, the no-duplicate-
survives contract under a genuinely duplicated stream, and the
rotation's exact orthonormality (an integer identity, not a float
tolerance)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_financial_reporting_spark.queries import QUERIES
from bigdata_financial_reporting_spark.sources.catalog import load_table


def _nsort(rows):
    """Sort tuples that may carry NULLs (outer-join output)."""
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def _stage_events(spark, sf_dir, tmp_path, n_parts):
    staged_root = os.path.join(str(tmp_path), "sfstaged")
    os.makedirs(staged_root, exist_ok=True)
    load_table(spark, sf_dir, "events").repartition(n_parts).write.mode(
        "overwrite"
    ).parquet(os.path.join(staged_root, "events.parquet"))
    return staged_root


def test_stream_full_outer_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    """With the fixture carved into 4 micro-batches, the availableNow
    drain of the FULL OUTER interval join equals the batch full join
    EXACTLY — including the null-padded rows on BOTH sides that only
    exist because watermark-driven eviction fired (unmatched views AND
    unmatched clicks), the property the left-outer key can only pin
    for one side."""
    staged = _stage_events(spark, sf_dir, tmp_path, 4)

    res = QUERIES["stream_stream_full_outer"].fn(spark, staged)
    got = _nsort(
        (r["user_id"], r["view_id"], r["click_id"]) for r in res.collect()
    )

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(
        (F.col("event_type") == "view") & (F.col("ts") < "2024-01-05")
    ).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = ev.filter(
        (F.col("event_type") == "click") & (F.col("ts") < "2024-01-05")
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    batch = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "full_outer",
    ).select(
        F.coalesce(F.col("v_user"), F.col("c_user")).alias("user_id"),
        "view_id",
        "click_id",
    )
    want = _nsort(
        (r["user_id"], r["view_id"], r["click_id"]) for r in batch.collect()
    )
    assert got == want

    # genuinely outer on BOTH sides, or the test is vacuous
    unmatched_views = [r for r in got if r[2] is None]
    unmatched_clicks = [r for r in got if r[1] is None]
    assert unmatched_views, "no unmatched views — full outer untested"
    assert unmatched_clicks, "no unmatched clicks — full outer untested"


def test_stream_dedup_exactly_once_no_duplicate_survives(spark, sf_dir):
    """The key's aggregate hash would catch a survivor, but this pins
    the mechanism: drain just the dedup stage of a doubled stream and
    require exactly ONE row per event_id — equal to the batch distinct
    set, with the value column intact on every survivor."""
    from bigdata_financial_reporting_spark.streaming.runner import (
        events_stream,
        run_available_now,
    )

    s = events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value", "ts"
    )
    dup = s.withColumn(
        "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("__copy")
    deduped = (
        dup.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )
    drained = run_available_now(deduped, output_mode="append")
    n_events = load_table(spark, sf_dir, "events").count()
    assert drained.count() == n_events
    assert (
        drained.select("event_id").distinct().count() == n_events
    ), "a duplicate event_id survived the watermarked dedup"
    assert drained.filter(F.col("value").isNull()).count() == 0


def test_hadamard_rotation_exact_orthonormality(spark, sf_dir):
    """H·Hᵀ = dim·I makes the rotation distance-preserving as an exact
    INTEGER identity on the quantized vectors: sum((q·H)_i^2) must
    equal dim * sum(q_j^2) for every row — checked with arbitrary-
    precision Python ints, no float tolerance anywhere."""
    from bigdata_financial_reporting_spark.operators.similarity import (
        hadamard_rotate,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(50)
    rows = {r["vec_id"]: r["embedding"] for r in e.collect()}
    rot = {
        r["vec_id"]: r["embedding"]
        for r in hadamard_rotate(e, "vec_id", "embedding", dim=64).collect()
    }
    assert set(rot) == set(rows)
    idx = np.arange(64, dtype=np.int64)
    ij = np.bitwise_and(idx[:, None], idx[None, :])
    parity = np.zeros_like(ij)
    while ij.any():
        parity += ij & 1
        ij >>= 1
    sign = np.where(parity % 2 == 1, -1, 1).astype(object)
    import math

    def half_away(x):  # Spark round / DuckDB round, not Python's half-even
        return int(math.copysign(math.floor(abs(x) * 1_000_000 + 0.5), x))

    for vid, v in rows.items():
        q = [half_away(float(x)) for x in v]
        r_int = [sum(q[j] * int(sign[i, j]) for j in range(64)) for i in range(64)]
        # the operator's double output is exactly r_int / 8e6
        assert rot[vid] == pytest.approx(
            [x / 8_000_000.0 for x in r_int], abs=0.0
        ), f"vec {vid}: rotated values are not the exact integer render"
        assert sum(x * x for x in r_int) == 64 * sum(x * x for x in q), (
            f"vec {vid}: rotation broke the exact norm identity"
        )


def test_hadamard_rotate_rejects_wrong_dim(spark):
    from pyspark.sql import Row

    from bigdata_financial_reporting_spark.operators.similarity import (
        hadamard_rotate,
    )

    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0] * 32)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="length 64|ragged"):
        hadamard_rotate(df, "vec_id", "embedding", dim=64).collect()
    with pytest.raises(ValueError, match="power of 2"):
        hadamard_rotate(df, "vec_id", "embedding", dim=48)


def test_opq_key_is_deterministic_and_well_formed(spark, sf_dir):
    out1 = QUERIES["sim_opq_rotation_encode"].fn(spark, sf_dir).collect()
    out2 = QUERIES["sim_opq_rotation_encode"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(out1) == n
    for r in out1:
        codes = [int(c) for c in r["pq_code"].split(",")]
        assert len(codes) == 8 and all(0 <= c < 16 for c in codes)
        assert r["mse_rot"] >= 0.0 and r["mse_raw"] >= 0.0
        # codebook members reconstruct exactly in BOTH spaces: the
        # degenerate book is the lowest-16 vectors of each space
        if r["id"] < 16:
            assert r["mse_rot"] == 0.0 and r["mse_raw"] == 0.0
