"""SparkSession construction with pinned semantics.

The engine pins the handful of SQL configs that change query *results*
(not just performance), so behavior is identical between tests
(local[32]) and a large cluster:

- ``spark.sql.ansi.enabled=false`` — division by zero yields NULL, as in
  Spark 3.5.x (the reference runs Spark 3.5.2 and its ``value /
  lag(value)`` pipeline relies on NULL-on-div-by-zero after ``fillna(0)``
  — reference controller/script.py:42-44,87). DuckDB agrees (NULL).
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the ``events`` fixture
  carries TIMESTAMP(NANOS) parquet; Spark otherwise refuses the scan.
  The catalog converts the long back to a timestamp (micros).
- ``spark.sql.session.timeZone=UTC`` — date/time functions independent
  of host zone.

Performance configs (AQE, shuffle partitions, Arrow) are set here too
but are safe to override per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL configs that pin result semantics. Applied both at build time and
#: defensively at runtime (they are all dynamic configs) so an
#: externally supplied session — e.g. the driver's — behaves the same.
SEMANTIC_CONF = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}

#: Performance posture. AQE handles skew joins and shuffle-partition
#: coalescing at runtime — essential at 100 TB, harmless at sf0.001.
PERF_CONF = {
    # Build-time only (ignored if the JVM is already up): local-mode
    # default heap (~1g) dies on array-heavy shuffles that a real
    # executor (8-64g) absorbs; size the local driver like an executor.
    "spark.driver.memory": "8g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE coalesce partitions INSIDE cached-plan builds too
    # (default false pins a cached frame's output partitioning, so a
    # model-sized persisted frame is materialized and re-read across
    # the full shuffle-partition count of near-empty tasks — the
    # round-14 stat_friedman/stat_anova_two_way regression). Purely a
    # partitioning choice: values are unchanged on any plan.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local[32] default; a real cluster would size this to ~2-3x cores.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.files.maxPartitionBytes": "128MB",
    # Streaming tests use few, tiny micro-batches.
    "spark.sql.streaming.schemaInference": "false",
}


def pin_semantics(spark: SparkSession) -> SparkSession:
    """Apply result-affecting configs to an existing session.

    All three semantic configs are runtime-settable, so this is safe on
    sessions the engine did not build (the verify driver's, a
    notebook's). Returns the session for chaining.
    """
    for k, v in SEMANTIC_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on odd builds
            pass
    return spark


def get_session(
    app_name: str = "bigdata-financial-reporting-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster pass None and let spark-submit / the environment decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**SEMANTIC_CONF, **PERF_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return pin_semantics(spark)
