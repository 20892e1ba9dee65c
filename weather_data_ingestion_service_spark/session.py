"""SparkSession construction and engine configuration.

The engine pins a handful of session confs that correctness and the
100 TB posture depend on:

- ``spark.sql.session.timeZone=UTC`` — the reference's timestamps are
  ISO strings on a UTC-ish axis (reference server.py:289-290); the
  DuckDB oracle's TIMESTAMP is UTC-naive.  All time bucketing must
  agree between the two engines, so UTC everywhere.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the events fixture
  carries nanosecond parquet timestamps, which Spark 4 otherwise
  rejects; the loader converts the long to a microsecond timestamp
  (matching DuckDB's nanos→micros truncation).
- AQE on (coalesce partitions, skew join) — the runtime re-planner is
  the main defence at 100 TB where static stats are wrong.
- Arrow on — every pandas_udf / applyInPandas path is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs that can be applied to an existing session (the driver
#: hands us its own SparkSession; these are all runtime-settable).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: keep filter/column pushdown on (defaults, pinned
    # explicitly because the whole 100 TB design leans on them).
    "spark.sql.parquet.filterPushdown": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session.

    Idempotent; called by every loader so driver-owned sessions get the
    same semantics as engine-built ones.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this build — non-fatal.
            pass
    return spark


def get_spark(
    app_name: str = "weather-data-ingestion-service-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    32) for local runs; on a real cluster the caller passes nothing and
    spark-submit supplies the master.  ``shuffle_partitions`` defaults
    to the local core count — at cluster scale you want
    2-3× total executor cores instead, so it is a parameter, not a
    constant.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return configure(spark)
