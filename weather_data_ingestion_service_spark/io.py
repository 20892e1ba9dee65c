"""Parquet readers for the synthetic test tables.

All engine queries load through here so that (a) the session confs the
engine depends on (UTC, nanos handling — see ``session.RUNTIME_CONFS``)
are applied even on a driver-owned SparkSession, and (b) timestamp
types are normalized once:

- parquet ``TIMESTAMP(MICROS, isAdjustedToUTC=false)`` reads as
  TIMESTAMP_NTZ in Spark 4; we cast to session-TZ TimestampType (a
  value-preserving cast under the pinned UTC session).
- ``events.ts`` is parquet ``TIMESTAMP(NANOS)`` which Spark reads (only)
  as a nanosecond long; we floor-divide to microseconds, matching how
  DuckDB truncates the same column.

At 100 TB these readers are unchanged: ``spark.read.parquet`` over a
``date(ts)``/location-partitioned layout gets partition pruning,
predicate pushdown and column pruning from Catalyst with no custom
code (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TEST_TABLES
from .session import configure

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """NTZ → session-TZ timestamp; nanosecond longs stay for callers."""
    cols = []
    changed = False
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            cols.append(F.col(field.name).cast("timestamp").alias(field.name))
            changed = True
        else:
            cols.append(F.col(field.name))
    return df.select(*cols) if changed else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with normalized timestamp types."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanosAsLong: ts arrives as int64 nanoseconds → micros (floor,
        # same truncation DuckDB applies to TIMESTAMP(NANOS)).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_timestamps(df)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TEST_TABLES}
