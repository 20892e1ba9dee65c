"""Custom Python DataSource (Spark 4 DataSource API) for Open-Meteo
hourly JSON documents.

``spark.read.format("openmeteo_hourly").load(dir)`` over a directory
of wire-format JSON files (one struct-of-arrays document per file or
JSON-lines) — the DataSource-V2-style packaging of the ingest path:
one InputPartition per file, so a directory of N documents scans with
N-way parallelism and no driver-side decode.

This is the *offline* source (the test/landing-zone path).  A live
connector would fetch bodies over HTTP inside ``read`` using the
``resilience`` policies (reference server.py:57-93) — same partition
shape, one request per partition.

For bulk decode of JSON already in a DataFrame, prefer the pure-
expression codec in ``openmeteo.parse_openmeteo_hourly`` (JVM-side,
whole-stage codegen); this class exists for the *source* integration
point where Spark must discover, split and schedule the inputs.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import DEFAULT_HOURLY_VARS

_SCHEMA_DDL = (
    "location_id bigint, latitude double, longitude double, ts timestamp, "
    + ", ".join(
        f"{v} {'int' if v == 'weather_code' else 'double'}"
        for v in DEFAULT_HOURLY_VARS
    )
)


class OpenMeteoHourlyDataSource(DataSource):
    """format('openmeteo_hourly') — options: ``path`` (dir or glob)."""

    @classmethod
    def name(cls) -> str:
        return "openmeteo_hourly"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> "OpenMeteoHourlyReader":
        return OpenMeteoHourlyReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OpenMeteoHourlyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("openmeteo_hourly requires a path")

    def partitions(self):
        pattern = (
            self.path
            if any(ch in self.path for ch in "*?[")
            else os.path.join(self.path, "*.json")
        )
        files = sorted(glob.glob(pattern))
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                doc = json.loads(line)
                hourly = doc.get("hourly", {})
                times = hourly.get("time", [])
                series = {v: hourly.get(v) for v in DEFAULT_HOURLY_VARS}
                for i, t in enumerate(times):
                    ts = dt.datetime.fromisoformat(t)
                    row = [
                        doc.get("location_id"),
                        doc.get("latitude"),
                        doc.get("longitude"),
                        ts,
                    ]
                    for v in DEFAULT_HOURLY_VARS:
                        arr = series[v]
                        val = arr[i] if arr is not None and i < len(arr) else None
                        if v == "weather_code" and val is not None:
                            val = int(val)
                        row.append(val)
                    yield tuple(row)


def register_openmeteo_source(spark) -> None:
    """Idempotently register the format with a SparkSession."""
    spark.dataSource.register(OpenMeteoHourlyDataSource)
