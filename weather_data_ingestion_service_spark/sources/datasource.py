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
                yield from _rows_from_document(json.loads(line))


def _rows_from_document(doc: dict):
    """Wire-format struct-of-arrays document → tidy rows (shared by
    the offline file reader and the live HTTP reader)."""
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


class _CoordPartition(InputPartition):
    def __init__(self, location_id: int, latitude: float, longitude: float):
        self.location_id = location_id
        self.latitude = latitude
        self.longitude = longitude


class OpenMeteoLiveDataSource(DataSource):
    """format('openmeteo_live') — the live-HTTP twin of
    ``openmeteo_hourly``: one API request per coordinate partition,
    fetched through the resilience envelope (``sources.live``).

    Options: ``coords`` — JSON list of ``[location_id, lat, lon]``
    triples; ``forecast_days``.  Requires ``WDS_LIVE_FETCH=1`` (the
    sandbox has no network; the partition/decode plumbing is what the
    tests pin, with an injected transport).
    """

    @classmethod
    def name(cls) -> str:
        return "openmeteo_live"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> "OpenMeteoLiveReader":
        return OpenMeteoLiveReader(self.options)


class OpenMeteoLiveReader(DataSourceReader):
    def __init__(self, options, transport=None):
        from .live import live_fetch_enabled

        coords = options.get("coords")
        if not coords:
            raise ValueError("openmeteo_live requires a coords option")
        self.coords = json.loads(coords)
        self.forecast_days = int(options.get("forecast_days", 7))
        self.transport = transport
        if transport is None and not live_fetch_enabled():
            raise RuntimeError(
                "openmeteo_live needs WDS_LIVE_FETCH=1 (no network in "
                "offline runs); use format('openmeteo_hourly') on a "
                "landing zone instead"
            )

    def partitions(self):
        return [_CoordPartition(int(i), float(la), float(lo))
                for i, la, lo in self.coords]

    def read(self, partition: _CoordPartition):
        from .live import fetch_forecast_document

        doc = fetch_forecast_document(
            partition.latitude,
            partition.longitude,
            list(DEFAULT_HOURLY_VARS),
            forecast_days=self.forecast_days,
            transport=self.transport,
        )
        doc.setdefault("location_id", partition.location_id)
        doc.setdefault("latitude", partition.latitude)
        doc.setdefault("longitude", partition.longitude)
        yield from _rows_from_document(doc)


def register_openmeteo_source(spark) -> None:
    """Idempotently register the formats with a SparkSession."""
    spark.dataSource.register(OpenMeteoHourlyDataSource)
    spark.dataSource.register(OpenMeteoLiveDataSource)
