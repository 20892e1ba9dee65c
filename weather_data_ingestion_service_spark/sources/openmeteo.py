"""Open-Meteo wire-format codec: struct-of-arrays JSON ↔ tidy rows.

The reference's core data object is the API response: one JSON
document per (location, request) whose ``hourly`` block holds a
``time`` array plus one parallel array per variable
(reference server.py:213-223, returned verbatim at server.py:74, 258).
This module converts that columnar JSON into the engine's canonical
long table — ``from_json`` → ``arrays_zip`` → ``explode`` — and back.
Everything is built-in expressions: at 100 TB this parse runs inside
whole-stage codegen over however many JSON documents the ingest layer
lands, with no Python in the loop.

A live connector would wrap an HTTP fetch (see ``resilience`` for the
reference's retry/rate-limit envelope) and feed the same parser; tests
feed round-tripped fixture JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..schemas import DEFAULT_HOURLY_VARS

#: schema of one forecast/history response document's hourly block
#: ({time: [...], temperature_2m: [...], ...} — server.py:213-217)
OPENMETEO_HOURLY_SCHEMA = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("location_id", T.LongType()),
        T.StructField(
            "hourly",
            T.StructType(
                [T.StructField("time", T.ArrayType(T.StringType()))]
                + [
                    T.StructField(v, T.ArrayType(T.DoubleType()))
                    for v in DEFAULT_HOURLY_VARS
                ]
            ),
        ),
    ]
)


def parse_openmeteo_hourly(
    json_docs: DataFrame, json_col: str = "body"
) -> DataFrame:
    """Columnar JSON documents → tidy long rows.

    ``arrays_zip`` aligns the parallel arrays positionally (the
    format's contract: every array shares the time axis), ``explode``
    unpivots to one row per timestamp; ISO time strings become
    timestamps; ``weather_code`` is re-typed to int (the one
    categorical in the catalog, server.py:128).
    """
    doc = F.from_json(F.col(json_col), OPENMETEO_HOURLY_SCHEMA)
    zipped = F.arrays_zip(
        doc["hourly"]["time"].alias("time"),
        *[doc["hourly"][v].alias(v) for v in DEFAULT_HOURLY_VARS],
    )
    row = F.explode(zipped).alias("r")
    out = json_docs.select(
        doc["location_id"].alias("location_id"),
        doc["latitude"].alias("latitude"),
        doc["longitude"].alias("longitude"),
        row,
    )
    return out.select(
        "location_id",
        "latitude",
        "longitude",
        F.to_timestamp(F.col("r.time"), "yyyy-MM-dd'T'HH:mm").alias("ts"),
        *[
            (
                F.col(f"r.{v}").cast("int")
                if v == "weather_code"
                else F.col(f"r.{v}")
            ).alias(v)
            for v in DEFAULT_HOURLY_VARS
        ],
    )


def to_openmeteo_json(
    tidy: DataFrame,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Tidy long rows → one struct-of-arrays JSON document per
    location (the inverse codec; used to synthesize wire-format
    fixtures and as a sink shape for API-compatible serving).

    ``sort_array`` on (ts, value) structs keeps every variable array
    aligned on the same time order without a per-location sort shuffle
    beyond the single groupBy.
    """
    pairs = F.struct(F.col("ts"), *[F.col(v) for v in DEFAULT_HOURLY_VARS])
    grouped = tidy.groupBy("location_id").agg(
        F.first(lat_col).alias("latitude"),
        F.first(lon_col).alias("longitude"),
        F.sort_array(F.collect_list(pairs)).alias("rows"),
    )
    # NB: the per-variable lambda must stay single-argument — a second
    # (default) parameter would make F.transform treat it as the
    # (element, index) form — so close over the name via a factory.
    def _field(name):
        return lambda r: r[name]

    hourly = F.struct(
        F.transform(
            "rows", lambda r: F.date_format(r["ts"], "yyyy-MM-dd'T'HH:mm")
        ).alias("time"),
        *[F.transform("rows", _field(v)).alias(v) for v in DEFAULT_HOURLY_VARS],
    )
    doc = F.to_json(
        F.struct(
            F.col("latitude"),
            F.col("longitude"),
            F.lit("UTC").alias("timezone"),
            F.col("location_id"),
            hourly.alias("hourly"),
        )
    )
    return grouped.select(F.col("location_id").alias("doc_location_id"), doc.alias("body"))
