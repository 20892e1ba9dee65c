"""Schemas: the synthetic test tables and the reference's variable catalog.

The reference's de-facto schema is its two default variable lists
(reference server.py:125-136); callers subset them with comma-separated
overrides (server.py:150-151).  Here those lists become fixed
StructTypes — caller-selected variables are plain ``select()``
projections (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference variable catalog (server.py:125-130) -------------------
DEFAULT_HOURLY_VARS: list[str] = [
    "temperature_2m",
    "relative_humidity_2m",
    "dew_point_2m",
    "apparent_temperature",
    "precipitation",
    "rain",
    "snowfall",
    "snow_depth",
    "weather_code",
    "pressure_msl",
    "cloud_cover",
    "shortwave_radiation",
    "direct_radiation",
    "diffuse_radiation",
    "uv_index",
]

# (server.py:131-136)
DEFAULT_DAILY_VARS: list[str] = [
    "weather_code",
    "temperature_2m_max",
    "temperature_2m_min",
    "apparent_temperature_max",
    "apparent_temperature_min",
    "sunrise",
    "sunset",
    "daylight_duration",
    "sunshine_duration",
    "precipitation_sum",
    "rain_sum",
    "snowfall_sum",
    "precipitation_hours",
    "uv_index_max",
    "wind_speed_10m_max",
    "wind_gusts_10m_max",
]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


#: weather_hourly — the reference's columnar time-series block
#: (server.py:213-223) unpivoted to a long/tidy table (SURVEY.md §1.3).
WEATHER_HOURLY_SCHEMA = T.StructType(
    [_f("location_id", T.LongType(), False), _f("ts", T.TimestampType(), False)]
    + [
        _f(v, T.IntegerType() if v == "weather_code" else T.DoubleType())
        for v in DEFAULT_HOURLY_VARS
    ]
)

#: geo — the geocoding dimension replacing per-call Nominatim lookups
#: (server.py:96-119); lat/lon bounds per Coordinate (server.py:46-51).
GEO_SCHEMA = T.StructType(
    [
        _f("place", T.StringType(), False),
        _f("location_id", T.LongType(), False),
        _f("latitude", T.DoubleType()),
        _f("longitude", T.DoubleType()),
        _f("timezone", T.StringType()),
    ]
)

# --- synthetic test tables (TESTDATA.md / FIXTURES.md §1) -------------
TEST_TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [_f("r_regionkey", T.IntegerType()), _f("r_name", T.StringType())]
    ),
    "nation": T.StructType(
        [
            _f("n_nationkey", T.IntegerType()),
            _f("n_name", T.StringType()),
            _f("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            _f("c_custkey", T.LongType()),
            _f("c_name", T.StringType()),
            _f("c_nationkey", T.IntegerType()),
            _f("c_acctbal", T.DoubleType()),
            _f("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            _f("s_suppkey", T.LongType()),
            _f("s_name", T.StringType()),
            _f("s_nationkey", T.IntegerType()),
            _f("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            _f("p_partkey", T.LongType()),
            _f("p_name", T.StringType()),
            _f("p_brand", T.StringType()),
            _f("p_type", T.StringType()),
            _f("p_size", T.IntegerType()),
            _f("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            _f("o_orderkey", T.LongType()),
            _f("o_custkey", T.LongType()),
            _f("o_orderstatus", T.StringType()),
            _f("o_totalprice", T.DoubleType()),
            _f("o_orderdate", T.TimestampType()),
            _f("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            _f("l_orderkey", T.LongType()),
            _f("l_partkey", T.LongType()),
            _f("l_suppkey", T.LongType()),
            _f("l_linenumber", T.IntegerType()),
            _f("l_quantity", T.DoubleType()),
            _f("l_extendedprice", T.DoubleType()),
            _f("l_discount", T.DoubleType()),
            _f("l_tax", T.DoubleType()),
            _f("l_returnflag", T.StringType()),
            _f("l_linestatus", T.StringType()),
            _f("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            _f("event_id", T.LongType()),
            _f("ts", T.TimestampType()),
            _f("user_id", T.LongType()),
            _f("event_type", T.StringType()),
            _f("value", T.DoubleType()),
            _f("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            _f("doc_id", T.LongType()),
            _f("text", T.StringType()),
            _f("lang", T.StringType()),
            _f("source", T.StringType()),
            _f("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            _f("vec_id", T.LongType()),
            _f("embedding", T.ArrayType(T.FloatType())),
            _f("label", T.IntegerType()),
        ]
    ),
}

TEST_TABLES: list[str] = list(TEST_TABLE_SCHEMAS)
