"""Solar astronomy: sunrise / sunset / daylight duration per
(latitude, longitude, date).

The reference requests these as daily variables and the remote API
computes them (reference server.py:133: ``sunrise, sunset,
daylight_duration, sunshine_duration``).  Natively they are the NOAA
solar-position equations (public: NOAA Global Monitoring Division
solar calculator) — pure trigonometry per row, implemented as an
Arrow-vectorized pandas UDF (numpy array math, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_OUT = T.StructType(
    [
        T.StructField("sunrise_utc_hour", T.DoubleType()),
        T.StructField("sunset_utc_hour", T.DoubleType()),
        T.StructField("daylight_duration", T.DoubleType()),  # seconds
    ]
)


def solar_components(
    lat: "np.ndarray", lon: "np.ndarray", day_of_year: "np.ndarray"
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """NOAA-style sunrise-equation approximation, pure numpy.

    Returns ``(sunrise_utc_hour, sunset_utc_hour, daylight_seconds)``.
    Good to a few minutes — adequate for daylight-duration features;
    polar day/night saturate to 24h/0h.  Factored out of the pandas
    UDF so the SAME float64 op sequence can precompute the solar
    dimension table driver-side (the oracle route for
    ``wx_sunrise_sunset``: identical code → bit-identical doubles)."""
    phi = np.radians(np.asarray(lat, dtype="float64"))
    n = np.asarray(day_of_year, dtype="float64")
    # solar declination (Cooper's equation)
    decl = np.radians(23.44) * np.sin(2 * np.pi * (284 + n) / 365.0)
    cos_h0 = -np.tan(phi) * np.tan(decl)
    cos_h0 = np.clip(cos_h0, -1.0, 1.0)
    h0 = np.degrees(np.arccos(cos_h0))  # half day-arc, degrees
    daylight_hours = 2.0 * h0 / 15.0
    # solar noon in UTC hours (mean-sun approximation)
    noon_utc = 12.0 - np.asarray(lon, dtype="float64") / 15.0
    sunrise = noon_utc - daylight_hours / 2.0
    sunset = noon_utc + daylight_hours / 2.0
    return sunrise, sunset, daylight_hours * 3600.0


@pandas_udf(_OUT)
def _solar(lat: pd.Series, lon: pd.Series, day_of_year: pd.Series) -> pd.DataFrame:
    sunrise, sunset, daylight = solar_components(
        lat.to_numpy(dtype="float64"),
        lon.to_numpy(dtype="float64"),
        day_of_year.to_numpy(dtype="float64"),
    )
    return pd.DataFrame(
        {
            "sunrise_utc_hour": sunrise,
            "sunset_utc_hour": sunset,
            "daylight_duration": daylight,
        }
    )


def solar_events(
    df: DataFrame,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    date_col: str = "day",
) -> DataFrame:
    """Attach sunrise/sunset (UTC fractional hours) and daylight
    duration (seconds) per row of a (location, day) frame."""
    out = _solar(
        F.col(lat_col).cast("double"),
        F.col(lon_col).cast("double"),
        F.dayofyear(F.col(date_col)).cast("double"),
    )
    return df.withColumn("__solar", out).select(
        "*",
        F.col("__solar.sunrise_utc_hour").alias("sunrise_utc_hour"),
        F.col("__solar.sunset_utc_hour").alias("sunset_utc_hour"),
        F.col("__solar.daylight_duration").alias("daylight_duration"),
    ).drop("__solar")
