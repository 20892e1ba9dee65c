"""Aggregations (SURVEY.md §2.D) — the daily-variable families.

The reference never aggregates in-process; each ``DEFAULT_DAILY_VARS``
name (reference server.py:131-136) is a daily aggregate the remote API
computes.  Natively these are one hash aggregation over
``(keys, window(ts, '1 day'))`` — partial (map-side) + final combine is
automatic in Tungsten, which is exactly the shape that scales: the
shuffle carries one row per (key, day, measure-set), not raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: daily variable name → (source hourly column, aggregate family)
#: (reference server.py:131-136 ↔ server.py:125-130).  ``sunrise`` /
#: ``sunset`` / ``daylight_duration`` are astronomy, not hourly
#: aggregates — they come from ``functions.astro.solar_events``;
#: ``sunshine_duration`` uses the WMO convention (direct radiation
#: > 120 W/m² counts as sunshine).
DAILY_VARIABLE_SPECS: dict[str, tuple[str, str]] = {
    "weather_code": ("weather_code", "mode"),
    "temperature_2m_max": ("temperature_2m", "max"),
    "temperature_2m_min": ("temperature_2m", "min"),
    "apparent_temperature_max": ("apparent_temperature", "max"),
    "apparent_temperature_min": ("apparent_temperature", "min"),
    "sunshine_duration": ("direct_radiation", "sunshine"),
    "precipitation_sum": ("precipitation", "sum"),
    "rain_sum": ("rain", "sum"),
    "snowfall_sum": ("snowfall", "sum"),
    "precipitation_hours": ("precipitation", "cond_hours"),
    "uv_index_max": ("uv_index", "max"),
}


def _agg_expr(src: str, family: str, alias: str) -> Column:
    if family == "max":
        return F.max(src).alias(alias)
    if family == "min":
        return F.min(src).alias(alias)
    if family == "sum":
        return F.sum(src).alias(alias)
    if family == "avg":
        return F.avg(src).alias(alias)
    if family == "cond_hours":
        # precipitation_hours: count of hours with precipitation > 0
        # (server.py:134) — conditional count, still map-side combinable.
        return F.sum(F.when(F.col(src) > 0, 1).otherwise(0)).cast("double").alias(alias)
    if family == "sunshine":
        # sunshine_duration seconds: hours with direct radiation above
        # the WMO 120 W/m² sunshine threshold × 3600 (server.py:133)
        return (
            F.sum(F.when(F.col(src) > 120.0, 3600).otherwise(0))
            .cast("double")
            .alias(alias)
        )
    raise ValueError(f"unknown aggregate family: {family}")


def daily_summary(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    specs: dict[str, tuple[str, str]],
    day_alias: str = "day",
) -> DataFrame:
    """Tumbling-daily aggregation: ``groupBy(keys, window(ts, '1 day'))``.

    ``specs`` maps output name → (source column, family) as in
    ``DAILY_VARIABLE_SPECS``.  The ``mode`` family (daily
    ``weather_code``) needs a two-level plan and is handled by
    ``categorical_mode`` — compose with a join when both are needed.
    """
    aggs = [
        _agg_expr(src, family, alias)
        for alias, (src, family) in specs.items()
        if family != "mode"
    ]
    win = F.window(F.col(ts_col), "1 day")
    return (
        df.groupBy(*keys, win.alias("__w"))
        .agg(*aggs)
        .withColumn(day_alias, F.col("__w.start"))
        .drop("__w")
    )


def categorical_mode(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    alias: str | None = None,
) -> DataFrame:
    """Per-group mode with a deterministic tie-break (lowest value).

    Implements the daily representative ``weather_code``
    (reference server.py:132).  Spark's ``mode()`` breaks ties
    arbitrarily, so this uses count-then-rank: two hash aggregations
    and one small window — all map-side-combinable, no Python.
    The oracle mirrors the same rule (SURVEY.md §7 hard parts).
    """
    alias = alias or col
    counted = df.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(*keys).orderBy(F.col("__n").desc(), F.col(col).asc())
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col(col).alias(alias))
    )


def exact_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_long: Column,
    y_long: Column,
) -> DataFrame:
    """Per-group simple linear regression (slope + intercept) from
    exact integer moments, one aggregation pass.

    ``regr_slope``-style streaming covariance is float-order-dependent
    (partial aggregation order changes the bits), so this computes the
    five classical moments n, Sx, Sy, Sxx, Sxy over *integer-encoded*
    inputs — int64 sums are associative, hence identical under any
    partitioning — and applies the closed form in doubles only at the
    very end:

        slope = (Sxy - Sx*Sy/n) / (Sxx - Sx*Sx/n)

    (the mean-centered form keeps every intermediate < 2^53 so the
    int64->double casts stay exact at 100 TB row counts, where the
    n*Sxy textbook form would overflow int64).
    """
    g = df.select(
        *group_cols, x_long.alias("_x"), y_long.alias("_y")
    ).groupBy(*group_cols)
    agg = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    intercept = sy / n - slope * (sx / n)
    return agg.select(
        *group_cols,
        slope.alias("slope"),
        intercept.alias("intercept"),
        F.col("n").alias("n_obs"),
    )
