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


def daily_summary_with_mode(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    specs: dict[str, tuple[str, str]],
    day_alias: str = "day",
) -> DataFrame:
    """The full daily product INCLUDING the categorical mode in ONE
    scan of ``df`` — the composition ``daily_summary ⋈
    categorical_mode`` reads the input twice (each branch its own
    shuffle; round-11 plan audit: the duplication doubles the corpus
    pass when the input is itself a shuffled view, e.g. the
    history∪forecast merge).  Two-level re-aggregation instead:

    - level 1 groups by ``(keys, day, mode_col)`` and computes every
      measure's partial (max/min/sum partials re-aggregate exactly;
      the conditional counters stay integer) plus the group count;
    - level 2 groups by ``(keys, day)``, folds the partials, and takes
      the mode as ``min_by(mode_col, struct(-n, mode_col))`` — largest
      count, ties to the smallest value, the server.py:132 rule — so
      no join, no second scan, and the level-2 shuffle moves one row
      per (day, code), not per hour.

    Exactness: max/min/sum-of-integer-valued partials fold without
    float-order sensitivity (the repo's cross-engine sum discipline
    already requires integer-valued measures); ``avg`` folds as
    (Σsum)/(Σcount), the same two-phase computation Spark's own avg
    performs.  Exactly one ``mode`` family entry is required in
    ``specs``."""
    mode_items = [
        (alias, src) for alias, (src, fam) in specs.items() if fam == "mode"
    ]
    if len(mode_items) != 1:
        raise ValueError(
            "daily_summary_with_mode needs exactly one mode spec, got "
            f"{len(mode_items)}"
        )
    mode_alias, mode_src = mode_items[0]

    p1, p2 = [], []
    for alias, (src, family) in specs.items():
        if family == "mode":
            continue
        p = f"__p_{alias}"
        if family == "max":
            p1.append(F.max(src).alias(p))
            p2.append(F.max(p).alias(alias))
        elif family == "min":
            p1.append(F.min(src).alias(p))
            p2.append(F.min(p).alias(alias))
        elif family == "sum":
            p1.append(F.sum(src).alias(p))
            p2.append(F.sum(p).alias(alias))
        elif family == "cond_hours":
            p1.append(F.sum(F.when(F.col(src) > 0, 1).otherwise(0)).alias(p))
            p2.append(F.sum(p).cast("double").alias(alias))
        elif family == "sunshine":
            p1.append(
                F.sum(F.when(F.col(src) > 120.0, 3600).otherwise(0)).alias(p)
            )
            p2.append(F.sum(p).cast("double").alias(alias))
        elif family == "avg":
            p1.append(F.sum(src).alias(p))
            p1.append(F.count(src).alias(p + "_n"))
            p2.append((F.sum(p) / F.sum(p + "_n")).alias(alias))
        else:
            raise ValueError(f"unknown aggregate family: {family}")

    win = F.window(F.col(ts_col), "1 day")
    lvl1 = df.groupBy(*keys, win.alias("__w"), F.col(mode_src)).agg(
        *p1, F.count(F.lit(1)).alias("__n")
    )
    lvl2 = lvl1.groupBy(*keys, "__w").agg(
        *p2,
        F.min_by(
            mode_src, F.struct((-F.col("__n")).alias("__neg"), F.col(mode_src))
        ).alias(mode_alias),
    )
    return lvl2.withColumn(day_alias, F.col("__w.start")).drop("__w")


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


def value_histogram(
    df: DataFrame,
    value_col: str,
    scale: int = 2,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Equi-width histogram: bin ``i`` covers ``[i/scale, (i+1)/scale)``.

    The bin id is ``floor(value * scale)`` with a power-of-two
    ``scale`` — scaling a double by 2^k only shifts the exponent, so
    binning is bit-exact cross-engine (no quantize-then-round
    ambiguity).  One map-side-combinable hash aggregate: the shuffle
    carries |groups|·|bins| rows regardless of input size — the shape
    that survives 100 TB.
    """
    assert scale & (scale - 1) == 0, "scale must be a power of two"
    binned = df.withColumn(
        "bin", F.floor(F.col(value_col) * F.lit(float(scale))).cast("long")
    )
    return (
        binned.groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("bin_lo", F.col("bin").cast("double") / F.lit(float(scale)))
    )


def sigma_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_sigma: int = 3,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Rows more than ``n_sigma`` standard deviations from their
    group mean — decided entirely in exact integer arithmetic.

    Float ``stddev`` is partial-aggregation-order-dependent, so a row
    sitting exactly at the boundary could flip across runs/engines.
    Instead the test |x-mu| > n*sigma is cross-multiplied into integers
    over cents-encoded values (s = sum, q = sum of squares, n = count):

        (n*x - s)^2  >  k^2 * (n*q - s^2)

    Both sides are exact DECIMAL(38,0) products of int64 sums —
    associative, engine-independent, no epsilon.  Plan: one hash
    aggregate for the per-group moments (tiny result), broadcast back
    onto the rows — no window over the full table, so a hot group
    costs a broadcast-join scan, not a single-task sort.
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    rows = df.withColumn("_xc", cents)
    # sums go straight to decimal(38,0): sum(int64) of squared cents
    # overflows int64 near 10^12 rows; decimal holds to ~10^38 (past
    # that Spark yields null and rows drop — pre-aggregate per group
    # or rescale cents if a corpus ever gets there)
    moments = (
        rows.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_xc").cast("decimal(38,0)")).alias("_s"),
            F.sum((F.col("_xc") * F.col("_xc")).cast("decimal(38,0)")).alias("_q"),
        )
    )
    j = rows.join(F.broadcast(moments), list(group_cols), "inner")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    lhs_root = dec("_n") * F.col("_xc").cast("decimal(38,0)") - dec("_s")
    lhs = lhs_root * lhs_root
    rhs = F.lit(n_sigma * n_sigma).cast("decimal(38,0)") * (
        dec("_n") * dec("_q") - dec("_s") * dec("_s")
    )
    return j.filter(lhs > rhs).select(
        *id_cols, *group_cols, F.col(value_col)
    )


def gini_impurity(
    df: DataFrame,
    group_cols: Sequence[str],
    cat_col: str,
    categories: Sequence[str],
) -> DataFrame:
    """Per-group Gini impurity of a categorical column,
    ``1 - sum((n_i / N)^2)`` over a FIXED category list.

    Concentration metrics usually mean entropy, but ``ln`` is not
    correctly rounded and differs in the last ulp between libm and the
    JVM — poison for cross-engine value hashes.  Gini is division,
    multiplication and a fixed-order sum: every step IEEE-identical on
    identical inputs.  The pivot to fixed category columns is one
    map-side-combinable hash aggregate (conditional counts), and the
    impurity is a scalar expression over the counts — the shuffle
    carries |groups| rows of |categories| longs.
    """
    counts = [
        F.sum(
            F.when(F.col(cat_col) == c, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"_n_{i}")
        for i, c in enumerate(categories)
    ]
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"), *counts
    )
    total = F.col("n_rows").cast("double")
    # left-to-right sum: the expression tree fixes the addition order,
    # so both engines fold the same way
    acc = F.lit(0.0)
    for i in range(len(categories)):
        p = F.col(f"_n_{i}").cast("double") / total
        acc = acc + p * p
    return g.select(
        *group_cols, "n_rows", (F.lit(1.0) - acc).alias("gini")
    )


def mannwhitney_one_vs_rest(
    d: DataFrame, key: str = "event_type", value: str = "cents"
) -> DataFrame:
    """One-vs-rest Mann-Whitney U per key over integer measures, in
    EXACT doubled-rank arithmetic (see registry_r6 agg_mannwhitney for
    the oracle restatement and the derivation).

    Scale shape: the pooled ranking is a cumulative count over the
    DISTINCT value frequency table — bounded by the number of distinct
    measures, never a row-level global sort — joined back on the value
    and folded per key with ordinary partial aggregation.
    """
    freq = d.groupBy(value).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(value).rowsBetween(Window.unboundedPreceding, -1)
    ranked = freq.select(
        value,
        "cnt",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("rmin"),
    )
    return (
        d.join(ranked, value)
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.lit(2) * F.col("rmin") + F.col("cnt") - 1).alias("r_x2"),
        )
        .select(
            key,
            "n_days",
            (F.col("r_x2") - F.col("n_days") * (F.col("n_days") + 1))
            .cast("long")
            .alias("u_x2"),
        )
        .orderBy(key)
    )


#: shared Spark-SQL/DuckDB Welch-t expression strings — parity by
#: construction (registry_r6 agg_ttest_welch embeds the same strings
#: in the oracle).  b1/b2 arrive as DECIMAL(38,0) power sums (a
#: BIGINT Σx² wraps past ~sf10 daily magnitudes — the spearman/
#: agg_autocorr lesson) and the cross-products stay DECIMAL(38,0)
#: (both engines keep that exact: no double cancellation before the
#: single rounding cast).
WELCH_MEAN_SQL = (
    "CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE)"
)
WELCH_T_SQL = (
    f"({WELCH_MEAN_SQL}) / sqrt("
    "CAST(CAST(n1 AS DECIMAL(38,0)) * b1 - CAST(a1 AS DECIMAL(38,0)) * a1"
    " AS DOUBLE) / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " + CAST(CAST(n2 AS DECIMAL(38,0)) * b2 - CAST(a2 AS DECIMAL(38,0)) * a2"
    " AS DOUBLE) / CAST(n2 * (n2 - 1) AS DOUBLE) / CAST(n2 AS DOUBLE))"
)
#: zero-variance-on-both-sides guard: sqrt(v1/n1 + v2/n2) = 0 exactly
#: when both n·Σx² − (Σx)² vanish (each is ≥ 0 by Cauchy–Schwarz);
#: dividing by that zero is engine-DIVERGENT (Spark ANSI vs DuckDB
#: NULL), so the degenerate rows are filtered identically on both
#: engines instead of published
WELCH_NONDEGENERATE_SQL = (
    "(CAST(n1 AS DECIMAL(38,0)) * b1 - CAST(a1 AS DECIMAL(38,0)) * a1 > 0"
    " OR CAST(n2 AS DECIMAL(38,0)) * b2 - CAST(a2 AS DECIMAL(38,0)) * a2 > 0)"
)


def welch_ttest_one_vs_rest(
    d: DataFrame, key: str = "event_type", value: str = "cents"
) -> DataFrame:
    """Welch's unequal-variance t per key vs the pooled rest, from
    associative integer power sums; complement sums derive by
    subtraction from one broadcast one-row total, so k tests cost one
    pass.  Requires n >= 2 on both sides; keys whose BOTH sides are
    constant series (zero pooled variance → t undefined) are dropped,
    identically on both engines."""
    dec = F.col(value).cast("decimal(38,0)")
    s = d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum(value).cast("long").alias("a1"),
        F.sum(dec * dec).cast("decimal(38,0)").alias("b1"),
    )
    t = s.agg(
        F.sum("n1").cast("long").alias("nn"),
        F.sum("a1").cast("long").alias("aa"),
        F.sum("b1").cast("decimal(38,0)").alias("bb"),
    )
    x = (
        s.crossJoin(F.broadcast(t))
        .select(
            key, "n1", "a1", "b1",
            (F.col("nn") - F.col("n1")).alias("n2"),
            (F.col("aa") - F.col("a1")).alias("a2"),
            (F.col("bb") - F.col("b1")).cast("decimal(38,0)").alias("b2"),
        )
        .filter(
            (F.col("n1") >= 2)
            & (F.col("n2") >= 2)
            & F.expr(WELCH_NONDEGENERATE_SQL)
        )
    )
    return x.select(
        key,
        "n1",
        "n2",
        F.expr(WELCH_MEAN_SQL).alias("mean_diff_cents"),
        F.expr(WELCH_T_SQL).alias("t_welch"),
    ).orderBy(key)
