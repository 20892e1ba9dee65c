"""Joins (SURVEY.md §2.C): broadcast dim lookup, range join, as-of join.

Equi joins need no wrapper (``df.join`` + Catalyst/AQE strategy choice
is already the right engine); this module holds the joins that need a
deliberate physical shape at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def geocode_lookup(
    df: DataFrame,
    geo_dim: DataFrame,
    on: str = "place",
    how: str = "left",
) -> DataFrame:
    """Place → coordinates via a broadcast dimension join.

    The reference geocodes each place with a remote Nominatim point
    lookup, rate-limited to ~0.9 q/s with no caching
    (reference server.py:96-119, 108).  The Spark-native restatement is
    a **broadcast hash join** against a small geo dimension: no
    shuffle of the fact side, no per-row network call, and unresolved
    places surface as NULL coordinates (the reference's error-value,
    server.py:112-114) instead of exceptions.
    """
    return df.join(F.broadcast(geo_dim), on=on, how=how)


def normalize_place_key(c: Column | str) -> Column:
    """Canonical join key for free-text place names: lowercase, strip
    punctuation to spaces, collapse runs of spaces, trim.

    'PRAGUE, CZ', '  prague cz ' and 'Prague,CZ' all map to
    'prague cz' — the cheap engine-side analog of the reference's
    Nominatim free-text tolerance (server.py:96-119).  Restricted to
    ASCII classes (``[^a-z0-9 ]`` / ``' +'``) so the identical pattern
    behaves identically under Java regex and RE2."""
    c = F.col(c) if isinstance(c, str) else c
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(c, " +", " "))


def geocode_lookup_fuzzy(
    df: DataFrame,
    geo_dim: DataFrame,
    query_col: str = "place",
    dim_col: str = "place",
    how: str = "left",
) -> DataFrame:
    """Free-text place → coordinates: broadcast join on the NORMALIZED
    key instead of exact string equality, so case / punctuation /
    spacing variants (a user's first "paris,  france") still resolve.

    Alias tolerance is data, not code: hand an alias-expanded dimension
    (one row per accepted name, e.g. ``fixtures.geo_alias_dim``) and
    every alias resolves to its canonical place.  Same physical shape
    as :func:`geocode_lookup` — broadcast hash join, no shuffle of the
    fact side; the normalization is a narrow projection on both sides.
    """
    dim = geo_dim.withColumn("__geo_key", normalize_place_key(dim_col))
    fact = df.withColumn("__geo_key", normalize_place_key(query_col))
    out = fact.join(F.broadcast(dim), on="__geo_key", how=how)
    return out.drop("__geo_key")


def nearest_gridpoint_join(
    facts: DataFrame,
    grid: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    grid_lat: str = "latitude",
    grid_lon: str = "longitude",
) -> DataFrame:
    """Snap every fact coordinate to its nearest grid point — the
    reference API's grid-point snap (forecasts come from the nearest
    model grid node, WetIng.pdf p.1-2; the engine's lat/lon resolution
    does the same per request at api/wrappers._resolve_location).

    Distance is squared degree distance — subtraction/multiply/add on
    identical doubles, bit-exact in any engine.  Physical shape:
    broadcast the grid (model grids are ≤ millions of rows; here a
    dim), nested-loop against facts, then a map-side-combinable
    ``min(struct(d2, tiebreak…))`` argmin — NO per-fact window sort, so
    the only wide exchange is the final hash-agg on the fact key.
    Ties break on the grid name, deterministically.

    Row-multiplicity is preserved: the argmin groups on a per-row tag
    (``monotonically_increasing_id``), not the fact columns, so fully
    duplicated fact rows each keep their own output row (the ADVICE
    r03 finding).
    """
    g = F.broadcast(grid)
    dlat = F.col(lat_col) - F.col(grid_lat)
    dlon = F.col(lon_col) - F.col(grid_lon)
    # explicit multiply, not **2: pow() has no cross-engine rounding
    # guarantee; x*x does
    d2 = dlat * dlat + dlon * dlon
    other = [c for c in grid.columns if c not in (grid_lat, grid_lon)]
    fact_cols = facts.columns
    tagged = facts.withColumn("__rid", F.monotonically_increasing_id())
    paired = tagged.crossJoin(g).withColumn("__d2", d2)
    best = paired.groupBy("__rid", *fact_cols).agg(
        F.min(
            F.struct(F.col("__d2"), *[F.col(c) for c in other],
                     F.col(grid_lat), F.col(grid_lon))
        ).alias("__best")
    )
    sel = [F.col(f"__best.{c}").alias(c) for c in other]
    return best.select(
        *fact_cols,
        *sel,
        F.col("__best.__d2").alias("snap_d2"),
    )


def range_interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: Column,
    lo_col: Column,
    hi_col: Column,
    extra: Column | None = None,
) -> DataFrame:
    """θ-join on ``lo <= ts < hi``.

    Catalyst plans this as broadcast-nested-loop when one side is
    small.  At 100 TB both sides are large: bucket the timestamp to the
    interval granularity and equi-join on the bucket first (making it
    shuffle-hash + residual filter) — see ``bucketed_range_join``.
    """
    cond = (ts_col >= lo_col) & (ts_col < hi_col)
    if extra is not None:
        cond = cond & extra
    return left.join(right, cond)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket_days: int = 7,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Scale path for the interval join: equi-join on coarse time
    buckets (right intervals exploded over the buckets they overlap),
    then the exact residual predicate.  Turns an O(n·m) nested loop
    into a shuffle-hash join on ``(bucket, *keys)``.
    """
    step = bucket_days * 86400
    lb = left.withColumn("__bucket", (F.unix_timestamp(F.col(left_ts)) / step).cast("long"))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_lo)) / step).cast("long"),
                (F.unix_timestamp(F.col(right_hi)) / step).cast("long"),
            )
        ),
    )
    on = ["__bucket", *keys]
    return (
        lb.join(rb, on=on)
        .filter((F.col(left_ts) >= F.col(right_lo)) & (F.col(left_ts) < F.col(right_hi)))
        .drop("__bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` per join key (``direction='backward'``,
    the default), or the EARLIEST right row with ``right.ts >=
    left.ts`` (``direction='forward'`` — the "next scheduled reading"
    lookup).  Forward is the exact mirror: the same union + one-pass
    fold traversed in descending time, so the plan shape (one shuffle
    on the key, no Python) is identical.

    Semantic analog of Open-Meteo snapping a coordinate to the nearest
    model grid point (reference WetIng.pdf p.1-2; no reference code —
    the behavior lives server-side).  Spark has no as-of builtin, so:
    union both sides tagged, then ``last(payload, ignorenulls=True)``
    over a per-key time-ordered window — one shuffle on the key, no
    row-at-a-time Python, exact semantics (DuckDB ``ASOF JOIN`` is the
    oracle).

    Right side must be unique per ``(on, right_ts)``; pre-aggregate
    otherwise (ties would be nondeterministic).  At equal timestamps
    the right row is visible to the left row (``<=`` inclusive).
    """
    on = list(on)
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__probe"),
        payload_struct.alias("__payload"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # align columns: right rows carry NULL for left payload columns
    for c in left_cols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l.columns)

    # __probe sorts right rows (0) before left rows (1) at equal __t,
    # making the join inclusive of right.ts == left.ts.  Forward
    # direction traverses time descending — "last right row seen" then
    # means the earliest right.ts >= left.ts.
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, "__probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).withColumn(
        "__filled", F.last("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__probe") == 1).select(
        *left_cols, *[F.col("__filled")[c].alias(c) for c in payload_cols]
    )
    if how == "inner":
        out = out.na.drop(subset=[payload_cols[0]])
    return out


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    how: str = "left",
    chunk: str = "1 day",
) -> DataFrame:
    """Skew-safe backward as-of join — same semantics as ``asof_join``
    with the per-key window split over time chunks.

    ``asof_join``'s window partitions by the join key alone, so one
    hot key serializes into a single task (the watch item at 100×: a
    station reporting 1000× more often than the rest).  Here each
    key's timeline is cut into ``chunk``-sized pieces and the window
    partitions by ``(key, chunk)`` — the hot key's rows spread over
    ``timespan / chunk`` tasks.

    Exactness is preserved with a boundary carry-in: a left row early
    in a chunk may need a right row from an earlier chunk, so per
    (key, chunk) the latest right payload is pre-aggregated
    (``max_by`` — one map-side-combinable hash agg), a per-key running
    ``last`` over those *chunk summaries* (a window over #chunks rows
    per key, thousands at most — never the raw rows) yields each
    chunk's carry-in, and the carry-in is injected as a synthetic
    right row sorting before everything in its chunk.  Each (key,
    chunk) task then sees exactly the state a full-timeline scan would
    have reached.

    Pick ``chunk`` so a hot key's densest chunk fits a task (e.g. 1
    day of a 1 Hz feed ≈ 86k rows); the default suits the test data.
    ``asof_join`` stays the right default for roughly uniform keys —
    this variant costs one extra aggregation + small window + union.
    """
    on = list(on)
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])

    lc = left.withColumn("__chunk", F.window(F.col(left_ts), chunk)["start"])
    rc = right.withColumn("__chunk", F.window(F.col(right_ts), chunk)["start"])

    # latest right payload per (key, chunk): map-side combinable
    summary = rc.groupBy(*on, "__chunk").agg(
        F.max_by(payload_struct, F.col(right_ts)).alias("__last")
    )
    # every (key, chunk) either side touches needs a carry-in
    chunks = (
        lc.select(*on, "__chunk").union(rc.select(*on, "__chunk")).distinct()
    )
    wprev = (
        Window.partitionBy(*on)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        chunks.join(summary, on + ["__chunk"], "left")
        .withColumn("__carry", F.last("__last", ignorenulls=True).over(wprev))
        .filter(F.col("__carry").isNotNull())
        .select(*on, "__chunk", F.col("__carry").alias("__payload"))
    )

    r = rc.select(
        *on,
        "__chunk",
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__probe"),
        payload_struct.alias("__payload"),
    )
    # synthetic carry rows sort before every real row of their chunk:
    # __t = chunk start <= all chunk timestamps, __probe = -1 breaks
    # the tie against a real right row at exactly the chunk start
    # (which is newer than any carried-over payload and must win)
    carry_rows = carry.select(
        *on,
        "__chunk",
        F.col("__chunk").alias("__t"),
        F.lit(-1).alias("__probe"),
        "__payload",
    )
    left_cols = list(left.columns)
    l = lc.select(
        *[F.col(c) for c in left_cols],
        "__chunk",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    for c in left_cols:
        if c not in on:
            typ = dict(left.dtypes)[c]
            r = r.withColumn(c, F.lit(None).cast(typ))
            carry_rows = carry_rows.withColumn(c, F.lit(None).cast(typ))
    r = r.select(*l.columns)
    carry_rows = carry_rows.select(*l.columns)

    w = (
        Window.partitionBy(*on, "__chunk")
        .orderBy("__t", "__probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r)
        .unionByName(carry_rows)
        .withColumn("__filled", F.last("__payload", ignorenulls=True).over(w))
    )
    out = filled.filter(F.col("__probe") == 1).select(
        *left_cols, *[F.col("__filled")[c].alias(c) for c in payload_cols]
    )
    if how == "inner":
        out = out.na.drop(subset=[payload_cols[0]])
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Absolute-nearest as-of join: for each left row, the right row
    minimizing ``|right_ts - left_ts|`` per key; ties break to the
    earlier (backward) row.

    This is the literal grid-snapping semantic (reference WetIng.pdf
    p.1-2: a coordinate snaps to the *nearest* model point, not the
    last one before it).  Same single-shuffle union+window shape as
    ``asof_join``, evaluating BOTH directions in one pass: backward =
    ``last(payload, ignorenulls)`` over the preceding frame, forward =
    ``first(payload, ignorenulls)`` over the following frame, then a
    branch-free comparison of the two time distances.  No join
    explosion, no per-row Python; DuckDB's two-directional ASOF JOIN
    is the oracle.
    """
    on = list(on)
    payload_struct = F.struct(
        F.col(right_ts).alias("__rt"), *[F.col(c) for c in payload_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__probe"),
        payload_struct.alias("__payload"),
    )
    left_cols = list(left.columns)
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    for c in left_cols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l.columns)

    wb = (
        Window.partitionBy(*on)
        .orderBy("__t", "__probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy("__t", "__probe")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = (
        l.unionByName(r)
        .withColumn("__back", F.last("__payload", ignorenulls=True).over(wb))
        .withColumn("__fwd", F.first("__payload", ignorenulls=True).over(wf))
    )
    t = F.unix_micros(F.col("__t"))
    back_dist = t - F.unix_micros(F.col("__back.__rt"))
    fwd_dist = F.unix_micros(F.col("__fwd.__rt")) - t
    chosen = (
        F.when(F.col("__back").isNull(), F.col("__fwd"))
        .when(F.col("__fwd").isNull(), F.col("__back"))
        .when(back_dist <= fwd_dist, F.col("__back"))
        .otherwise(F.col("__fwd"))
    )
    return (
        both.filter(F.col("__probe") == 1)
        .withColumn("__chosen", chosen)
        .select(
            *left_cols,
            *[F.col("__chosen")[c].alias(c) for c in payload_cols],
        )
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tolerance_seconds: int,
) -> DataFrame:
    """Backward as-of join with a staleness bound: the latest right row
    per key at or before the left timestamp, REJECTED (payload nulled)
    when it is older than ``tolerance_seconds`` — the standard "don't
    serve stale quotes" variant of as-of.

    Implementation rides ``asof_join`` (same single shuffle per side)
    with the matched right timestamp carried through the payload
    struct; the staleness test is one projection afterwards, so the
    plan shape and scale posture are identical to the unbounded
    as-of."""
    r2 = right.withColumn("__match_ts", F.col(right_ts))
    out = asof_join(
        left, r2, on, left_ts, right_ts, [*payload_cols, "__match_ts"]
    )
    fresh = F.col("__match_ts").isNotNull() & (
        F.col(left_ts).cast("long") - F.col("__match_ts").cast("long")
        <= F.lit(tolerance_seconds)
    )
    for c in payload_cols:
        out = out.withColumn(c, F.when(fresh, F.col(c)))
    return out.drop("__match_ts")
