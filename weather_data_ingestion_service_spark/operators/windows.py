"""Window functions & time bucketing (SURVEY.md §2.E).

The reference's ``granularity`` parameter (15 / 60 / ≥1440,
reference server.py:213-225) dispatches which resolution of the same
series the API materializes; natively that is tumbling-window
bucketing.  Ranking / lag / moving averages are the feature-engineering
substrate the reference's README promises downstream ML pipelines
(reference README.md:18).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: reference granularity param → Spark window duration
GRANULARITY_DURATIONS = {15: "15 minutes", 60: "1 hour", 1440: "1 day"}


def time_bucket(
    df: DataFrame, ts_col: str, duration: str, alias: str = "bucket_start"
) -> DataFrame:
    """Tumbling bucket; emits the window start as ``alias``.

    ``window()`` is a scalar projection (no shuffle by itself); the
    shuffle happens only in the downstream groupBy, keyed by bucket —
    which at 100 TB is what you want: pre-partitioning the layout by
    ``date(ts)`` makes daily buckets align with partition boundaries.
    """
    return df.withColumn(alias, F.window(F.col(ts_col), duration)["start"])


def _ordered_window(keys: Sequence[str], order_by: Sequence[Column | str]):
    return Window.partitionBy(*keys).orderBy(*order_by)


def rank_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    rank_alias: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """row_number / rank / dense_rank over a per-key ordering.

    Callers must make ``order_by`` a total order (tie-break on a unique
    id) or row_number is nondeterministic across runs/engines.
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(rank_alias, fn().over(_ordered_window(keys, order_by)))


def lag_delta(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
    alias: str = "delta",
) -> DataFrame:
    """Hour-over-hour style delta: ``col - lag(col)`` per key."""
    w = _ordered_window(keys, order_by)
    return df.withColumn(alias, F.col(col) - F.lag(col).over(w))


def moving_avg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
    preceding: int,
    alias: str = "moving_avg",
) -> DataFrame:
    """Trailing moving average over ``preceding`` prior rows + current."""
    w = _ordered_window(keys, order_by).rowsBetween(-preceding, 0)
    return df.withColumn(alias, F.avg(col).over(w))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
    alias: str = "session_no",
) -> DataFrame:
    """Gap-based sessionization: per key, a new session starts when the
    time since the previous event exceeds ``gap_seconds``; rows get the
    1-based running session number.

    The batch twin of a session window (cf. streaming
    ``F.session_window``): lag + running sum over one per-key window —
    a single shuffle, deterministic given a total order (``tiebreak``
    columns break equal timestamps; pass one to make results
    hash-stable across engines).
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev))
           > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(alias, F.sum(is_new).over(run))


def coalesce_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    count_alias: str = "n_merged",
) -> DataFrame:
    """Merge overlapping/touching ``[start, end]`` intervals per key
    into their connected unions (the classic gaps-and-islands pass).

    A new island starts where ``start`` exceeds the running max of all
    earlier ``end``s; the island id is the running count of such
    starts.  Both passes share ONE per-key ordered window (single
    shuffle), then a hash aggregate keyed by (key, island) emits
    ``min(start) / max(end) / count``.  Scale posture: per-key data
    only — no global sort; a hot key serializes one task, the same
    boundary-chunking remedy as asof_join_chunked applies.
    """
    order = [F.col(start_col), F.col(end_col)]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = df.withColumn("_island", F.sum(is_new).over(run))
    return (
        islands.groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias(count_alias),
        )
        .drop("_island")
    )


def scd2_compress(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Compress a change log into SCD-2 validity intervals: one row
    per *value change* with ``[valid_from, valid_to)`` coverage, the
    live row carrying a null ``valid_to``.

    Two passes over ONE per-key ordering (single shuffle): a lag pass
    keeps only rows whose value differs from the previous one (runs of
    identical values collapse into their first row), then a lead pass
    over the survivors stamps each interval's end with the next
    change's timestamp.  Null values participate: null→x and x→null
    are changes (null-safe inequality), matching warehouse SCD-2
    semantics.  Skew posture: per-key windows — a hot key serializes,
    same chunking remedy as asof_join_chunked if one ever dominates.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value_col).over(w)
    prev_exists = F.lag(F.lit(1)).over(w)
    changed = prev_exists.isNull() | ~F.col(value_col).eqNullSafe(prev)
    compressed = df.withColumn("_chg", changed).filter("_chg").drop("_chg")
    return (
        compressed.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w))
    )


def gap_islands(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_micros: int,
) -> DataFrame:
    """Gaps-and-islands: split each key's event stream into maximal
    runs ("islands") where consecutive events are ≤ ``gap_micros``
    apart — the sensor-outage / coverage-hole report for an ingested
    time series (which stretches of the feed arrived contiguously, and
    where the gaps are).

    Exactly one shuffle on the key: a lag pass flags island breaks
    (time delta in INTEGER microseconds — exact in any engine), a
    running sum numbers the islands, and a map-side-combinable agg
    emits each island's span.  Per-key windows — a hot key serializes;
    chunk like ``asof_join_chunked`` if one ever dominates.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    brk = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev_us > gap_micros),
        1,
    ).otherwise(0)
    islands = df.withColumn("__brk", brk).withColumn(
        "island",
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return islands.groupBy(key_col, "island").agg(
        F.min(ts_col).alias("island_start"),
        F.max(ts_col).alias("island_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def conversion_funnel(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage *i* iff they
    performed ``stages[i]`` strictly AFTER their stage-*i−1* entry time
    (``min`` of qualifying events).  Output is one row per stage,
    ``(stage, n_users)`` with stages labeled ``1_<name>``…

    Scale shape: each stage is the previous stage's (user, t) cohort
    narrowed by a min-aggregate — every join is an equi-join on the
    user key against an already-aggregated (one row per user) table,
    never events × events.  The per-stage cohorts broadcast while they
    fit; past that, their aggregate output partitioning feeds the next
    sort-merge join side."""
    if not stages:
        raise ValueError("conversion_funnel needs at least one stage")
    cohorts = []
    prev = None
    for stage_type in stages:
        cur = df.filter(F.col(type_col) == stage_type)
        if prev is not None:
            cur = cur.join(prev, user_col).filter(
                F.col(ts_col) > F.col("__stage_t")
            )
        cur = cur.groupBy(user_col).agg(F.min(ts_col).alias("__stage_t"))
        cohorts.append(cur)
        prev = cur

    def _count(c: DataFrame, label: str) -> DataFrame:
        return c.agg(
            F.lit(label).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    out = _count(cohorts[0], f"1_{stages[0]}")
    for i, c in enumerate(cohorts[1:], start=2):
        out = out.unionByName(_count(c, f"{i}_{stages[i - 1]}"))
    return out


def day_streaks(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands date variant: ``day − row_number`` is constant
    within a run of consecutive days.  One window + two hash
    aggregations, all partitioned by the user key, so one exchange
    feeds everything.  Output: ``(user_col, longest_streak,
    n_active_days)``."""
    d = df.select(user_col, F.to_date(ts_col).alias("__day")).distinct()
    w = Window.partitionBy(user_col).orderBy("__day")
    i = d.select(
        user_col,
        F.date_sub("__day", F.row_number().over(w)).alias("__grp"),
    )
    s = i.groupBy(user_col, "__grp").agg(
        F.count(F.lit(1)).cast("long").alias("__len")
    )
    return s.groupBy(user_col).agg(
        F.max("__len").cast("long").alias("longest_streak"),
        F.sum("__len").cast("long").alias("n_active_days"),
    )
