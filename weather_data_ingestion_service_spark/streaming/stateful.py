"""Custom stateful streaming operators (SURVEY.md §7 custom op (c)).

Two production shapes for the reference's forecast-revision semantics
(server.py:304: a re-fetch of the same (location, ts) supersedes the
earlier value):

- ``latest_per_key_stateful`` — ``applyInPandasWithState``: per-key
  state holds the latest (event-time, payload) seen; each micro-batch
  emits only keys whose value actually changed.  True engine-managed
  state (checkpointed, recoverable), Arrow-batched per group.
- ``merge_upsert_sink`` — ``foreachBatch`` MERGE emulation against a
  parquet target (read target ∪ prefer-new ∪ overwrite).  On a real
  deployment the body becomes one ``MERGE INTO`` against
  Delta/Iceberg; the batch-function shape is identical, which is the
  point of ``foreachBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output of the keep-latest operator: key, latest event time, value
LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

#: state: latest event-time micros + value
_STATE_SCHEMA = T.StructType(
    [T.StructField("ts_micros", T.LongType()), T.StructField("value", T.DoubleType())]
)


def _latest_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one key into (max ts, its value),
    merge with prior state, emit only on change."""
    best_ts: int | None = None
    best_val: float | None = None
    if state.exists:
        best_ts, best_val = state.get
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        idx = pdf["ts"].idxmax()
        ts_micros = int(pdf["ts"][idx].value // 1000)  # ns → µs
        if best_ts is None or ts_micros >= best_ts:
            best_ts = ts_micros
            best_val = float(pdf["value"][idx])
            changed = True
    if changed:
        state.update((best_ts, best_val))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "ts": [pd.Timestamp(best_ts, unit="us")],
                "value": [best_val],
            }
        )


def latest_per_key_stateful(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "4 days",
) -> DataFrame:
    """Keep-latest-per-key over a stream with managed state.

    Unlike ``dropDuplicates`` (which can only suppress exact
    re-deliveries), this implements true supersedence — a later
    event-time revision replaces the stored value and re-emits, and
    the engine checkpoints/restores the state across restarts.  The
    watermark bounds how long a key's state must wait for stragglers.
    """
    src = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ).withWatermark("ts", watermark)
    return src.groupBy("key").applyInPandasWithState(
        _latest_fn,
        LATEST_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def merge_upsert_sink(
    stream_df: DataFrame,
    target_dir: str,
    keys: list[str],
    order_col: str,
):
    """``foreachBatch`` MERGE-style upsert into a parquet target.

    Each micro-batch: dedup the batch per key (latest ``order_col``
    wins), union with the current target, keep the max-order row per
    key, write.  Exactly the read-merge-write a ``MERGE INTO``
    performs, minus the transaction log — swap the body for
    Delta/Iceberg MERGE in production.  Returns the started
    StreamingQuery.

    Durability shape: the "no target yet" branch is taken ONLY when
    the target path genuinely does not exist (checked through the
    Hadoop FileSystem, so it holds for any supported storage scheme) —
    a transient read failure on an EXISTING target propagates instead
    of silently replacing history with the current micro-batch.  The
    merged result is fully staged to a sibling temp dir while the
    target is still intact, then swapped in (delete + rename), so the
    overwrite never recomputes from a target it is truncating.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(FF.col(order_col).desc())
        latest = (
            batch_df.withColumn("__rn", FF.row_number().over(w))
            .filter(FF.col("__rn") == 1)
            .drop("__rn")
        )
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        target_path = jvm.org.apache.hadoop.fs.Path(target_dir)
        fs = target_path.getFileSystem(hconf)
        if fs.exists(target_path):
            current = spark.read.parquet(target_dir)
            # MERGE WHEN MATCHED AND source.order >= target.order:
            # union then keep the max-order row per key, so an
            # out-of-order (late) batch cannot clobber newer data
            both = current.unionByName(latest)
            w2 = Window.partitionBy(*keys).orderBy(FF.col(order_col).desc())
            merged = (
                both.withColumn("__rn", FF.row_number().over(w2))
                .filter(FF.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            merged = latest  # first batch: no target yet
        # stage-then-swap — parquet has no MERGE transaction; the full
        # merged result lands in a temp dir while the target is intact,
        # then replaces it (prod: Delta MERGE INTO inside this hook)
        staging_dir = f"{target_dir.rstrip('/')}__staging_{epoch_id}"
        staging_path = jvm.org.apache.hadoop.fs.Path(staging_dir)
        merged.write.mode("overwrite").parquet(staging_dir)
        if fs.exists(target_path):
            fs.delete(target_path, True)
        fs.rename(staging_path, target_path)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


#: output of the stateful sessionizer: one row per CLOSED session
SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: state: open session (start µs, last-event µs, event count)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessions_stateful(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "4 days",
) -> DataFrame:
    """Gap-based sessionization over a stream with managed per-key
    state — the custom-stateful twin of ``operators.windows.sessionize``
    (and of ``session_window``, which can only aggregate; this shape
    can carry arbitrary per-session state).

    Per key the state holds the OPEN session (start, last-event, n);
    each micro-batch folds its rows in event-time order, emitting a
    row per session it CLOSES (gap exceeded).  The tail session stays
    in state — it is unknowable whether more events follow — so the
    stream emits exactly the closed prefix of the batch twin's
    sessions.  Caveat shared by every low-latency sessionizer: an
    event arriving AFTER a later event already closed its session
    (out-of-order across micro-batches, within the watermark) starts
    a fresh session rather than reopening the closed one; buffering
    until the watermark (EventTimeTimeout) trades latency for that
    exactness and keeps the same state shape.
    """
    gap_us = gap_seconds * 1_000_000

    def session_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        batch = pd.concat(frames, ignore_index=True)
        ts_us = sorted(int(v.value // 1000) for v in batch["ts"])
        start = last = n = None
        if state.exists:
            start, last, n = state.get
        closed = []
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                # a late-but-mergeable event can precede the open
                # session's start — absorb it into the interval, not
                # just the count, so emitted sessions stay consistent
                start, last, n = min(start, t), max(last, t), n + 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    src = events.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    return src.groupBy("key").applyInPandasWithState(
        session_fn,
        SESSION_OUTPUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


#: state of the watermark-buffered sessionizer: every buffered event
#: timestamp (µs) still inside an OPEN (un-emittable) session
_BUFFER_STATE_SCHEMA = T.StructType(
    [T.StructField("ts_us", T.ArrayType(T.LongType()))]
)


def sessions_buffered(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "4 days",
) -> DataFrame:
    """Watermark-buffered gap sessionization — the EXACT variant of
    ``sessions_stateful``, closing its documented caveat: the eager
    sessionizer closes a session the moment a later event exceeds the
    gap, so an out-of-order event arriving in a LATER micro-batch
    (within the watermark) starts a spurious fresh session instead of
    merging.  This operator buffers raw event timestamps in state and
    only emits a session once the WATERMARK passes its close time
    (last event + gap) — beyond that point Spark's watermark filter
    guarantees no event that could extend or merge into it can ever
    arrive, so emitted sessions are exactly the batch gap-islands
    regardless of arrival order.  The price is state: buffered events
    of OPEN sessions per key (bounded by the watermark horizon ×
    event rate), vs one open-session triple for the eager variant —
    the classic latency/exactness/state triangle, all three corners
    now implemented (``session_window`` append, eager stateful,
    buffered stateful).

    Emission boundary (pytest-pinned): a session emits when
    ``watermark_ms > last_ms + gap`` STRICTLY — both for keys with
    fresh input (``getCurrentWatermarkMs``) and for silent keys via
    ``EventTimeTimeout`` set at the earliest open close-time (Spark
    fires timeouts when the watermark advances beyond the set
    timestamp).
    """
    gap_us = gap_seconds * 1_000_000

    def session_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        buf: list[int] = []
        if state.exists:
            (stored,) = state.get
            buf = list(stored)
        if not state.hasTimedOut:
            for p in pdfs:
                if not p.empty:
                    buf.extend(int(v.value // 1000) for v in p["ts"])
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        # islands over the buffer; emit every island whose close time
        # the watermark has strictly passed, keep the rest buffered
        closed: list[tuple[int, int, int]] = []
        kept: list[int] = []
        first_open_close: int | None = None  # close time of 1st open island
        island: list[int] = []

        def settle(isl: list[int]) -> None:
            nonlocal first_open_close
            if isl[-1] + gap_us < wm_us:
                closed.append((isl[0], isl[-1], len(isl)))
            else:
                if first_open_close is None:
                    first_open_close = isl[-1] + gap_us
                kept.extend(isl)

        for t in buf:
            if island and t - island[-1] > gap_us:
                settle(island)
                island = [t]
            else:
                island.append(t)
        if island:
            settle(island)
        if kept:
            state.update((kept,))
            # wake up when the earliest open session becomes emittable:
            # its CLOSE time (last event + gap — arming at first event
            # + gap would fire a spurious full-buffer pass per batch
            # for every long-running open session)
            first_close_ms = first_open_close // 1000
            state.setTimeoutTimestamp(max(first_close_ms, wm_us // 1000 + 1))
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                }
            )

    src = events.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    return src.groupBy("key").applyInPandasWithState(
        session_fn,
        SESSION_OUTPUT_SCHEMA,
        _BUFFER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _half_up_cents(values: "pd.Series") -> int:
    """Exact-parity cents fold: sum of ROUND_HALF_UP(value*100) as int.

    pandas' ``Series.round`` is round-half-to-EVEN (0.125*100=12.5 → 12)
    while Spark's ``F.round`` — the registry ``_cents`` convention — is
    HALF_UP away from zero (12.5 → 13, −12.5 → −13); folding state with
    the pandas default silently diverges from the batch GROUP BY this
    processor promises to equal (ADVICE r5).  ``sign·floor(|v·100|+0.5)``
    is HALF_UP for both signs.
    """
    import numpy as np

    scaled = values.to_numpy(dtype="float64") * 100.0
    return int(
        (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype("int64").sum()
    )


def running_totals_tws(src: DataFrame) -> DataFrame:
    """Per-user running totals via Spark 4's ``transformWithState``
    (the ``StatefulProcessor`` API that replaces the
    ``applyInPandasWithState`` callback style): engine-managed
    ``ValueState`` holds (n, cents) per user, each micro-batch folds
    its rows into the state and emits the updated totals.

    Spark-4 notes: ``transformWithStateInPandas`` requires the RocksDB
    state-store provider (the HDFS-backed default raises
    STATE_STORE_UNSUPPORTED_OPERATION) — the CALLER sets
    ``spark.sql.streaming.stateStore.providerClass``; this module only
    declares the processor.  Cents are folded as exact integers, so
    with an ``availableNow`` run over a finite source the output
    equals the batch GROUP BY exactly.

    ENVIRONMENT GATE: executing this operator needs the
    ``google.protobuf`` runtime (the TWS state-server wire protocol);
    this container ships a broken protobuf, so the execution test
    SKIPS here (tests/test_streaming.py marks the reason) while plan
    construction stays covered.  ``latest_per_key_stateful``
    (applyInPandasWithState) is the executable stateful path in this
    environment.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = 0, 0
            if self._totals.exists():
                prev = self._totals.get()
                n, cents = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                cents += _half_up_cents(pdf["value"])
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "cents_sum": [cents],
                }
            )

        def close(self) -> None:
            pass

    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id BIGINT, n_events BIGINT, cents_sum BIGINT",
        outputMode="Update",
        timeMode="None",
    )
