"""Structured Streaming: the reference's ingestion cadence restated.

The reference's operational envelope (SURVEY.md §2.I): a 15-minute
source refresh (WetIng.pdf p.2), a ~4-day archive publication lag that
bounds how late data can arrive (WetIng.pdf p.2), and forecast
revisions that supersede earlier fetches of the same (location, ts)
(reference server.py:304).  Natively: ``readStream`` + processing-time
trigger, ``withWatermark("ts", "4 days")``, and keep-latest stateful
dedup.

Source throttling (the reference's 1.1 s geocode rate limit,
server.py:108) maps to ``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger``
— config on the source, not code.  Retry/backoff (server.py:68-93)
maps to Spark task retries + checkpointed recovery.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reference cadence: Open-Meteo refresh (WetIng.pdf p.2)
SOURCE_TRIGGER = "15 minutes"
#: reference archive publication lag → watermark horizon
LATE_HORIZON = "4 days"

#: events parquet carries TIMESTAMP(NANOS) → read ts as long, convert
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_events_source(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events table (the test harness's
    stand-in for a live feed; swap ``format``/path for Kafka in prod —
    the downstream plan is identical)."""
    reader = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        # source throttling — the rate-limit analog (server.py:108)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(sf_dir)
    # The batch reader (io.load_table, nanosAsLong) surfaces the NANOS
    # column as raw nanosecond longs, but the file-source streaming
    # reader converts to MICROSECONDS when the user schema declares
    # LongType — regardless of the nanos conf (verified empirically on
    # Spark 4.1: raw streamed max(ts) ≈ 1.7e15 for the 2024 fixture vs
    # 1.7e18 batch-side).  Normalize by magnitude so either unit maps
    # to micros: any epoch value > 5e17 (≈ 1985 in nanos, ≈ year 17k
    # in micros) must be nanoseconds.
    micros = F.when(
        F.col("ts") > F.lit(500_000_000_000_000_000), F.expr("ts div 1000")
    ).otherwise(F.col("ts"))
    return df.withColumn("ts", F.timestamp_micros(micros))


def streamed_daily_aggregate(
    events: DataFrame, watermark: str = LATE_HORIZON
) -> DataFrame:
    """Tumbling daily aggregate on a stream with the 4-day late-data
    watermark: the streaming twin of the batch daily families — same
    ``window(ts, '1 day')`` expression, plus bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day")["start"].alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
                "value_sum"
            ),
        )
    )


#: documents table schema for the file-source stream (plain types —
#: no NANOS normalization needed, unlike events)
DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def streaming_documents_source(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents table — the ingest feed
    for the streaming curation/dedup jobs."""
    reader = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(sf_dir)


def minhash_ingest_batch(spark, state_dir: str, pairs_dir: str):
    """foreachBatch handler factory for STREAMING incremental MinHash
    near-dup maintenance: per micro-batch, signature the new documents
    once, band-join them against (state ∪ new), and append the
    surviving pairs — a pair is emitted exactly once, in the batch
    where its LAST-arriving member lands (both-new pairs dedup within
    the batch; old×old pairs can never re-join because the probe side
    is new docs only).  Union over batches therefore equals the batch
    pairs op for ANY batching — the oracle-exactness argument — while
    per-batch work is |new| signatures + one band join against stored
    state, never a corpus rescan.  State is (doc_id, sig): 16 int64s
    per document.

    REPLAY-IDEMPOTENT: foreachBatch is at-least-once — after a crash
    the failed epoch re-runs — so both sinks write per-epoch
    ``epoch=N`` partitions in OVERWRITE mode (the stream_sketch_cms /
    curation-sink pattern): a replayed epoch rewrites its own
    partition instead of double-appending pairs and state.  Prior
    state for epoch N reads only partitions with epoch < N, which
    also keeps the "state excludes the current batch" invariant exact
    under replay."""
    from ..ext.dedup import (
        md5_minhash_bands,
        md5_minhash_estimate,
        md5_minhash_signatures,
    )

    def _prior_state(epoch_id):
        import glob
        import os

        parts = [
            p
            for p in glob.glob(os.path.join(state_dir, "epoch=*"))
            if int(p.rsplit("=", 1)[1]) < int(epoch_id)
        ]
        if not parts:
            return None
        return spark.read.parquet(*parts).select("doc_id", "sig")

    def handle(batch_df, epoch_id):
        new_sig = md5_minhash_signatures(
            batch_df.select("doc_id", "text"), "doc_id", "text"
        ).persist()
        all_sig = None
        try:
            state = _prior_state(epoch_id)
            all_sig = (
                state.unionByName(new_sig) if state is not None else new_sig
            ).persist()
            nb = md5_minhash_bands(new_sig, "doc_id").select(
                F.col("doc_id").alias("id_n"), "band", "key"
            )
            ab = md5_minhash_bands(all_sig, "doc_id").select(
                F.col("doc_id").alias("id_o"), "band", "key"
            )
            cand = (
                nb.join(ab, ["band", "key"])
                .filter(F.col("id_n") != F.col("id_o"))
                .select(
                    F.least("id_n", "id_o").alias("id_a"),
                    F.greatest("id_n", "id_o").alias("id_b"),
                )
                .dropDuplicates(["id_a", "id_b"])
            )
            md5_minhash_estimate(cand, all_sig, "doc_id").write.mode(
                "overwrite"
            ).parquet(f"{pairs_dir}/epoch={int(epoch_id)}")
            new_sig.write.mode("overwrite").parquet(
                f"{state_dir}/epoch={int(epoch_id)}"
            )
        finally:
            new_sig.unpersist()
            if all_sig is not None:
                all_sig.unpersist()

    return handle


def streamed_sliding_aggregate(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = LATE_HORIZON,
) -> DataFrame:
    """Sliding-window aggregate on a stream (every event lands in
    duration/slide overlapping windows); complete output mode makes
    the result equal the batch sliding aggregate, so the two share one
    oracle verbatim.  State is O(open windows), bounded by the
    watermark horizon × overlap factor."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide)["start"].alias("win_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
                "value_sum"
            ),
        )
    )


def streamed_session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = LATE_HORIZON,
) -> DataFrame:
    """Per-user session windows on a stream (``session_window`` — the
    merging-window stateful operator): a session closes when no event
    arrives for ``gap``, and append mode emits it exactly once, after
    the watermark passes its end (last event + gap).  State is one
    open session per active user, bounded by the watermark horizon —
    the 100 TB posture: state size tracks ACTIVE users, not history."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def keep_latest_upsert(
    events: DataFrame,
    keys: list[str],
    revision_col: str,
    watermark: str = LATE_HORIZON,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming keep-latest revision dedup: repeated fetches of the
    same key supersede earlier values (reference server.py:304).

    Within the watermark horizon, ``dropDuplicates`` on (key, revision)
    bounds state; exactly-once MERGE semantics at the sink belong in
    ``foreachBatch`` against a transactional target."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        [*keys, revision_col]
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
) -> DataFrame:
    """Execute a streaming plan to completion over all available input
    (``availableNow`` trigger) into a memory sink; return the result
    as a batch DataFrame.

    This is the test/driver harness path: a real deployment replaces
    the sink with ``writeStream.format("parquet"/"kafka")`` and drops
    ``availableNow`` for the 15-minute processing-time trigger."""
    name = query_name or f"wds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.table(name)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = LATE_HORIZON,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming key-dedup where duplicates may carry *different*
    event times (a re-fetched forecast row is stamped at fetch time,
    not observation time — reference server.py:158, 304): the first
    arrival per key wins and state for a key is dropped once the
    watermark passes its first-seen time.

    This is ``dropDuplicatesWithinWatermark`` — distinct from
    ``keep_latest_upsert``'s plain ``dropDuplicates``, which treats
    rows with different timestamps as different records.  State is
    bounded by (keys seen within the 4-day horizon), the same bound
    the reference's archive-lag envelope implies.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def streamed_static_join_aggregate(
    events: DataFrame,
    dim: DataFrame,
    key_expr,
    name_col: str = "n_name",
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a small
    static dimension (broadcast — re-read per micro-batch, never
    stateful) and aggregate per dimension attribute.

    The canonical streaming-ETL shape: dimension lookups on a stream
    need NO watermark and NO join state because the static side is a
    batch plan; only the downstream aggregate keeps state.  Cents-exact
    value sum (same rule as ``streamed_daily_aggregate``)."""
    keyed = events.withColumn("__k", key_expr)
    joined = keyed.join(
        F.broadcast(dim.withColumnRenamed(dim.columns[0], "__k")), "__k"
    )
    return joined.groupBy(name_col).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
            "value_sum"
        ),
    )


def streamed_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "6 hours",
    watermark: str = LATE_HORIZON,
) -> DataFrame:
    """Stream-stream inner join within a time interval — the funnel /
    attribution shape (left event followed by a right event from the
    same key within ``horizon``).

    Both sides carry watermarks and the join predicate bounds
    ``r.ts`` to ``[l.ts, l.ts + horizon]``; together those let Spark
    evict join state once the watermark passes a row's last possible
    match time — without the range condition, stream-stream join state
    grows forever.  Inner-join append output over ``availableNow``
    equals the batch interval join, so the DuckDB oracle applies."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col(f"l.{key}").alias(key),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def streamed_daily_aggregate_closed(
    events: DataFrame, watermark: str = LATE_HORIZON
) -> DataFrame:
    """Tumbling daily aggregate shaped for APPEND output mode: grouped
    by the full ``window`` struct (append-mode eviction tracks the
    event-time window column) and projected to the bucket start after
    aggregation.  In append mode only CLOSED windows are emitted —
    ``window.end <= watermark`` after the final no-data micro-batch
    (SPARK-24156 eager eviction) — i.e. the finalized prefix a
    downstream consumer can treat as immutable, while windows still
    inside the late-data horizon stay in state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
                "value_sum"
            ),
        )
        .select(F.col("window.start").alias("bucket_start"), "n", "value_sum")
    )
