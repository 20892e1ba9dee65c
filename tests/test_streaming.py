"""Structured Streaming tests (SURVEY.md §5.4): watermark late-data
drop across micro-batches, keep-latest revision upsert, availableNow
harness determinism."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from weather_data_ingestion_service_spark.streaming import (
    keep_latest_upsert,
    run_stream_to_memory,
    streamed_daily_aggregate,
    streaming_events_source,
)

TMP = "/root/repo/.tmp/stream_tests"


@pytest.fixture()
def staged_dir(spark, sf_dir):
    """events split into three files arriving as separate micro-batches
    (modification-time ordered): on-time days 10-30, a small follow-up
    (days 28-30), then days 1-9 — which by that batch are > 4 days
    behind the max event time.  Three files because a watermark
    computed from batch N's data only takes effect for filtering in
    batch N+2 (it is updated at N+1's start from N's max, and applied
    to N+1's successors' input)."""
    from weather_data_ingestion_service_spark.io import load_table

    path = os.path.join(TMP, "staged")
    shutil.rmtree(TMP, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    files = [
        ev.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp")),
        ev.filter(F.col("ts") >= F.lit("2024-01-28").cast("timestamp")),
        ev.filter(F.col("ts") < F.lit("2024-01-10").cast("timestamp")),  # late
    ]
    now = 1_700_000_000
    for i, df in enumerate(files):
        sub = os.path.join(path, f"f{i}")
        df.coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (now + i * 3600, now + i * 3600))
    yield path
    shutil.rmtree(TMP, ignore_errors=True)


def test_streamed_daily_matches_batch(spark, sf_dir):
    """Complete-mode availableNow run over the whole table equals the
    batch daily aggregate."""
    from weather_data_ingestion_service_spark.io import load_table

    src = streaming_events_source(spark, sf_dir)
    got = run_stream_to_memory(streamed_daily_aggregate(src), "complete")
    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy(F.window("ts", "1 day")["start"].alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("value_sum"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_watermark_drops_late_rows_across_batches(spark, staged_dir):
    """File 1 (days 10-30) advances the watermark to max-4d; file 2
    (days 1-9, a later micro-batch) is entirely behind it → its rows
    never contribute to append-mode output."""
    schema = "event_id long, ts timestamp, value double"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(staged_dir + "/f*")
    )
    agg = (
        src.withWatermark("ts", "4 days")
        # group on window() itself: extracting .start pre-groupBy would
        # sever event-time watermark propagation (append mode rejects it)
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("day"), "n")
    )
    out = run_stream_to_memory(agg, "append")
    days = sorted(r.day.day for r in out.collect() if r.day.month == 1)
    # no day before Jan 10 can appear: those rows arrived late beyond
    # the 4-day watermark (reference archive lag, WetIng.pdf p.2)
    assert days and min(days) >= 10


def test_keep_latest_upsert_dedups_within_watermark(spark, sf_dir):
    """Re-fetched (key, revision) duplicates collapse to one row —
    the streaming analog of forecast-revision supersedence."""
    from weather_data_ingestion_service_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    doubled = ev.unionByName(ev)  # same revision fetched twice
    os.makedirs(TMP, exist_ok=True)
    p = os.path.join(TMP, "upsert_src")
    shutil.rmtree(p, ignore_errors=True)
    doubled.write.parquet(p)
    src = spark.readStream.schema("event_id long, ts timestamp, value double").parquet(p)
    deduped = keep_latest_upsert(src, ["event_id"], "value")
    out = run_stream_to_memory(deduped, "append")
    assert out.count() == ev.count()
    shutil.rmtree(p, ignore_errors=True)


def test_source_throttle_option_limits_batch_size(spark, staged_dir):
    """maxFilesPerTrigger=1 → one file per micro-batch (the engine's
    rate-limit analog, reference server.py:108)."""
    schema = "event_id long, ts timestamp, value double"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir + "/f*")
    )
    q = (
        src.groupBy().count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("wds_throttle_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 2  # two files → at least two micro-batches
