"""Structured Streaming jobs (SURVEY.md §2.I)."""

from .jobs import (  # noqa: F401
    keep_latest_upsert,
    run_stream_to_memory,
    streamed_daily_aggregate,
    streaming_events_source,
)
