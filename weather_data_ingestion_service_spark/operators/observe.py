"""Observation metrics: the reference's API_CALLS counters
(reference server.py:37, 66, 100) as ``df.observe`` — metrics ride the
job itself (no second scan, no accumulator races; Spark delivers them
once per action via the Observation handle / QueryExecutionListener).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_call_counters(
    df: DataFrame, source_col: str | None = None, name: str = "api_calls"
) -> tuple[DataFrame, Observation]:
    """Attach call-counting observation to a plan.

    Returns the instrumented frame and the Observation; after the next
    action on the frame, ``observation.get`` holds ``n_calls`` (and
    per-source distinct count when ``source_col`` given) — the engine's
    API_CALLS side-channel.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_calls")]
    if source_col is not None:
        metrics.append(F.approx_count_distinct(source_col).alias("n_sources"))
    return df.observe(obs, *metrics), obs
