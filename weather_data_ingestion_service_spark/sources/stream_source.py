"""Streaming Python DataSource: a polling forecast-revision feed.

The live shape of the reference's ingestion loop — every trigger, poll
the upstream for the freshest forecast block (Open-Meteo refreshes
every 15 minutes, WetIng.pdf p.2; re-fetches supersede, server.py:304)
— as a Spark 4 streaming Python DataSource.  Offsets are poll counts,
so the stream is replayable/checkpointable: re-reading offset N yields
byte-identical rows (a deterministic synthesized revision of hour N —
in production the ``_fetch`` body becomes the HTTP call wrapped in
``resilience.RetryPolicy``/``RateLimiter``, and the offset becomes the
upstream's data version).

Usage::

    spark.dataSource.register(ForecastPollDataSource)
    df = (spark.readStream.format("forecast_poll")
          .option("n_locations", 3).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_SCHEMA = (
    "location_id bigint, hour_idx bigint, revision bigint, temperature_2m double"
)


def _fetch(poll: int, n_locations: int):
    """Deterministic fake upstream: at poll N the feed serves hour N's
    values for every location plus a revision of hour N-1 (the model
    re-ran) — same keys, superseding values."""
    rows = []
    for loc in range(n_locations):
        base = (loc * 31 + poll * 17) % 100
        rows.append((loc, poll, poll, 2.0 + loc + base / 10.0))
        if poll > 0:
            prev = (loc * 31 + (poll - 1) * 17) % 100
            rows.append((loc, poll - 1, poll, 2.0 + loc + prev / 10.0 + 0.5))
    return rows


class ForecastPollDataSource(DataSource):
    """format('forecast_poll'); options: n_locations, max_polls."""

    @classmethod
    def name(cls) -> str:
        return "forecast_poll"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema) -> "ForecastPollStreamReader":
        return ForecastPollStreamReader(self.options)


class ForecastPollStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_locations = int(options.get("n_locations", 3))
        self.max_polls = int(options.get("max_polls", 5))

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def read(self, start: dict):
        poll = start["poll"]
        if poll >= self.max_polls:
            return iter([]), {"poll": poll}
        return iter(_fetch(poll, self.n_locations)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path (recovery): regenerate the identical rows
        rows = []
        for poll in range(start["poll"], end["poll"]):
            rows.extend(_fetch(poll, self.n_locations))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the fake upstream is stateless


def register_forecast_poll_source(spark) -> None:
    spark.dataSource.register(ForecastPollDataSource)
