"""Source adapter tests: Open-Meteo wire-format round trip and the
reference's retry/rate-limit envelope (reference server.py:68-93, 108)."""

import pytest

from weather_data_ingestion_service_spark import fixtures
from weather_data_ingestion_service_spark.sources import (
    RateLimiter,
    RetryPolicy,
    parse_openmeteo_hourly,
    to_openmeteo_json,
)
from weather_data_ingestion_service_spark.sources.resilience import (
    HttpStatusError,
    TransientFetchError,
)


class TestOpenMeteoCodec:
    def test_round_trip_preserves_series(self, spark):
        wh = fixtures.weather_hourly(spark, n_locations=2, n_days=2)
        geo = fixtures.geo_dim(spark)
        tidy = wh.join(
            geo.select("location_id", "latitude", "longitude"), "location_id"
        )
        docs = to_openmeteo_json(tidy)
        assert docs.count() == 2  # one JSON document per location
        back = parse_openmeteo_hourly(docs)
        a = sorted(
            map(tuple, tidy.select(*back.columns).collect())
        )
        b = sorted(map(tuple, back.collect()))
        assert a == b

    def test_parse_is_columnar_struct_of_arrays(self, spark):
        """The wire format is the reference's: parallel arrays keyed by
        variable, aligned on `time` (server.py:213-223)."""
        import json

        wh = fixtures.weather_hourly(spark, n_locations=1, n_days=1)
        geo = fixtures.geo_dim(spark)
        tidy = wh.join(
            geo.select("location_id", "latitude", "longitude"), "location_id"
        )
        body = json.loads(to_openmeteo_json(tidy).first().body)
        assert set(body) >= {"latitude", "longitude", "timezone", "hourly"}
        hourly = body["hourly"]
        assert len(hourly["time"]) == 24
        assert len(hourly["temperature_2m"]) == len(hourly["time"])


class TestRetryPolicy:
    def test_three_attempts_plus_fallback(self):
        calls = []

        def always_fails():
            calls.append(1)
            raise TransientFetchError("timeout")

        sleeps = []
        policy = RetryPolicy(sleep=sleeps.append)
        with pytest.raises(TransientFetchError):
            policy.call(always_fails)
        assert len(calls) == 4  # 3 retried + 1 fallback (server.py:69-93)
        assert sleeps == [1.0, 2.0]  # backoff 1s, 2s between the 3 tries

    def test_http_status_fails_fast(self):
        calls = []

        def status_error():
            calls.append(1)
            raise HttpStatusError(404, "not found")

        policy = RetryPolicy(sleep=lambda s: None)
        with pytest.raises(HttpStatusError):
            policy.call(status_error)
        assert len(calls) == 1  # server answered → no retry (server.py:88-89)

    def test_recovers_after_transient(self):
        state = {"n": 0}

        def flaky():
            state["n"] += 1
            if state["n"] < 3:
                raise TransientFetchError("conn reset")
            return "ok"

        policy = RetryPolicy(sleep=lambda s: None)
        assert policy.call(flaky) == "ok"
        assert state["n"] == 3


class TestRateLimiter:
    def test_enforces_min_spacing(self):
        t = {"now": 0.0}
        slept = []

        def clock():
            return t["now"]

        def sleep(s):
            slept.append(s)
            t["now"] += s

        rl = RateLimiter(min_delay=1.1, clock=clock, sleep=sleep)
        rl.wait()  # first call free
        rl.wait()  # must wait 1.1s
        t["now"] += 2.0
        rl.wait()  # enough time passed → free
        assert slept == [pytest.approx(1.1)]


class TestOpenMeteoDataSource:
    def test_custom_format_reads_documents(self, spark):
        """Spark 4 Python DataSource: one partition per JSON file."""
        import os
        import shutil

        from weather_data_ingestion_service_spark import fixtures
        from weather_data_ingestion_service_spark.sources.datasource import (
            register_openmeteo_source,
        )
        from weather_data_ingestion_service_spark.sources import to_openmeteo_json

        tmp = "/root/repo/.tmp/openmeteo_src"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        wh = fixtures.weather_hourly(spark, n_locations=2, n_days=1)
        geo = fixtures.geo_dim(spark)
        tidy = wh.join(geo.select("location_id", "latitude", "longitude"), "location_id")
        for row in to_openmeteo_json(tidy).collect():
            with open(f"{tmp}/loc{row.doc_location_id}.json", "w") as fh:
                fh.write(row.body + "\n")

        register_openmeteo_source(spark)
        got = spark.read.format("openmeteo_hourly").load(tmp)
        assert got.count() == 2 * 24
        assert got.rdd.getNumPartitions() == 2  # one per document file
        a = sorted(map(tuple, tidy.select(*got.columns).collect()))
        b = sorted(map(tuple, got.collect()))
        assert a == b
        shutil.rmtree(tmp, ignore_errors=True)


class TestObserveCounters:
    def test_observation_counts_rows_of_the_action(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators.observe import (
            with_call_counters,
        )

        docs = load_table(spark, sf_dir, "documents")
        instrumented, obs = with_call_counters(docs, source_col="source")
        n = instrumented.count()
        assert obs.get["n_calls"] == n
        assert obs.get["n_sources"] > 0
