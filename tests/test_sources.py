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


class TestLiveFetch:
    """Live HTTP envelope (reference server.py:57-93) with an injected
    transport — no network in the sandbox; what's pinned is the
    resilience wiring, error enrichment, and the partition/decode
    plumbing of the live DataSource."""

    def test_disabled_without_env_flag(self, monkeypatch):
        from weather_data_ingestion_service_spark.sources.live import fetch_json

        monkeypatch.delenv("WDS_LIVE_FETCH", raising=False)
        with pytest.raises(RuntimeError, match="WDS_LIVE_FETCH"):
            fetch_json("https://example.invalid", {})

    def test_http_400_carries_reason_and_body(self):
        from weather_data_ingestion_service_spark.sources.live import fetch_json

        body = '{"error": true, "reason": "Value error for parameter hourly"}'
        with pytest.raises(HttpStatusError) as err:
            fetch_json("u", {}, transport=lambda url, params: (400, body))
        assert err.value.status == 400
        assert err.value.reason == "Value error for parameter hourly"
        assert err.value.body == body

    def test_retries_transient_then_succeeds(self):
        from weather_data_ingestion_service_spark.sources.live import fetch_json

        calls = {"n": 0}

        def flaky(url, params):
            calls["n"] += 1
            if calls["n"] < 3:
                raise TransientFetchError("conn reset")
            return 200, '{"ok": 1}'

        retry = RetryPolicy(sleep=lambda s: None)
        assert fetch_json("u", {}, retry=retry, transport=flaky) == {"ok": 1}
        assert calls["n"] == 3

    def test_status_error_fails_fast_no_retry(self):
        from weather_data_ingestion_service_spark.sources.live import fetch_json

        calls = {"n": 0}

        def bad(url, params):
            calls["n"] += 1
            return 500, "boom"

        retry = RetryPolicy(sleep=lambda s: None)
        with pytest.raises(HttpStatusError):
            fetch_json("u", {}, retry=retry, transport=bad)
        assert calls["n"] == 1  # server answered -> no retries

    def test_forecast_request_omits_unset_horizon_params(self):
        """Wire-level parity with server.py:236-249: forecast_days
        appears in the request iff the caller set it (clamped at 16)
        or neither horizon was given (default injection); past_days
        passes through only when positive."""
        from weather_data_ingestion_service_spark.sources.live import (
            fetch_forecast_document,
        )

        seen = {}

        def capture(url, params):
            seen.update(params)
            return 200, "{}"

        def req(**kw):
            seen.clear()
            fetch_forecast_document(50.0, 14.0, ["temperature_2m"], transport=capture, **kw)
            return dict(seen)

        # default call: explicit 7-day injection, no past_days
        p = req()
        assert p["forecast_days"] == 7 and "past_days" not in p
        # caller-specified, clamped at the API limit
        assert req(forecast_days=99)["forecast_days"] == 16
        # only past_days: forecast_days OMITTED from the request
        p = req(forecast_days=None, past_days=2)
        assert "forecast_days" not in p and p["past_days"] == 2
        # both specified: both present, no clamp below the limit
        p = req(forecast_days=5, past_days=2)
        assert p["forecast_days"] == 5 and p["past_days"] == 2

    def test_live_reader_partitions_and_decode(self):
        """One partition per coordinate; rows decode through the same
        document decoder as the offline source."""
        import json as _json

        from weather_data_ingestion_service_spark.schemas import DEFAULT_HOURLY_VARS
        from weather_data_ingestion_service_spark.sources.datasource import (
            OpenMeteoLiveReader,
        )

        def fake_transport(url, params):
            doc = {
                "latitude": params["latitude"],
                "longitude": params["longitude"],
                "hourly": {
                    "time": ["2024-01-01T00:00", "2024-01-01T01:00"],
                    **{v: [1.0, 2.0] for v in DEFAULT_HOURLY_VARS},
                },
            }
            return 200, _json.dumps(doc)

        reader = OpenMeteoLiveReader(
            {"coords": "[[0, 50.1, 14.3], [1, 52.5, 13.4]]"},
            transport=fake_transport,
        )
        parts = reader.partitions()
        assert [(p.location_id, p.latitude) for p in parts] == [(0, 50.1), (1, 52.5)]
        rows = list(reader.read(parts[1]))
        assert len(rows) == 2
        assert rows[0][0] == 1 and rows[0][1] == 52.5  # location_id, latitude

    def test_live_reader_refuses_offline(self, monkeypatch):
        from weather_data_ingestion_service_spark.sources.datasource import (
            OpenMeteoLiveReader,
        )

        monkeypatch.delenv("WDS_LIVE_FETCH", raising=False)
        with pytest.raises(RuntimeError, match="WDS_LIVE_FETCH"):
            OpenMeteoLiveReader({"coords": "[[0, 50.0, 14.0]]"})


class TestWebDataset:
    def test_round_trip_preserves_keys_and_payloads(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from weather_data_ingestion_service_spark.sources.webdataset import (
            register_webdataset_source,
            write_webdataset,
        )

        register_webdataset_source(spark)
        rows = [(i, "txt", f"document body {i}".encode()) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, member string, payload binary")
        out = str(tmp_path / "wds")
        write_webdataset(df, "doc_id", "member", "payload", out, n_shards=3)

        back = spark.read.format("webdataset").load(out)
        got = {r.key: bytes(r.payload) for r in back.collect()}
        assert got == {str(i): f"document body {i}".encode() for i in range(40)}
        # member naming: key.member
        assert all(r.member == f"{r.key}.txt" for r in back.collect())

    def test_one_tar_per_nonempty_shard_named_by_route(self, spark, tmp_path):
        """Every non-empty shard_assign route gets exactly one tar
        whose filename matches the route id — even when Spark's
        hash-partitioning of the shard VALUE co-locates distinct
        shards in one task (the ADVICE r03 finding)."""
        import glob as g
        import os as o
        import tarfile as t

        from weather_data_ingestion_service_spark.ext.sampling import (
            _id_hash_u52,
        )
        from weather_data_ingestion_service_spark.sources.webdataset import (
            register_webdataset_source,
            write_webdataset,
        )

        register_webdataset_source(spark)
        rows = [(i, "txt", b"x" * 10) for i in range(64)]
        df = spark.createDataFrame(rows, "doc_id long, member string, payload binary")
        expected = {
            r.shard: r.n
            for r in df.groupBy(
                (_id_hash_u52("doc_id") % 4).cast("int").alias("shard")
            )
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        out = str(tmp_path / "wds")
        write_webdataset(df, "doc_id", "member", "payload", out, n_shards=4)
        tars = sorted(g.glob(out + "/*.tar"))
        got = {}
        for path in tars:
            shard = int(o.path.basename(path)[len("shard-"):-len(".tar")])
            with t.open(path) as tf:
                got[shard] = len(tf.getmembers())
        assert got == {s: n for s, n in expected.items() if n > 0}
        back = spark.read.format("webdataset").load(out)
        assert back.count() == 64

    def test_write_is_deterministic(self, spark, tmp_path):
        import hashlib

        from weather_data_ingestion_service_spark.sources.webdataset import (
            write_webdataset,
        )

        rows = [(i, "txt", f"body {i}".encode()) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, member string, payload binary")
        sums = []
        for d in ("a", "b"):
            out = str(tmp_path / d)
            write_webdataset(df.repartition(5), "doc_id", "member", "payload", out, n_shards=2)
            import glob as g

            h = hashlib.md5()
            for t in sorted(g.glob(out + "/*.tar")):
                h.update(open(t, "rb").read())
            sums.append(h.hexdigest())
        assert sums[0] == sums[1]


def test_scan_merges_evolving_schema(spark, tmp_path):
    """Landing zones drift: a newer file adds a column. mergeSchema
    unifies the scan — old files surface NULL for the new column,
    nothing is dropped."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, 10.0)], "id long, temp double").write.parquet(
        d + "/day=1"
    )
    spark.createDataFrame(
        [(2, 11.0, 55.0)], "id long, temp double, humidity double"
    ).write.parquet(d + "/day=2")
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert {"id", "temp", "humidity", "day"} <= set(df.columns)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].humidity is None and rows[2].humidity == 55.0
