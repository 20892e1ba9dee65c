"""Operator-library unit tests: edge semantics the differential suite
can't isolate (ties, empties, equivalences)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from weather_data_ingestion_service_spark.operators import (
    asof_join,
    select_vars,
    topk,
    union_prefer,
)
from weather_data_ingestion_service_spark.operators.joins import bucketed_range_join
from weather_data_ingestion_service_spark.operators.relational import (
    filter_date_range,
    filter_horizon_relative,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                (1, _ts("2024-01-10 00:00:00"), "a"),
                (1, _ts("2024-01-15 00:00:00"), "b"),
                (2, _ts("2024-01-10 00:00:00"), "c"),
                (3, _ts("2024-01-10 00:00:00"), "d"),  # key with no right rows
            ],
            "k long, ts timestamp, tag string",
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-09 00:00:00"), 100),
                (1, _ts("2024-01-15 00:00:00"), 200),  # equal-ts tie vs left 'b'
                (2, _ts("2024-01-11 00:00:00"), 300),  # after left 'c'
            ],
            "k long, rts timestamp, payload int",
        )
        return left, right

    def test_backward_semantics_and_ties(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, ["k"], "ts", "rts", ["payload"])
        got = {r.tag: r.payload for r in out.collect()}
        # a: latest right <= 01-10 is 100; b: equal ts is INCLUSIVE → 200
        # c: right row is after → NULL; d: no right rows → NULL
        assert got == {"a": 100, "b": 200, "c": None, "d": None}

    def test_inner_drops_unmatched(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, ["k"], "ts", "rts", ["payload"], how="inner")
        assert sorted(r.tag for r in out.collect()) == ["a", "b"]

    def test_empty_right(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right.filter(F.lit(False)), ["k"], "ts", "rts", ["payload"]
        )
        assert out.count() == 4
        assert all(r.payload is None for r in out.collect())


class TestAsofJoinChunked:
    def test_matches_unchunked_on_boundary_fixture(self, spark):
        """Daily chunks put 'a' (01-10) and its match (01-09) in
        different chunks — the carry-in path must reproduce asof_join
        exactly, ties and inner mode included."""
        from weather_data_ingestion_service_spark.operators.joins import (
            asof_join_chunked,
        )

        left, right = TestAsofJoin()._frames(spark)
        for how in ("left", "inner"):
            want = sorted(
                map(tuple, asof_join(
                    left, right, ["k"], "ts", "rts", ["payload"], how=how
                ).collect())
            )
            got = sorted(
                map(tuple, asof_join_chunked(
                    left, right, ["k"], "ts", "rts", ["payload"],
                    how=how, chunk="1 day",
                ).collect())
            )
            assert got == want, how

    def test_matches_unchunked_on_hot_key(self, spark, sf_dir):
        """80% of events forced onto one key: the chunked variant must
        be row-identical to asof_join while splitting the hot key's
        window across (key, chunk) partitions."""
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators.joins import (
            asof_join_chunked,
        )

        ev = load_table(spark, sf_dir, "events").withColumn(
            "user_id",
            F.when(F.col("event_id") % 5 != 0, F.lit(7)).otherwise(
                F.col("user_id")
            ),
        ).select("event_id", "user_id", "ts")
        # right side unique per (key, ts): one reading per key per day
        right = (
            ev.withColumn("rts", F.date_trunc("day", "ts"))
            .groupBy("user_id", "rts")
            .agg(F.count(F.lit(1)).cast("long").alias("reading"))
        )
        want = sorted(map(tuple, asof_join(
            ev, right, ["user_id"], "ts", "rts", ["reading"]
        ).collect()))
        got = sorted(map(tuple, asof_join_chunked(
            ev, right, ["user_id"], "ts", "rts", ["reading"], chunk="1 day"
        ).collect()))
        assert got == want and len(got) > 0

    @pytest.mark.parametrize("seed", [11, 23, 47])
    def test_randomized_equivalence(self, spark, seed):
        """Seeded random frames (duplicate timestamps, keys missing on
        either side, ties at chunk boundaries): chunked ≡ unchunked."""
        import datetime as dt
        import random

        from weather_data_ingestion_service_spark.operators.joins import (
            asof_join_chunked,
        )

        rng = random.Random(seed)
        t0 = dt.datetime(2024, 1, 1)
        left = [
            (i, rng.randrange(6), t0 + dt.timedelta(minutes=rng.randrange(0, 7 * 1440)))
            for i in range(300)
        ]
        # right unique per (key, ts): dedup the generated pairs
        seen = {}
        for j in range(120):
            k = rng.randrange(8)  # some keys never on the left
            ts = t0 + dt.timedelta(minutes=rng.randrange(0, 7 * 1440))
            seen[(k, ts)] = j
        right = [(k, ts, v) for (k, ts), v in seen.items()]
        ldf = spark.createDataFrame(left, "eid long, k long, ts timestamp")
        rdf = spark.createDataFrame(right, "k long, rts timestamp, payload long")
        want = sorted(map(tuple, asof_join(
            ldf, rdf, ["k"], "ts", "rts", ["payload"]
        ).collect()))
        for chunk in ("1 day", "6 hours"):
            got = sorted(map(tuple, asof_join_chunked(
                ldf, rdf, ["k"], "ts", "rts", ["payload"], chunk=chunk
            ).collect()))
            assert got == want, chunk

    def test_plan_partitions_window_by_key_and_chunk(self, spark, sf_dir):
        """The skew fix is visible in the plan: the main window's
        exchange hashes on (key, __chunk), not the key alone."""
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators.joins import (
            asof_join_chunked,
        )

        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
        right = (
            ev.withColumn("rts", F.date_trunc("day", "ts"))
            .groupBy("user_id", "rts")
            .agg(F.count(F.lit(1)).cast("long").alias("reading"))
        )
        out = asof_join_chunked(
            ev, right, ["user_id"], "ts", "rts", ["reading"], chunk="1 day"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__chunk" in plan
        # some exchange partitions on both the key and the chunk
        import re

        assert re.search(r"hashpartitioning\([^)]*user_id[^)]*__chunk", plan) or (
            re.search(r"hashpartitioning\([^)]*__chunk[^)]*user_id", plan)
        )


class TestUnionPrefer:
    def test_preferred_wins_only_on_overlap(self, spark):
        pref = spark.createDataFrame([(1, "obs"), (2, "obs")], "k long, src string")
        other = spark.createDataFrame([(2, "fct"), (3, "fct")], "k long, src string")
        got = {r.k: r.src for r in union_prefer(pref, other, ["k"]).collect()}
        assert got == {1: "obs", 2: "obs", 3: "fct"}

    def test_idempotent(self, spark):
        pref = spark.createDataFrame([(1, "x")], "k long, v string")
        once = union_prefer(pref, pref, ["k"])
        twice = union_prefer(once, once, ["k"])
        assert once.collect() == twice.collect()


class TestBucketedRangeJoin:
    def test_equivalent_to_naive_theta_join(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators import (
            range_interval_join,
        )

        ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
        ranges = load_table(spark, sf_dir, "region").select(
            "r_name",
            F.expr("timestampadd(DAY, r_regionkey * 5, timestamp'2024-01-01')").alias("lo"),
            F.expr("timestampadd(DAY, r_regionkey * 5 + 7, timestamp'2024-01-01')").alias("hi"),
        )
        naive = range_interval_join(
            ev, ranges, F.col("ts"), F.col("lo"), F.col("hi")
        ).select("event_id", "r_name")
        bucketed = bucketed_range_join(ev, ranges, "ts", "lo", "hi", bucket_days=7)
        got = bucketed.select("event_id", "r_name")
        assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, got.collect()))


class TestProjectionsAndFilters:
    def test_select_vars_unknown_raises(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table

        part = load_table(spark, sf_dir, "part")
        with pytest.raises(ValueError, match="unknown variables"):
            select_vars(part, "p_partkey,nope", defaults=[])

    def test_date_range_validation(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        with pytest.raises(ValueError, match="start_date"):
            filter_date_range(orders, "o_orderdate", "1997-01-01", "1996-01-01")
        with pytest.raises(ValueError):
            filter_date_range(orders, "o_orderdate", "not-a-date", "1996-01-01")

    def test_horizon_clamped_at_16_days(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table

        ev = load_table(spark, sf_dir, "events")
        clamped = filter_horizon_relative(
            ev, "ts", "2024-01-01 00:00:00", 0, forecast_days=99
        )
        assert clamped.agg(F.max("ts")).first()[0] < _ts("2024-01-17 00:00:00")


class TestTopK:
    def test_topk_total_order_is_stable(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        a = topk(orders, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5)
        b = topk(
            orders.repartition(7), [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5
        )
        assert [r.o_orderkey for r in a.collect()] == [
            r.o_orderkey for r in b.collect()
        ]


class TestPrefixFilteredJaccard:
    def test_matches_bruteforce_all_pairs(self, spark, sf_dir):
        """Prefix filtering must be lossless: identical pair set and
        jaccard values as the naive all-pairs computation."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            ngram_jaccard_pairs,
            word_shingles,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
        fast = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.35).collect()
        }
        sh = word_shingles(docs, "text", 3).select("doc_id", "shingles")
        a = sh.selectExpr("doc_id AS id_a", "shingles AS sa")
        b = sh.selectExpr("doc_id AS id_b", "shingles AS sb")
        from pyspark.sql import functions as F

        brute = (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
            .withColumn(
                "jaccard",
                F.col("inter") / (F.size("sa") + F.size("sb") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= 0.35)
        )
        want = {(r.id_a, r.id_b): r.jaccard for r in brute.collect()}
        assert fast == want


class TestSaltedJoin:
    def test_row_identical_to_plain_join(self, spark, sf_dir):
        """Salting changes the physical distribution, never the rows."""
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators.skew import salted_join

        # simulate skew: 80% of events forced onto one user
        ev = load_table(spark, sf_dir, "events").withColumn(
            "user_id",
            F.when(F.col("event_id") % 5 != 0, F.lit(7)).otherwise(F.col("user_id")),
        ).select("event_id", "user_id", "value")
        users = (
            load_table(spark, sf_dir, "events")
            .select("user_id").distinct()
            .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
        )
        plain = ev.join(users, "user_id").select("event_id", "user_id", "segment")
        salted = salted_join(ev, users, "user_id", salt=8).select(
            "event_id", "user_id", "segment"
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_semi_join_row_identical(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators.skew import salted_join

        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
        users = ev.select("user_id").distinct().filter(F.col("user_id") % 2 == 0)
        plain = ev.join(users, "user_id", "left_semi")
        salted = salted_join(ev, users, "user_id", salt=4, how="left_semi")
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_right_and_full_rejected(self, spark, sf_dir):
        """An unmatched right row would surface once per salt replica,
        so right/full are a loud error, not silent duplication."""
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.operators.skew import salted_join

        ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
        users = ev.select("user_id").distinct()
        for how in ("right", "full", "outer", "right_outer"):
            with pytest.raises(ValueError, match="swap the inputs"):
                salted_join(ev, users, "user_id", how=how)


class TestApproxDistinct:
    def test_hll_within_rsd_of_exact(self, spark, sf_dir):
        """approx_count_distinct(rsd=0.02) stays within ~3σ of exact —
        the 100 TB substitute for exact distinct counts."""
        from weather_data_ingestion_service_spark.io import load_table

        ev = load_table(spark, sf_dir, "events")
        exact = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        approx = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
            .collect()
        }
        for k, n in exact.items():
            assert abs(approx[k] - n) <= max(3, 0.06 * n), (k, n, approx[k])


class TestDedupClusters:
    def test_chain_and_star_components(self, spark):
        """Min-label propagation converges past the fixture's shallow
        star graphs: a 5-node path (diameter 4) and an isolated node."""
        from weather_data_ingestion_service_spark.ext.dedup import dedup_clusters

        nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["id"])
        # path 1-2-3-4-5, pair 6-7; node 7 also isolated from the path
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], ["id_a", "id_b"]
        )
        got = {
            r.id: r.cluster_id
            for r in dedup_clusters(nodes, pairs, "id").collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6}

    def test_driver_and_distributed_paths_agree(self, spark):
        """The size-adaptive strategy is invisible in the labels:
        driver union-find (small graphs) and the distributed min-label
        loop (driver_cc_max_pairs=0 forces it) produce identical
        clusters."""
        from weather_data_ingestion_service_spark.ext.dedup import dedup_clusters

        nodes = spark.createDataFrame([(i,) for i in range(1, 12)], ["id"])
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (9, 10), (7, 10)],
            ["id_a", "id_b"],
        )
        fast = {
            r.id: r.cluster_id
            for r in dedup_clusters(nodes, pairs, "id").collect()
        }
        dist = {
            r.id: r.cluster_id
            for r in dedup_clusters(
                nodes, pairs, "id", driver_cc_max_pairs=0
            ).collect()
        }
        assert fast == dist
        assert fast[10] == 6 and fast[8] == 8 and fast[5] == 1

    def test_string_ids_survive_via_dense_remap(self, spark):
        """Non-numeric id columns must NOT be cast("long") to NULL
        (ADVICE r5): string doc keys route through the dense-index
        remap, cluster representatives stay the MIN ORIGINAL id, and
        both size-adaptive strategies agree."""
        from weather_data_ingestion_service_spark.ext.dedup import dedup_clusters

        names = [f"doc-{i:02d}" for i in range(1, 8)]
        nodes = spark.createDataFrame([(n,) for n in names], ["id"])
        pairs = spark.createDataFrame(
            [("doc-01", "doc-02"), ("doc-02", "doc-03"),
             ("doc-03", "doc-04"), ("doc-04", "doc-05"),
             ("doc-06", "doc-07")],
            ["id_a", "id_b"],
        )
        want = {f"doc-{i:02d}": "doc-01" for i in range(1, 6)}
        want.update({"doc-06": "doc-06", "doc-07": "doc-06"})
        fast = {
            r.id: r.cluster_id
            for r in dedup_clusters(nodes, pairs, "id").collect()
        }
        dist = {
            r.id: r.cluster_id
            for r in dedup_clusters(
                nodes, pairs, "id", driver_cc_max_pairs=0
            ).collect()
        }
        assert fast == want and dist == want

    def test_max_iter_bounds_rounds(self, spark):
        from weather_data_ingestion_service_spark.ext.dedup import dedup_clusters

        nodes = spark.createDataFrame([(i,) for i in range(1, 6)], ["id"])
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 5)], ["id_a", "id_b"]
        )
        # one round only: labels move one hop, not to the global min
        # (driver_cc_max_pairs=0 forces the distributed loop, which is
        # what max_iter bounds; the union-find path always converges)
        partial = {
            r.id: r.cluster_id
            for r in dedup_clusters(
                nodes, pairs, "id", max_iter=1, driver_cc_max_pairs=0
            ).collect()
        }
        assert partial[2] == 1 and partial[5] == 4


class TestHashSampling:
    def test_membership_invariant_under_repartition(self, spark, sf_dir):
        """The property that motivates hash sampling: the sample is a
        pure function of the row, not of partitioning or run order."""
        from weather_data_ingestion_service_spark.ext.sampling import hash_sample
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        a = {r.doc_id for r in hash_sample(docs, "doc_id", "28").collect()}
        b = {
            r.doc_id
            for r in hash_sample(docs.repartition(13), "doc_id", "28").collect()
        }
        assert a == b and 0 < len(a) < docs.count()

    def test_split_is_total_and_disjoint(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.sampling import hash_split
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        splits = hash_split(docs, "doc_id").groupBy("split").count().collect()
        got = {r.split: r["count"] for r in splits}
        assert set(got) == {"train", "val", "test"}
        assert sum(got.values()) == docs.count()
        assert got["train"] > got["val"] and got["train"] > got["test"]

    def test_stratified_exact_k(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.sampling import (
            stratified_topk,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        per = (
            stratified_topk(docs, "lang", "doc_id", 5)
            .groupBy("lang")
            .count()
            .collect()
        )
        avail = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
        for r in per:
            assert r["count"] == min(5, avail[r.lang])


class TestMultimodalFramesResize:
    def test_frame_fanout_matches_stub_formula(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            attach_binary_payload,
            sample_frames,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").limit(50)
        pay = attach_binary_payload(docs, "text")
        frames = sample_frames(pay, "doc_id", "payload", every_nth=4)
        got = {
            (r.doc_id, r.frame_no): r.frame_md5 for r in frames.collect()
        }
        import math
        for r in pay.select("doc_id", "payload_bytes").collect():
            n_frames = 1 + (r.payload_bytes % 32)
            expect = math.ceil(n_frames / 4)
            have = sum(1 for (d, _) in got if d == r.doc_id)
            assert have == expect, (r.doc_id, have, expect)
        # deterministic: re-run yields identical fingerprints
        again = {
            (r.doc_id, r.frame_no): r.frame_md5 for r in frames.collect()
        }
        assert got == again

    def test_resize_shrinks_payload_and_keeps_rows(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            attach_binary_payload,
            resize_images,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").limit(50)
        pay = attach_binary_payload(docs, "text")
        out = resize_images(pay, "doc_id", "payload", 224, 224).collect()
        assert len(out) == 50
        assert all(r.width == 224 and r.height == 224 for r in out)
        assert all(0 < r.payload_bytes <= 49 for r in out)

    def test_real_codec_path_is_gated(self, spark, sf_dir):
        import pytest
        from weather_data_ingestion_service_spark.ext.multimodal import (
            attach_binary_payload,
            resize_images,
            sample_frames,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").limit(1)
        pay = attach_binary_payload(docs, "text")
        # the frame sampler's real path EXISTS now (concatenated-PNG
        # container parse): on non-clip bytes it must yield ZERO frames
        # (no PNG signature), never silently hand back fake output
        assert sample_frames(pay, use_real_codec=True).count() == 0
        # resize's real path EXISTS too (stdlib PNG / PIL): on
        # non-image bytes it must fail loudly at execution, never
        # silently hand back fake output
        with pytest.raises(Exception, match="PNG|image"):
            resize_images(pay, use_real_codec=True).collect()

    def test_real_clip_parse_round_trips_frame_bytes(self, spark):
        """split_png_frames recovers the EXACT encoder output: a synth
        clip of 6 frames parses back to 6 byte-identical PNGs (md5
        pinned against a local re-encode), and sampling every 4th
        yields frames {0, 4} with 30 fps timestamps."""
        import hashlib

        from weather_data_ingestion_service_spark.ext.multimodal import (
            _encode_png_stdlib,
            sample_frames,
            split_png_frames,
            synth_clip_payload,
        )

        ids = spark.createDataFrame([(3,), (7,)], ["doc_id"])
        clips = synth_clip_payload(ids, "doc_id", n_frames=6)
        # driver-side reference encode of doc 3, frame 4
        def ref_frame(k, fno, w=24, h=16):
            phase = k * 1000 + fno
            px = bytearray(w * h * 3)
            for y in range(h):
                for x in range(w):
                    o = (y * w + x) * 3
                    px[o] = (x * 255 // (w - 1) + phase) % 256
                    px[o + 1] = (y * 255 // (h - 1) + 2 * phase) % 256
                    px[o + 2] = (x + y + 3 * phase) % 256
            return _encode_png_stdlib(px, w, h, 3)

        payload = {r.doc_id: bytes(r.payload) for r in clips.collect()}
        frames = split_png_frames(payload[3])
        assert len(frames) == 6
        assert frames[4] == ref_frame(3, 4)
        got = sample_frames(
            clips, "doc_id", "payload", every_nth=4, use_real_codec=True
        ).collect()
        assert {(r.doc_id, r.frame_no, r.frame_ts_ms) for r in got} == {
            (3, 0, 0), (3, 4, 133), (7, 0, 0), (7, 4, 133),
        }
        by_key = {(r.doc_id, r.frame_no): r.frame_md5 for r in got}
        assert by_key[(3, 4)] == hashlib.md5(ref_frame(3, 4)).hexdigest()

    def test_clip_parse_salvages_truncated_stream(self):
        """Errors as values: a clip cut mid-chunk yields the frames
        fully parsed before the corruption; garbage yields none."""
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _encode_png_stdlib,
            split_png_frames,
        )

        f = _encode_png_stdlib(bytes(24 * 16 * 3), 24, 16, 3)
        assert split_png_frames(f + f[: len(f) // 2]) == [f]
        assert split_png_frames(b"not a png at all") == []
        assert split_png_frames(b"") == []


class TestRealImageDecode:
    """The real decode path (VERDICT r03 missing item #1): PIL when
    importable, stdlib PNG decoder otherwise — exercised end to end
    against committed PNG fixtures (all five PNG filter types)."""

    FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

    def _png(self, name):
        with open(os.path.join(self.FIXDIR, name), "rb") as fh:
            return fh.read()

    def test_decode_real_rgb_fixture(self):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _decode_real,
        )

        w, h, nch, luma = _decode_real(self._png("gradient_rgb.png"))
        assert (w, h, nch) == (16, 12, 3)
        assert abs(luma - 0.4250235294117647) < 1e-9

    def test_decode_real_greyscale_fixture(self):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _decode_real,
        )

        w, h, nch, luma = _decode_real(self._png("gradient_grey.png"))
        assert (w, h, nch) == (8, 8, 1)
        assert abs(luma - 0.15098039215686274) < 1e-9

    def test_decode_real_rejects_non_image_without_codec(self):
        import pytest
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _decode_real,
        )

        try:
            import PIL  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError):
                _decode_real(b"this is not an image payload")

    def test_decode_image_features_real_codec_through_spark(self, spark):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            decode_image_features,
        )

        df = spark.createDataFrame(
            [(1, self._png("gradient_rgb.png")),
             (2, self._png("gradient_grey.png"))],
            ["doc_id", "payload"],
        )
        out = {
            r.doc_id: r
            for r in decode_image_features(
                df, use_real_codec=True
            ).collect()
        }
        assert (out[1].width, out[1].height, out[1].n_channels) == (16, 12, 3)
        assert abs(out[1].mean_luma - 0.4250235294117647) < 1e-9
        assert (out[2].width, out[2].height, out[2].n_channels) == (8, 8, 1)
        assert abs(out[2].mean_luma - 0.15098039215686274) < 1e-9


class TestAsofNearest:
    def test_directions_and_tie_break(self, spark):
        from weather_data_ingestion_service_spark.operators import (
            asof_join_nearest,
        )

        left = spark.createDataFrame(
            [(1, "2024-01-05 00:00:00"), (2, "2024-01-14 00:00:00"),
             (3, "2024-01-15 00:00:00"), (4, "2024-01-30 00:00:00")],
            ["id", "ts"],
        ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "1 AS k")
        right = spark.createDataFrame(
            [("2024-01-10 00:00:00", 10), ("2024-01-20 00:00:00", 20)],
            ["rts", "v"],
        ).selectExpr("CAST(rts AS TIMESTAMP) rts", "v", "1 AS k")
        got = {
            r.id: r.v
            for r in asof_join_nearest(
                left, right, ["k"], "ts", "rts", ["v"]
            ).collect()
        }
        # 01-05: only forward (10); 01-14: back 4d < fwd 6d -> 10;
        # 01-15: equidistant 5d/5d tie -> backward (10); 01-30: back (20)
        assert got == {1: 10, 2: 10, 3: 10, 4: 20}


class TestAudioWavPath:
    """Real stdlib WAV path: synthesized PCM16 sine containers decode
    back to the synthesis parameters (RMS = amp/sqrt(2), zero
    crossings = 2·f·t, exact duration) — the audio analogue of the PNG
    fixture tests."""

    def test_synth_decode_roundtrip_features(self, spark):
        import math

        from weather_data_ingestion_service_spark.ext.multimodal import (
            decode_audio_features,
            synth_wav_payload,
        )

        ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
        wav = synth_wav_payload(ids, "doc_id", sample_rate=8000, duration_s=0.2)
        feats = {
            r["doc_id"]: r
            for r in decode_audio_features(wav, "doc_id").collect()
        }
        assert len(feats) == 8
        for i, r in feats.items():
            freq = 200 + (i % 32) * 20
            amp = (1 + i % 7) / 8.0 * 32767.0
            assert r["sample_rate"] == 8000
            assert r["n_channels"] == 1
            assert r["n_samples"] == 1600
            assert r["duration_ms"] == 200
            # sine statistics (1% tolerance: quantization + partial cycles)
            assert abs(r["rms"] - amp / math.sqrt(2)) < amp * 0.01
            assert abs(r["peak"] - amp) < amp * 0.01 + 1
            assert abs(r["zero_crossings"] - 2 * freq * 0.2) <= 2

    def test_decode_rejects_non_wav(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from weather_data_ingestion_service_spark.ext.multimodal import (
            decode_audio_features,
        )

        bad = spark.range(0, 1).select(
            F.col("id").alias("doc_id"),
            F.lit(b"definitely not audio").alias("audio"),
        )
        with pytest.raises(Exception):
            decode_audio_features(bad, "doc_id").collect()


class TestNdcgAtK:
    """ndcg_at_k: pinned hand-computed cases against the integer
    discount table."""

    def _runs(self, spark, approx_rows):
        truth = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, match_id long, rank int",
        )
        approx = spark.createDataFrame(
            approx_rows, "query_id long, match_id long, rank int"
        )
        return truth, approx

    def test_perfect_ranking_is_one(self, spark):
        from weather_data_ingestion_service_spark.ext.simsearch import ndcg_at_k

        truth, approx = self._runs(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
        row = ndcg_at_k(truth, approx, k=3).collect()[0]
        assert row["ndcg"] == 1.0
        assert row["dcg_micro"] == row["idcg_micro"]

    def test_all_misses_is_zero(self, spark):
        from weather_data_ingestion_service_spark.ext.simsearch import ndcg_at_k

        truth, approx = self._runs(spark, [(1, 90, 1), (1, 91, 2), (1, 92, 3)])
        row = ndcg_at_k(truth, approx, k=3).collect()[0]
        assert row["ndcg"] == 0.0
        assert row["dcg_micro"] == 0

    def test_swapped_top2_matches_hand_dcg(self, spark):
        from weather_data_ingestion_service_spark.ext.simsearch import (
            ndcg_at_k,
            ndcg_discount_micros,
        )

        # approx swaps ranks of the top-2 truth items
        truth, approx = self._runs(spark, [(1, 11, 1), (1, 10, 2), (1, 12, 3)])
        d = dict(ndcg_discount_micros(3))
        # rel(10)=3 at approx rank 2, rel(11)=2 at rank 1, rel(12)=1 at rank 3
        want_dcg = 2 * d[1] + 3 * d[2] + 1 * d[3]
        want_idcg = 3 * d[1] + 2 * d[2] + 1 * d[3]
        row = ndcg_at_k(truth, approx, k=3).collect()[0]
        assert row["dcg_micro"] == want_dcg
        assert row["idcg_micro"] == want_idcg
        assert row["ndcg"] == want_dcg / want_idcg


class TestFunnelOrdering:
    """win_funnel's strictly-after contract on crafted event logs —
    the edge the registry fixture can't guarantee to contain."""

    def _funnel_counts(self, spark, rows):
        """Run the SHIPPED operator (the one the registry serves), not
        a private re-implementation."""
        from weather_data_ingestion_service_spark.operators.windows import (
            conversion_funnel,
        )

        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        out = conversion_funnel(ev, ["view", "click", "purchase"])
        got = {r["stage"]: r["n_users"] for r in out.collect()}
        return got["1_view"], got["2_click"], got["3_purchase"]

    def test_click_before_view_does_not_convert(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime(2024, 1, 1, s)
        rows = [
            # user 1: proper view -> click -> purchase
            (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
            # user 2: click BEFORE the first view — stage 2 must not count
            (2, "click", t(1)), (2, "view", t(2)), (2, "purchase", t(3)),
            # user 3: purchase between view and click — not a conversion
            (3, "view", t(1)), (3, "purchase", t(2)), (3, "click", t(3)),
        ]
        assert self._funnel_counts(spark, rows) == (3, 2, 1)

    def test_same_timestamp_is_not_after(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 1)
        rows = [(1, "view", t0), (1, "click", t0)]
        assert self._funnel_counts(spark, rows) == (1, 0, 0)


class TestDupcapAndStreakEdges:
    def test_dupcap_keeps_at_most_two_deterministically(self, spark):
        """The cap is exact and the survivors are a deterministic
        function of ids (run twice, same survivors) — exercised via
        the shipped capped_duplicates operator."""
        from weather_data_ingestion_service_spark.ext.sampling import (
            capped_duplicates,
        )

        docs = spark.createDataFrame(
            [(i, f"content-{i % 3}") for i in range(30)], "doc_id long, text string"
        )
        pick = lambda: sorted(
            r["doc_id"]
            for r in capped_duplicates(docs, ["text"], "doc_id", cap=2).collect()
        )
        first = pick()
        assert len(first) == 6  # 3 contents × cap 2
        assert first == pick()
        got_copies = {
            r["doc_id"]: r["n_copies"]
            for r in capped_duplicates(docs, ["text"], "doc_id", cap=2).collect()
        }
        assert set(got_copies.values()) == {10}  # 30 rows / 3 contents

    def test_streak_islands_on_crafted_days(self, spark):
        import datetime as dt

        from weather_data_ingestion_service_spark.operators.windows import (
            day_streaks,
        )

        days = [1, 2, 3, 7, 8, 20]  # streaks: 3, 2, 1
        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, d, 12)) for d in days],
            "user_id long, ts timestamp",
        )
        row = day_streaks(ev).collect()[0]
        assert (row["longest_streak"], row["n_active_days"]) == (3, 6)


class TestAudioMultiChannel:
    def test_stereo_zero_crossings_use_one_channel(self, spark):
        """L = 200 Hz sine, R = inverted sine: interleaved-stream
        counting would see ~2 sign flips per sample pair; the decoder
        must report the single-channel rate (~2·f·t)."""
        import io as _io
        import math
        import struct
        import wave

        from weather_data_ingestion_service_spark.ext.multimodal import (
            decode_audio_features,
        )

        sr, n, freq = 8000, 1600, 200
        frames = b"".join(
            struct.pack(
                "<hh",
                int(16000 * math.sin(2 * math.pi * freq * t / sr)),
                -int(16000 * math.sin(2 * math.pi * freq * t / sr)),
            )
            for t in range(n)
        )
        buf = _io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(frames)
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "doc_id long, audio binary"
        )
        r = decode_audio_features(df, "doc_id").collect()[0]
        assert r["n_channels"] == 2
        assert r["n_samples"] == n
        assert abs(r["zero_crossings"] - 2 * freq * (n / sr)) <= 2


class TestRealImageResize:
    """Real resize path: PNG fixture → nearest-neighbor resample →
    re-encoded PNG that the real decoder accepts at the new size."""

    FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

    def test_resize_roundtrip_through_spark(self, spark):

        from weather_data_ingestion_service_spark.ext.multimodal import (
            _decode_real,
            resize_images,
        )

        with open(os.path.join(self.FIXDIR, "gradient_rgb.png"), "rb") as fh:
            png = fh.read()
        df = spark.createDataFrame(
            [(1, bytearray(png))], "doc_id long, payload binary"
        )
        out = resize_images(
            df, target_w=8, target_h=6, use_real_codec=True
        ).collect()[0]
        assert (out["width"], out["height"]) == (8, 6)
        w, h, nch, luma = _decode_real(bytes(out["payload"]))
        assert (w, h, nch) == (8, 6, 3)
        # nearest-neighbor of a smooth gradient keeps mean luma close
        _, _, _, src_luma = _decode_real(png)
        assert abs(luma - src_luma) < 0.05

    def test_resize_kernel_upsamples_too(self):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _decode_real,
            _resize_real,
        )

        with open(os.path.join(self.FIXDIR, "gradient_grey.png"), "rb") as fh:
            png = fh.read()
        up = _resize_real(png, 16, 16)
        w, h, nch, _ = _decode_real(up)
        assert (w, h, nch) == (16, 16, 1)


class TestMedianMadCrafted:
    def test_known_median_and_mad(self):
        """Pin the discrete-selection semantics on crafted values:
        even-count group takes the LOWER median element.  (The Spark
        side is held to this same SQL by the differential suite.)"""
        import duckdb

        from weather_data_ingestion_service_spark import registry

        # values 1..4 (even count): lower median element = 2
        # devs |1-2|,|2-2|,|3-2|,|4-2| = 1,0,1,2 sorted 0,1,1,2 -> lower
        # median dev = 1

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM (VALUES "
            "(1, 'a', 1.0), (2, 'a', 2.0), (3, 'a', 3.0), (4, 'a', 4.0), "
            "(5, 'b', 10.0), (6, 'b', 10.0), (7, 'b', 99.0)"
            ") t(event_id, event_type, value)"
        )
        sql = registry.oracle_sql()["agg_median_mad"]
        got = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(sql).fetchall()
        }
        # a: n=4, median=2.0 (lower), mad=1.0 (lower of 0,1,1,2)
        assert got["a"] == (4, 2.0, 1.0)
        # b: n=3, median=10.0, devs 0,0,89 -> mad=0.0
        assert got["b"] == (3, 10.0, 0.0)


class TestCorruptPngContract:
    """Corrupt containers must surface as ValueError (the documented
    undecodable-payload contract), never raw struct/zlib errors."""

    def test_truncated_and_corrupt_payloads_raise_valueerror(self):
        import zlib

        from weather_data_ingestion_service_spark.ext.multimodal import (
            _PNG_SIG,
            _encode_png_stdlib,
            _png_pixels,
        )

        good = _encode_png_stdlib(bytes(range(48)), 4, 4, 3)
        cases = {
            "truncated header": _PNG_SIG + b"\x00\x00",
            "truncated mid-chunk": good[: len(good) // 2],
            "bad idat": good.replace(
                zlib.compress(
                    b"".join(b"\x00" + bytes(range(48))[y*12:(y+1)*12] for y in range(4)), 6
                ),
                b"garbage-not-zlib",
            ),
        }
        import pytest

        for name, payload in cases.items():
            with pytest.raises(ValueError, match="PNG"):
                _png_pixels(payload)
            # sanity: the error never escapes as struct/zlib error

    def test_unknown_filter_type_rejected(self):
        import struct
        import zlib

        import pytest

        from weather_data_ingestion_service_spark.ext.multimodal import (
            _PNG_SIG,
            _png_pixels,
        )

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
        raw = b"\x07" + bytes([1, 2])  # filter type 7 = invalid
        bad = (_PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="filter"):
            _png_pixels(bad)


class TestHllMerge:
    def test_estimate_within_error_bound(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark import registry

        got = {
            r["event_type"]: r["est_users"]
            for r in registry.queries()["agg_hll_merge"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for t, est in got.items():
            assert abs(est - exact[t]) <= max(0.05 * exact[t], 2), (t, est, exact[t])

    def test_union_of_daily_sketches_equals_direct_sketch(self, spark, sf_dir):
        """Same-lgK HLL union is a lossless register merge: estimating
        the union of per-day sketches must equal sketching all rows at
        once — the property that makes daily sketch rollups a valid
        storage format at scale."""
        from weather_data_ingestion_service_spark.io import load_table

        ev = load_table(spark, sf_dir, "events")
        merged = {
            r["event_type"]: r["est"]
            for r in ev.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
            .groupBy("event_type")
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
            .collect()
        }
        direct = {
            r["event_type"]: r["est"]
            for r in ev.groupBy("event_type")
            .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
            .collect()
        }
        assert merged == direct


class TestMrrPlanted:
    def test_first_hit_rank_and_zero_miss(self, spark):
        """Planted runs against the SHIPPED mrr_at_k operator: truth =
        {10, 11}; approx ranks them at 3 and 7 -> first hit 3, rr =
        round(1e6/3); a query with no hits -> (0, 0)."""
        from weather_data_ingestion_service_spark.ext.simsearch import mrr_at_k

        truth = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
            "query_id long, match_id long, rank int",
        )
        approx = spark.createDataFrame(
            [(1, 99, 1), (1, 98, 2), (1, 10, 3), (1, 11, 7),
             (2, 77, 1), (2, 78, 2)],
            "query_id long, match_id long, rank int",
        )
        out = {
            r["query_id"]: (r["first_hit_rank"], r["rr_micro"])
            for r in mrr_at_k(truth, approx, k=10).collect()
        }
        assert out[1] == (3, round(1_000_000 / 3))
        assert out[2] == (0, 0)


class TestCompressionRatio:
    def test_known_compressibility_pins(self, spark):
        from weather_data_ingestion_service_spark.ext.text import (
            compression_ratio,
        )

        docs = spark.createDataFrame(
            [
                (1, "a" * 2000),                      # boilerplate: tiny ratio
                (2, "the quick brown fox " * 100),    # repetitive prose
                (3, "", ),                            # empty: 0 by contract
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r for r in compression_ratio(docs).collect()
        }
        assert got[1]["raw_bytes"] == 2000
        assert got[1]["ratio_milli"] < 20      # ~15/2000
        assert got[2]["ratio_milli"] < 100
        assert got[3] and got[3]["raw_bytes"] == 0 and got[3]["ratio_milli"] == 0
        # determinism: same input, same bytes
        again = {r["doc_id"]: r["gz_bytes"] for r in compression_ratio(docs).collect()}
        assert again == {k: v["gz_bytes"] for k, v in got.items()}


class TestBpeTrain:
    def test_classic_merge_sequence(self, spark):
        """The Sennrich example, hand-computed: hug×3 pug×2 hugs×1 →
        merges (u,g)=6, (h,ug)=4, (p,ug)=2; (hug,s)=1 falls under
        min_count and training stops."""
        from weather_data_ingestion_service_spark.ext.text import bpe_train

        docs = spark.createDataFrame(
            [(1, "hug hug hug pug pug hugs")], "doc_id long, text string"
        )
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in bpe_train(docs, n_merges=10, min_count=2)
            .orderBy("rank").collect()
        ]
        assert got == [
            (1, "u", "g", "ug", 6),
            (2, "h", "ug", "hug", 4),
            (3, "p", "ug", "pug", 2),
        ]

    def test_deterministic_tie_break(self, spark):
        """Equal-count pairs merge in lexicographic order: 'ab'×2 and
        'cd'×2 → (a,b) wins round 1."""
        from weather_data_ingestion_service_spark.ext.text import bpe_train

        docs = spark.createDataFrame(
            [(1, "ab ab cd cd")], "doc_id long, text string"
        )
        got = bpe_train(docs, n_merges=2, min_count=2).orderBy("rank").collect()
        assert (got[0]["left"], got[0]["right"]) == ("a", "b")
        assert (got[1]["left"], got[1]["right"]) == ("c", "d")

    def test_empty_result_when_no_pair_reaches_min_count(self, spark):
        from weather_data_ingestion_service_spark.ext.text import bpe_train

        docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
        assert bpe_train(docs, n_merges=5, min_count=2).count() == 0

    def test_oracle_terminates_with_engine_on_full_merge(self, spark):
        """ADVICE r10: when the vocabulary fully merges BEFORE n_merges
        rounds, only dummy (sym, NULL) pairs remain and a frequent
        single-symbol word's dummy count can pass min_count — without
        the `br IS NOT NULL` recursion guard the DuckDB oracle emitted
        a NULL-right merge (NULL-poisoning later rounds) while
        bpe_train broke out of its loop.  Corpus: 'ab'×5 fully merges
        in round 1; 'c'×5 contributes a freq-5 dummy that would have
        won round 2's argmax."""
        import duckdb
        import pandas as pd

        from weather_data_ingestion_service_spark.ext.text import bpe_train
        from weather_data_ingestion_service_spark.registry_r10 import (
            _bpe_exact_oracle,
        )

        rows = [(0, "ab ab ab ab ab"), (1, "c c c c c")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in bpe_train(docs, n_merges=10, min_count=2)
            .orderBy("rank").collect()
        ]
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        want = con.execute(
            _bpe_exact_oracle(n_docs=2, n_merges=10, min_count=2)
        ).fetchall()
        con.close()
        assert got == [tuple(w) for w in want] == [(1, "a", "b", "ab", 5)]


class TestPassAtKCeiling:
    def test_bucket_over_1000_raises_on_both_engines(self, spark, tmp_path):
        """ADVICE r10: C(n,5)·1e6 overflows int64 past n ≈ 1020 — Spark
        used to wrap silently while DuckDB raised.  The ceiling is now
        enforced symmetrically: a task bucket with n > 1000 raises on
        BOTH engines instead of producing a wrong number on one."""
        import duckdb

        import pytest

        from weather_data_ingestion_service_spark.registry import (
            oracle_sql,
            queries,
        )

        spark.createDataFrame(
            [(i, 7, float(i % 100)) for i in range(1001)],
            "event_id long, user_id long, value double",
        ).selectExpr(
            "event_id", "user_id", "value",
            "timestamp_micros(event_id * 1000000) AS ts",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

        with pytest.raises(Exception, match="pass@k int64 ceiling"):
            queries()["ext_eval_pass_at_k"](spark, str(tmp_path)).collect()

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet/*.parquet'"
        )
        with pytest.raises(Exception, match="pass@k int64 ceiling"):
            con.execute(oracle_sql()["ext_eval_pass_at_k"]).fetchall()
        con.close()


class TestAsofForward:
    def test_forward_semantics_and_ties(self, spark):
        """Forward direction on the standard fixture: earliest right
        with rts >= ts; equal timestamps inclusive; no future row →
        NULL (mirrors DuckDB ASOF ... ON l.ts <= r.rts, probed)."""
        left, right = TestAsofJoin()._frames(spark)
        out = asof_join(
            left, right, ["k"], "ts", "rts", ["payload"], direction="forward"
        )
        got = {r.tag: r.payload for r in out.collect()}
        # a (01-10): earliest >= is 01-15 → 200; b (01-15): equal → 200
        # c (01-10): 01-11 → 300; d: no right rows → NULL
        assert got == {"a": 200, "b": 200, "c": 300, "d": None}

    def test_backward_unchanged_by_direction_param(self, spark):
        left, right = TestAsofJoin()._frames(spark)
        base = sorted(map(tuple, asof_join(
            left, right, ["k"], "ts", "rts", ["payload"]).collect()))
        explicit = sorted(map(tuple, asof_join(
            left, right, ["k"], "ts", "rts", ["payload"],
            direction="backward").collect()))
        assert base == explicit

    def test_bad_direction_raises(self, spark):
        left, right = TestAsofJoin()._frames(spark)
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, right, ["k"], "ts", "rts", ["payload"],
                      direction="sideways")


class TestBpeEncode:
    def test_hand_computed_token_counts(self, spark):
        """hug×3 pug×2 hugs×1 trains (u,g)(h,ug)(p,ug); encoding the
        same text: hug→[hug]=1, pug→[pug]=1, hugs→[hug,s]=2 →
        3·1 + 2·1 + 2 = 7 tokens over 3+3+3+3+3+4 = 19 symbols."""
        from weather_data_ingestion_service_spark.ext.text import (
            bpe_encode,
            bpe_train,
        )

        docs = spark.createDataFrame(
            [(1, "hug hug hug pug pug hugs")], "doc_id long, text string"
        )
        merges = bpe_train(docs, n_merges=10, min_count=2)
        row = bpe_encode(docs, merges, "doc_id", "text").collect()[0]
        assert row["n_words"] == 6
        assert row["n_symbols"] == 19
        assert row["n_tokens"] == 7
        assert row["compression_micro"] == 7 * 1_000_000 // 19

    def test_empty_merge_table_counts_characters(self, spark):
        from weather_data_ingestion_service_spark.ext.text import bpe_encode

        docs = spark.createDataFrame([(1, "ab cde")], "doc_id long, text string")
        merges = spark.createDataFrame(
            [], "rank int, left string, right string, merged string, pair_count long"
        )
        row = bpe_encode(docs, merges, "doc_id", "text").collect()[0]
        assert (row["n_symbols"], row["n_tokens"]) == (5, 5)

    def test_rank_order_beats_frequency_order(self, spark):
        """Greedy-by-rank: with merges [(b,c)->bc, (a,b)->ab], 'abc'
        encodes as [a, bc] — rule 1 consumes the b even though rule 2
        could also have applied."""
        from weather_data_ingestion_service_spark.ext.text import bpe_encode

        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        merges = spark.createDataFrame(
            [(1, "b", "c", "bc", 9), (2, "a", "b", "ab", 9)],
            "rank int, left string, right string, merged string, pair_count long",
        )
        row = bpe_encode(docs, merges, "doc_id", "text").collect()[0]
        assert row["n_tokens"] == 2


class TestExactAuc:
    def test_auc_micro_hand_computed(self, spark):
        """Drives the REGISTERED kernel (ext/simsearch.exact_auc) on a
        crafted frame: scores [1,2,3,4] labels [n,p,n,p] — for class
        'p' pairs won = 3 of 4, no ties -> AUC = 0.75; for class 'n'
        the complement -> 0.25."""
        from weather_data_ingestion_service_spark.ext.simsearch import exact_auc

        df = spark.createDataFrame(
            [("p", 2), ("p", 4), ("n", 1), ("n", 3)], "lang string, score long"
        )
        got = {r["lang"]: r["auc_micro"] for r in exact_auc(df, "lang", "score").collect()}
        assert got == {"p": 750_000, "n": 250_000}

    def test_all_ties_is_half(self, spark):
        """Constant score -> every pos/neg pair ties -> AUC exactly 0.5
        for every class."""
        from weather_data_ingestion_service_spark.ext.simsearch import exact_auc

        df = spark.createDataFrame(
            [("p", 7), ("p", 7), ("n", 7)], "lang string, score long"
        )
        got = {r["lang"]: r["auc_micro"] for r in exact_auc(df, "lang", "score").collect()}
        assert got == {"p": 500_000, "n": 500_000}

    def test_perfect_separation(self, spark):
        from weather_data_ingestion_service_spark.ext.simsearch import exact_auc

        df = spark.createDataFrame(
            [("p", 10), ("p", 9), ("n", 1), ("n", 2)], "lang string, score long"
        )
        got = {r["lang"]: r["auc_micro"] for r in exact_auc(df, "lang", "score").collect()}
        assert got["p"] == 1_000_000 and got["n"] == 0


class TestBloomPrefilterJoin:
    def test_bitmap_has_no_false_negatives(self, spark, sf_dir):
        """Every key inserted into the word/mask bitmap must pass the
        probe — membership is exact for inserted keys; only
        NON-members may slip through (and the real join removes
        them)."""
        from pyspark.sql import functions as F

        keys = spark.range(0, 500).select(F.col("id").alias("k"))
        m_bits = 1 << 17
        bit = F.pmod(F.xxhash64("k"), F.lit(m_bits))
        words = (
            keys.withColumn("bit", bit)
            .select(
                (F.col("bit") / 64).cast("long").alias("word"),
                F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("mask"),
            )
            .groupBy("word")
            .agg(F.bit_or("mask").alias("mask"))
        )
        probe = (
            keys.withColumn("bit", bit)
            .withColumn("word", (F.col("bit") / 64).cast("long"))
            .withColumn("pmask", F.expr("shiftleft(1L, CAST(bit % 64 AS INT))"))
            .join(words, "word")
            .filter(F.col("mask").bitwiseAND(F.col("pmask")) != 0)
        )
        assert probe.count() == 500


class TestKnnGraph:
    def test_recall_vs_exact_and_shape(self, spark, sf_dir):
        """Bucketed graph recalls >= 0.6 of the exact top-5 edges at
        sf0.001, every node emits <= k deterministic, self-free
        neighbors."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from weather_data_ingestion_service_spark.ext.simsearch import (
            _dot,
            _norm,
            knn_graph,
        )
        from weather_data_ingestion_service_spark.io import load_table

        # NOTE: cached frames MUST be unpersisted before the test ends —
        # Spark's cache manager substitutes cached fragments into ANY
        # later matching plan, which changes size statistics and flips
        # broadcast decisions in unrelated tests (this bit the
        # shuffle-budget guard: a cached `embeddings` scan turned two
        # broadcast joins into shuffle joins)
        emb = load_table(spark, sf_dir, "embeddings").cache()
        approx = knn_graph(
            emb, "vec_id", "embedding", k=5, n_planes=3, n_tables=6
        ).cache()
        try:
            rows = approx.collect()
            per = {}
            for r in rows:
                assert r["vec_id"] != r["neighbor_id"]
                per.setdefault(r["vec_id"], []).append(r["rank"])
            assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
            assert max(len(v) for v in per.values()) <= 5

            a = emb.selectExpr("vec_id a", "embedding va")
            b = emb.selectExpr("vec_id b", "embedding vb")
            sc = (
                a.crossJoin(b)
                .filter("a != b")
                .select(
                    "a",
                    "b",
                    (
                        _dot(F.col("va"), F.col("vb"))
                        / (_norm(F.col("va")) * _norm(F.col("vb")))
                    ).alias("cos"),
                )
            )
            w = Window.partitionBy("a").orderBy(F.col("cos").desc(), "b")
            exact = (
                sc.withColumn("r", F.row_number().over(w))
                .filter("r <= 5")
                .select("a", "b")
            )
            ap = approx.selectExpr("vec_id a", "neighbor_id b")
            hit = exact.join(ap, ["a", "b"], "left_semi").count()
            tot = exact.count()
            assert hit / tot >= 0.6, f"recall {hit}/{tot}"
        finally:
            approx.unpersist()
            emb.unpersist()

    def test_deterministic_across_runs(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import knn_graph
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        g1 = sorted(map(tuple, knn_graph(emb, k=3, n_planes=3, n_tables=2).collect()))
        g2 = sorted(map(tuple, knn_graph(emb, k=3, n_planes=3, n_tables=2).collect()))
        assert g1 == g2


class TestImageAvgHash:
    def test_identical_images_share_hash_distinct_mostly_differ(self, spark):
        from pyspark.sql import functions as F

        from weather_data_ingestion_service_spark.ext.multimodal import (
            image_avg_hash,
            synth_png_payload,
        )

        ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        # two copies of each of 10 synthetic images
        imgs = synth_png_payload(
            ids.select((F.col("doc_id") % 10).alias("doc_id"))
        )
        hashed = image_avg_hash(imgs, "doc_id", "payload").collect()
        by_key = {}
        for r in hashed:
            by_key.setdefault(r["doc_id"], set()).add(r["ahash"])
        # same synth key -> identical payload -> identical hash
        assert all(len(v) == 1 for v in by_key.values())
        assert all(r["ahash"] is not None for r in hashed)
        assert all((r["width"], r["height"]) == (24, 16) for r in hashed)
        # different synth keys give >1 distinct hash overall
        assert len({next(iter(v)) for v in by_key.values()}) > 1

    def test_corrupt_payload_yields_null_hash(self, spark):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            image_avg_hash,
        )

        df = spark.createDataFrame(
            [(1, bytearray(b"not a png"))], "doc_id long, payload binary"
        )
        row = image_avg_hash(df, "doc_id", "payload").collect()[0]
        assert row["ahash"] is None and row["width"] is None

    def test_bits_pattern_gives_distinct_hashes_per_key(self, spark):
        """The planted-duplicate contract (round 6): pattern='bits'
        must give DISTINCT aHashes for distinct keys — the default
        gradient collides (~6 hashes for 50 keys), which silently
        merged planted groups before the phash oracle caught it."""
        from weather_data_ingestion_service_spark.ext.multimodal import (
            image_avg_hash,
            synth_png_payload,
        )

        keys = spark.range(0, 50).select(F.col("id").alias("doc_id"))
        imgs = synth_png_payload(keys, pattern="bits")
        hashes = [
            r["ahash"]
            for r in image_avg_hash(imgs, "doc_id", "payload").collect()
        ]
        assert len(hashes) == 50
        assert len(set(hashes)) == 50
        assert all(h is not None for h in hashes)

    def test_png_meta_parses_header_and_survives_corruption(self, spark):
        """png_meta: IHDR fields parsed without pixel decode; corrupt,
        truncated, and NULL payloads yield NULL fields, never task
        failures (errors as values)."""
        from weather_data_ingestion_service_spark.ext.multimodal import (
            png_meta,
            synth_png_payload,
        )

        ids = spark.range(0, 3).select(F.col("id").alias("doc_id"))
        good = synth_png_payload(ids, width=32, height=8).collect()
        rows = [(r["doc_id"], bytes(r["payload"])) for r in good]
        rows.append((90, b"not a png at all"))
        rows.append((91, rows[0][1][:20]))  # truncated mid-IHDR-chunk
        rows.append((92, None))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in png_meta(df, "doc_id", "payload").collect()}
        for i in range(3):
            r = got[i]
            assert (r["width"], r["height"]) == (32, 8)
            assert (r["bit_depth"], r["color_type"]) == (8, 2)
            assert (r["n_chunks"], r["ihdr_len"]) == (3, 13)
        for bad in (90, 91, 92):
            assert got[bad]["width"] is None and got[bad]["n_chunks"] is None


class TestCompaction:
    def test_compaction_reduces_file_count_and_keeps_rows(self, spark, sf_dir):
        import glob

        from weather_data_ingestion_service_spark import registry

        qs = registry.queries()
        df = qs["sink_compaction"](spark, sf_dir)
        assert df.count() > 0
        import weather_data_ingestion_service_spark.registry as reg

        tag = reg._session_tag(spark, sf_dir)
        base = f"/tmp/wds_compact_{tag}"
        frag = glob.glob(f"{base}/fragmented/part-*")
        comp = glob.glob(f"{base}/compacted/part-*")
        assert len(comp) <= 4 < len(frag)
        n_raw = spark.read.parquet(f"{base}/fragmented").count()
        n_comp = spark.read.parquet(f"{base}/compacted").count()
        assert n_raw == n_comp


class TestNewOpNullContracts:
    def test_bpe_encode_null_text_is_empty_doc(self, spark):
        from weather_data_ingestion_service_spark.ext.text import bpe_encode

        docs = spark.createDataFrame(
            [(1, None), (2, "ab")], "doc_id long, text string"
        )
        merges = spark.createDataFrame(
            [], "rank int, left string, right string, merged string, pair_count long"
        )
        got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
        assert (got[1]["n_words"], got[1]["n_tokens"]) == (0, 0)
        assert got[2]["n_tokens"] == 2

    def test_image_avg_hash_null_payload_yields_null_hash(self, spark):
        from weather_data_ingestion_service_spark.ext.multimodal import (
            image_avg_hash,
        )

        df = spark.createDataFrame(
            [(1, None)], "doc_id long, payload binary"
        )
        row = image_avg_hash(df, "doc_id", "payload").collect()[0]
        assert row["ahash"] is None


class TestImageNearDup:
    def test_perturbed_block_is_within_hamming_and_paired(self, spark):
        """Two images identical except one 8×8 cell inverted: aHashes
        differ in only a few bits, and the banded join must emit the
        pair (recall contract: any pair <= bands-1 bits shares a
        band)."""
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _encode_png_stdlib,
            image_avg_hash,
            image_near_dup_pairs,
        )

        w, h = 32, 32
        base = bytearray(
            ((x * 7 + y * 13) % 256)
            for y in range(h)
            for x in range(w)
            for _ in range(3)
        )
        pert = bytearray(base)
        # invert one grid cell (top-left 4x4 pixel block of cell 0)
        for y in range(4):
            for x in range(4):
                for c in range(3):
                    o = (y * w + x) * 3 + c
                    pert[o] = 255 - pert[o]
        df = spark.createDataFrame(
            [
                (1, bytearray(_encode_png_stdlib(bytes(base), w, h, 3))),
                (2, bytearray(_encode_png_stdlib(bytes(pert), w, h, 3))),
            ],
            "doc_id long, payload binary",
        )
        hashed = image_avg_hash(df, "doc_id", "payload")
        rows = {r["doc_id"]: r["ahash"] for r in hashed.collect()}
        xor = rows[1] ^ rows[2]
        hamming = bin(xor & ((1 << 64) - 1)).count("1")
        assert 0 < hamming <= 3, hamming
        pairs = image_near_dup_pairs(hashed, max_hamming=3, bands=4).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]

    def test_bands_contract_enforced(self, spark):
        import pytest as _pytest

        from weather_data_ingestion_service_spark.ext.multimodal import (
            image_near_dup_pairs,
        )

        df = spark.createDataFrame([(1, 5)], "doc_id long, ahash long")
        with _pytest.raises(ValueError, match="bands"):
            image_near_dup_pairs(df, max_hamming=8, bands=4)


class TestDedupEval:
    def test_minhash_recall_floor_on_planted_corpus(self, spark, sf_dir):
        """The MinHash+LSH candidate set must recover >= 90% of the
        exact-Jaccard pairs on the planted near-dup corpus (measured
        0.989 at sf0.001), with precision >= 90% — the QA gate the
        dedup stack ships with."""
        from weather_data_ingestion_service_spark import registry

        row = registry.queries()["ext_eval_dedup"](spark, sf_dir).collect()[0]
        assert row["n_exact"] > 0
        assert row["recall_micro"] >= 900_000, row
        assert row["precision_micro"] >= 900_000, row


class TestIntegerPagerank:
    def test_symmetric_pair_splits_evenly(self, spark):
        """Two nodes, one edge: by symmetry both ranks stay equal at
        every iteration, and total mass ~ unit (minus bounded
        truncation leak)."""
        from weather_data_ingestion_service_spark.ext.graph import pagerank_int

        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        got = {r["id"]: r["rank_nano"] for r in pagerank_int(pairs, n_iter=5).collect()}
        assert got[1] == got[2]
        total = sum(got.values())
        assert abs(total - 1_000_000_000) < 1000  # leak ≤ deg per round

    def test_hub_outranks_leaves(self, spark):
        """Star graph 1-2, 1-3, 1-4: the hub accumulates the leaves'
        contributions and must outrank every leaf; leaves tie."""
        from weather_data_ingestion_service_spark.ext.graph import pagerank_int

        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
        )
        got = {r["id"]: r["rank_nano"] for r in pagerank_int(pairs, n_iter=10).collect()}
        assert got[1] > got[2] == got[3] == got[4]

    def test_partitioning_independence(self, spark, sf_dir):
        """Integer state makes the ranks a pure function of the graph:
        1 partition vs 7 partitions, bit-identical output."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            ngram_jaccard_pairs,
        )
        from weather_data_ingestion_service_spark.ext.graph import pagerank_int
        from weather_data_ingestion_service_spark.registry_ext import (
            _near_dup_corpus,
        )

        corpus = _near_dup_corpus(spark, sf_dir)
        pairs = ngram_jaccard_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.5
        ).select("id_a", "id_b")
        a = sorted(map(tuple, pagerank_int(pairs.repartition(1), n_iter=4).collect()))
        b = sorted(map(tuple, pagerank_int(pairs.repartition(7), n_iter=4).collect()))
        assert a == b and len(a) > 0

    def test_string_ids_survive_via_dense_remap(self, spark):
        """String node ids must not be NULLed by a long cast (ADVICE
        r5): the dense-index remap yields the same rank VALUES as the
        isomorphic integer graph, keyed by the original strings."""
        from weather_data_ingestion_service_spark.ext.graph import pagerank_int

        sp = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("a", "d")], "id_a string, id_b string"
        )
        ip = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
        )
        got_s = {r["id"]: r["rank_nano"] for r in pagerank_int(sp, n_iter=6).collect()}
        got_i = {r["id"]: r["rank_nano"] for r in pagerank_int(ip, n_iter=6).collect()}
        assert set(got_s) == {"a", "b", "c", "d"}
        assert [got_s[k] for k in "abcd"] == [got_i[k] for k in (1, 2, 3, 4)]

    def test_driver_and_distributed_paths_bit_identical(self, spark):
        """The size-adaptive switch is invisible: exact integer state
        makes the driver iteration and the per-round join loop
        (driver_max_pairs=0 forces it) produce identical ranks."""
        from weather_data_ingestion_service_spark.ext.graph import pagerank_int

        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (3, 4), (5, 6), (2, 1)],
            "id_a long, id_b long",
        )
        fast = sorted(map(tuple, pagerank_int(pairs, n_iter=6).collect()))
        dist = sorted(
            map(
                tuple,
                pagerank_int(pairs, n_iter=6, driver_max_pairs=0).collect(),
            )
        )
        assert fast == dist and len(fast) == 6


class TestDuplicateSpans:
    def test_hand_computed_spans(self, spark):
        """Docs A and B share the 6-token run 'a b c d e f' (two
        overlapping hot 5-grams at positions 0 and 1 -> ONE merged
        span of 6 tokens); doc C is unique -> zero spans."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            duplicate_spans,
        )

        rows = [
            (1, "a b c d e f q r s t u v"),
            (2, "x y a b c d e f z w k m"),
            (3, "p1 p2 p3 p4 p5 p6 p7 p8"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens)
            for r in duplicate_spans(df, "doc_id", "text", k=5).collect()
        }
        assert got[1] == (12, 1, 6)
        assert got[2] == (12, 1, 6)
        assert got[3] == (8, 0, 0)

    def test_short_doc_yields_no_grams(self, spark):
        from weather_data_ingestion_service_spark.ext.dedup import (
            duplicate_spans,
        )

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a b c d e")], ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_spans)
            for r in duplicate_spans(df, "doc_id", "text", k=5).collect()
        }
        # 2-token docs have no 5-gram at all, even though identical
        assert got[1] == (2, 0) and got[2] == (2, 0)
        assert got[3] == (5, 0)

    def test_within_doc_repeat_counts(self, spark):
        """A 5-gram repeated WITHIN one doc is duplicated text too
        (Lee et al. count total occurrences, not distinct docs)."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            duplicate_spans,
        )

        df = spark.createDataFrame(
            [(1, "a b c d e x x1 y2 z3 w4 a b c d e")], ["doc_id", "text"]
        )
        r = duplicate_spans(df, "doc_id", "text", k=5).collect()[0]
        assert r.n_dup_spans == 2 and r.dup_tokens == 10

    def test_span_removal_drops_covered_tokens(self, spark):
        from weather_data_ingestion_service_spark.ext.dedup import (
            remove_duplicate_spans,
        )

        rows = [
            (1, "a b c d e f q r s t u v"),
            (2, "x y a b c d e f z w k m"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.doc_id: (r.text_clean, r.n_kept, r.n_removed)
            for r in remove_duplicate_spans(df, "doc_id", "text", k=5).collect()
        }
        assert got[1] == ("q r s t u v", 6, 6)
        assert got[2] == ("x y z w k m", 6, 6)

    def test_span_removal_fully_duplicated_doc_empties(self, spark):
        from weather_data_ingestion_service_spark.ext.dedup import (
            remove_duplicate_spans,
        )

        rows = [(1, "a b c d e"), (2, "a b c d e")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.doc_id: (r.text_clean, r.n_removed)
            for r in remove_duplicate_spans(df, "doc_id", "text", k=5).collect()
        }
        assert got[1] == ("", 5) and got[2] == ("", 5)


class TestTrendMK:
    def test_monotonic_series_saturates_s(self, spark):
        """Strictly increasing daily sums -> S = n(n-1)/2, all pairs
        concordant."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r5 import (
            q_agg_trend_mk,
        )
        # build through the registered query's shape instead: hand DF
        from pyspark.sql import functions as F
        rows = []
        for d in range(5):
            # one event per day, value strictly increasing
            rows.append(
                (d, "up", dt.datetime(2024, 1, 1 + d, 12, 0), 1.0 + d)
            )
        ev = spark.createDataFrame(
            rows, ["event_id", "event_type", "ts", "value"]
        )
        from weather_data_ingestion_service_spark.registry import _cents
        d = ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        ).agg(F.sum(_cents("value")).cast("long").alias("cents"))
        a = d.select("event_type", F.col("day").alias("day_a"), F.col("cents").alias("c_a"))
        b = d.select("event_type", F.col("day").alias("day_b"), F.col("cents").alias("c_b"))
        pairs = a.join(b, "event_type").filter(F.col("day_a") < F.col("day_b"))
        s = pairs.select(
            F.sum(
                F.when(F.col("c_b") > F.col("c_a"), 1)
                .when(F.col("c_b") < F.col("c_a"), -1)
                .otherwise(0)
            ).alias("s")
        ).collect()[0]["s"]
        assert s == 10  # 5*4/2 pairs, all concordant

    def test_trend_max_days_cap_boundary(self, spark):
        """The quadratic guard (VERDICT r5 #5): with max_days == series
        length the trend operators see every day; one below, they use
        only the MOST RECENT days.  The 10-day series falls then rises,
        so capping to the rising tail flips MK's S positive and shifts
        Theil-Sen's pair count from 45 to 36."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r5 import (
            mann_kendall_daily,
            theil_sen_daily,
        )

        # days 0: cents 100; days 1-9: strictly rising 1..9
        rows = [("t", dt.date(2024, 1, 1), 100)] + [
            ("t", dt.date(2024, 1, 1 + i), i) for i in range(1, 10)
        ]
        d = spark.createDataFrame(
            rows, "event_type string, day date, cents long"
        )
        full = mann_kendall_daily(d, max_days=10).collect()[0]
        assert full["n_days"] == 10
        # 36 concordant rising pairs, 9 discordant vs the day-0 spike
        assert (full["concordant"], full["discordant"]) == (36, 9)
        capped = mann_kendall_daily(d, max_days=9).collect()[0]
        assert capped["n_days"] == 9
        assert (capped["concordant"], capped["discordant"]) == (36, 0)
        assert capped["s_stat"] == 36

        ts_full = theil_sen_daily(d, max_days=10).collect()[0]
        ts_capped = theil_sen_daily(d, max_days=9).collect()[0]
        assert ts_full["n_pairs"] == 45 and ts_capped["n_pairs"] == 36
        # rising tail is exactly +1 cent/day = 1_000_000 micro
        assert ts_capped["theil_sen_slope_micro"] == 1_000_000


class TestDenseIndexByKey:
    def test_matches_global_window_and_partition_invariant(self, spark, sf_dir):
        """The distributed zipWithIndex (range partitions + offset
        counts) must equal row_number() - 1 under the global key order,
        for any partition count."""
        from pyspark.sql import Window

        from weather_data_ingestion_service_spark.ext.sampling import (
            dense_index_by_key,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        ref = {
            r.doc_id: r.idx
            for r in docs.select(
                "doc_id",
                (F.row_number().over(Window.orderBy("doc_id")) - 1)
                .cast("long")
                .alias("idx"),
            ).collect()
        }
        for n_parts in (2, 7):
            got = {
                r.doc_id: r.idx
                for r in dense_index_by_key(
                    docs, "doc_id", "idx", n_partitions=n_parts
                ).collect()
            }
            assert got == ref, n_parts


class TestMannWhitney:
    def test_hand_computed_with_ties(self, spark):
        """Pool {a:1,2  b:2,3}: ranks 1; 2,2 -> avg 2.5; 3 -> 4.
        Doubled rank sums: a = 2+5 = 7, b = 5+8 = 13.
        U*2 = R*2 - n(n+1): a -> 7-6 = 1, b -> 13-6 = 7."""
        from weather_data_ingestion_service_spark.operators.aggregates import (
            mannwhitney_one_vs_rest,
        )

        d = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 2), ("b", 3)],
            "event_type string, cents long",
        )
        got = {r.event_type: (r.n_days, r.u_x2)
               for r in mannwhitney_one_vs_rest(d).collect()}
        assert got == {"a": (2, 1), "b": (2, 7)}

    def test_separated_groups_hit_extremes(self, spark):
        """Fully separated distributions give U = 0 and U = n1*n2."""
        from weather_data_ingestion_service_spark.operators.aggregates import (
            mannwhitney_one_vs_rest,
        )

        d = spark.createDataFrame(
            [("lo", v) for v in (1, 2, 3)] + [("hi", v) for v in (10, 20, 30)],
            "event_type string, cents long",
        )
        got = {r.event_type: r.u_x2 for r in mannwhitney_one_vs_rest(d).collect()}
        assert got == {"lo": 0, "hi": 2 * 9}  # doubled U


class TestWelchTTest:
    def test_hand_computed_symmetric(self, spark):
        """a = {1,2,3} vs b = {4,5,6}: equal variances (1 each),
        t = (2-5)/sqrt(1/3 + 1/3) = -3/sqrt(2/3)."""
        import math

        from weather_data_ingestion_service_spark.operators.aggregates import (
            welch_ttest_one_vs_rest,
        )

        d = spark.createDataFrame(
            [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (4, 5, 6)],
            "event_type string, cents long",
        )
        rows = {r.event_type: r for r in welch_ttest_one_vs_rest(d).collect()}
        t_a = rows["a"].t_welch
        assert abs(t_a - (-3.0 / math.sqrt(2.0 / 3.0))) < 1e-12
        # one-vs-rest symmetry with two groups: b's test is a's negated
        assert rows["b"].t_welch == -t_a
        assert rows["a"].mean_diff_cents == -3.0

    def test_zero_variance_both_sides_dropped(self, spark):
        """Both sides constant -> pooled variance 0 -> t undefined;
        the row must be filtered (Spark ANSI would otherwise throw
        where DuckDB yields NULL).  One-sided constancy stays fine."""
        from weather_data_ingestion_service_spark.operators.aggregates import (
            welch_ttest_one_vs_rest,
        )

        flat = spark.createDataFrame(
            [("a", 5), ("a", 5), ("b", 9), ("b", 9)],
            "event_type string, cents long",
        )
        assert welch_ttest_one_vs_rest(flat).count() == 0
        onesided = spark.createDataFrame(
            [("a", 5), ("a", 5), ("b", 1), ("b", 9)],
            "event_type string, cents long",
        )
        rows = {r.event_type: r for r in
                welch_ttest_one_vs_rest(onesided).collect()}
        assert set(rows) == {"a", "b"}
        import math
        assert all(math.isfinite(r.t_welch) for r in rows.values())

    def test_singleton_groups_are_dropped(self, spark):
        """n = 1 on either side has no variance — row must not appear
        (and must not divide by zero)."""
        from weather_data_ingestion_service_spark.operators.aggregates import (
            welch_ttest_one_vs_rest,
        )

        d = spark.createDataFrame(
            [("solo", 5)] + [("rest", v) for v in (1, 2, 3)],
            "event_type string, cents long",
        )
        # 'solo' has n1=1; 'rest' complement is the singleton -> n2=1
        assert welch_ttest_one_vs_rest(d).count() == 0


class TestGopherFlags:
    def test_rule_attribution(self, spark):
        """Each rule trips independently; keep is their conjunction."""
        from weather_data_ingestion_service_spark.ext.text import gopher_flags

        good = " ".join(["the", "and", "with"] + ["word"] * 60)
        short = "the and some words here"                      # < 50 words
        longwords = " ".join(
            ["the", "and"] + ["x" * 40] * 60
        )                                                      # mean len > 10
        numeric = " ".join(["the", "and"] + ["123"] * 60)      # alpha < 80%
        nostop = " ".join(["alpha"] * 60)                      # < 2 stopwords
        symbols = " ".join(
            ["the", "and"] + ["ok"] * 50 + ["#tag"] * 10
        )                                                      # sym ratio > 0.1
        df = spark.createDataFrame(
            list(enumerate([good, short, longwords, numeric, nostop, symbols])),
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in gopher_flags(df).collect()}
        assert rows[0].keep
        assert not rows[1].ok_words and rows[1].ok_stop
        assert not rows[2].ok_wordlen and rows[2].ok_words
        assert not rows[3].ok_alpha and rows[3].ok_words
        assert not rows[4].ok_stop and rows[4].ok_alpha
        assert not rows[5].ok_symbols and rows[5].ok_stop
        for i in range(1, 6):
            assert not rows[i].keep, i

    def test_counts_exact(self, spark):
        from weather_data_ingestion_service_spark.ext.text import gopher_flags

        df = spark.createDataFrame(
            [(1, "The the IS it#x ...y 123")], "doc_id long, text string"
        )
        r = gopher_flags(df).collect()[0]
        # tokens: the, the, is, it#x, ...y, 123
        assert r.n_words == 6
        assert r.sum_wlen == 3 + 3 + 2 + 4 + 4 + 3
        assert r.n_alpha == 5          # '123' has no [a-z]
        assert r.n_stop == 2           # distinct {the, is}
        # '#' in it#x and '...' in ...y


class TestPreferencePairs:
    def test_mirrored_tiebreaks_never_alias(self, spark):
        """All-tied scores: pair i must still pick distinct docs
        (smallest ids as chosen, largest as rejected)."""
        from weather_data_ingestion_service_spark.ext.sampling import (
            preference_pairs,
        )

        df = spark.createDataFrame(
            [(i, "g", 7) for i in range(5)], "doc_id long, grp string, score long"
        )
        rows = preference_pairs(df, ["grp"], "score", "doc_id", k=3).collect()
        got = {(r.pair_rank, r.chosen_id, r.rejected_id) for r in rows}
        # n = 5 -> 2i <= 5 allows i in {1, 2}
        assert got == {(1, 0, 4), (2, 1, 3)}
        assert all(r.score_gap == 0 for r in rows)

    def test_best_pairs_with_worst(self, spark):
        from weather_data_ingestion_service_spark.ext.sampling import (
            preference_pairs,
        )

        df = spark.createDataFrame(
            [(i, "g", 10 * i) for i in range(1, 7)],
            "doc_id long, grp string, score long",
        )
        rows = {r.pair_rank: r for r in
                preference_pairs(df, ["grp"], "score", "doc_id", k=3).collect()}
        assert (rows[1].chosen_id, rows[1].rejected_id) == (6, 1)
        assert rows[1].score_gap == 50
        assert (rows[3].chosen_id, rows[3].rejected_id) == (4, 3)


class TestPointInPolygon:
    SQUARE = {"sq": [(0, 0), (10, 0), (10, 10), (0, 10)]}

    def _tag(self, spark, pts, polys):
        from weather_data_ingestion_service_spark.operators.spatial import (
            tag_points_in_polygons,
        )

        df = spark.createDataFrame(pts, "c long, px long, py long")
        return {
            (r.c, r.poly_id)
            for r in tag_points_in_polygons(df, polys, "px", "py").collect()
        }

    def test_square_containment(self, spark):
        got = self._tag(
            spark,
            [(1, 5, 5), (2, 15, 5), (3, -1, 5), (4, 5, 15), (5, 5, -1)],
            self.SQUARE,
        )
        assert got == {(1, "sq")}

    def test_concave_notch_is_outside(self, spark):
        """Chevron with the notch at the top-middle: a point inside the
        notch lies within the convex hull but OUTSIDE the polygon —
        bounding boxes and hulls get this wrong, parity doesn't."""
        chevron = {"ch": [(0, 0), (20, 0), (20, 20), (10, 5), (0, 20)]}
        got = self._tag(
            spark,
            [(1, 10, 12), (2, 10, 2), (3, 2, 10), (4, 18, 10)],
            chevron,
        )
        # (10,12) sits in the notch above the concave vertex (10,5)
        assert got == {(2, "ch"), (3, "ch"), (4, "ch")}

    def test_overlapping_polygons_multi_tag(self, spark):
        polys = {
            "a": [(0, 0), (10, 0), (10, 10), (0, 10)],
            "b": [(5, 5), (20, 5), (20, 20), (5, 20)],
        }
        got = self._tag(spark, [(1, 7, 7), (2, 1, 1), (3, 15, 15)], polys)
        assert got == {(1, "a"), (1, "b"), (2, "a"), (3, "b")}

    def test_horizontal_edges_elided(self):
        from weather_data_ingestion_service_spark.operators.spatial import (
            polygon_inside_sql,
        )

        sql = polygon_inside_sql("px", "py", [(0, 0), (10, 0), (10, 10), (0, 10)])
        # square: the two horizontal edges contribute literal zeros
        assert sql.count("CASE WHEN") == 2


class TestContainmentPairs:
    def test_directed_hand_case(self, spark):
        """A = 'a b c d e' has 3-gram shingles {abc,bcd,cde}, all inside
        B = 'a b c d e f g' (5 shingles): C(A→B) = 1 passes at 0.9,
        C(B→A) = 3/5 does not — the pair comes out DIRECTED."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            containment_pairs,
        )

        df = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "a b c d e f g"),
                (3, "x y z w v u t"),
            ],
            "doc_id long, text string",
        )
        rows = {(r.id_a, r.id_b): r
                for r in containment_pairs(df, "doc_id", "text").collect()}
        assert set(rows) == {(1, 2)}
        r = rows[(1, 2)]
        assert (r.n_a, r.inter, r.containment_micro) == (3, 3, 1_000_000)

    def test_prefix_filter_is_lossless(self, spark, sf_dir):
        """The asymmetric prefix filter must be candidate-complete:
        output == the naive all-pairs containment join on the same
        corpus (the Bayardo-style guarantee, containment variant)."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            containment_pairs,
            hashed_shingles,
        )
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.registry_ext import (
            _near_dup_corpus,
        )

        corpus = _near_dup_corpus(spark, sf_dir)
        got = {
            (r.id_a, r.id_b, r.n_a, r.inter)
            for r in containment_pairs(corpus, "doc_id", "text").collect()
        }
        sh = hashed_shingles(corpus, "text", 3).select("doc_id", "sh")
        ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
        a = ex.select(F.col("doc_id").alias("id_a"), "shingle")
        b = ex.select(F.col("doc_id").alias("id_b"), "shingle")
        naive = (
            a.join(b, "shingle")
            .filter(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("inter"))
            .join(
                sh.select(
                    F.col("doc_id").alias("id_a"),
                    F.size("sh").cast("long").alias("n_a"),
                ),
                "id_a",
            )
            .filter(F.col("inter") * 10 >= 9 * F.col("n_a"))
        )
        exp = {
            (r.id_a, r.id_b, r.n_a, r.inter) for r in naive.collect()
        }
        assert got == exp and got


class TestGramMatrixQuantized:
    def test_hand_computed(self, spark):
        """[[1,0],[3,4]] quantizes to [127,0] and [95,127]:
        S = [[127²+95², 95·127], [·, 127²]]."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            gram_matrix_quantized,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [3.0, 4.0])],
            "vec_id long, embedding array<float>",
        )
        got = {(r.i, r.j): r.s for r in gram_matrix_quantized(df).collect()}
        assert got == {
            (0, 0): 127 * 127 + 95 * 95,
            (0, 1): 95 * 127,
            (1, 1): 127 * 127,
        }

    def test_partitioning_independent(self, spark, sf_dir):
        """Integer partial Grams are associative: any partitioning of
        the corpus sums to the same matrix."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            gram_matrix_quantized,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = {(r.i, r.j): r.s
             for r in gram_matrix_quantized(emb.repartition(2)).collect()}
        b = {(r.i, r.j): r.s
             for r in gram_matrix_quantized(emb.repartition(7)).collect()}
        assert a == b and len(a) == 64 * 65 // 2


class TestDrawdownAndHL:
    def test_drawdown_hand_case(self, spark):
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            drawdown_daily,
        )

        d = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([5, 3, 8, 2])],
            "event_type string, day date, cents long",
        )
        rows = drawdown_daily(d).orderBy("day").collect()
        assert [r.drawdown_cents for r in rows] == [0, 2, 0, 6]
        assert [r.peak_cents for r in rows] == [5, 5, 8, 8]

    def test_hodges_lehmann_hand_case(self, spark):
        """{1,3,5}: Walsh sums [2,4,6,6,8,10], median (rank 3) = 6."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            hodges_lehmann_daily,
        )

        d = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1 + i), c) for i, c in enumerate([1, 3, 5])],
            "event_type string, day date, cents long",
        )
        r = hodges_lehmann_daily(d).collect()[0]
        assert (r.n_pairs, r.hl_x2) == (6, 6)

    def test_hodges_lehmann_outlier_resistant(self, spark):
        """A wild outlier barely moves HL while it drags the mean."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            hodges_lehmann_daily,
        )

        base = [10, 11, 12, 13, 14]
        d1 = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1 + i), c) for i, c in enumerate(base)],
            "event_type string, day date, cents long",
        )
        d2 = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate(base + [100000])],
            "event_type string, day date, cents long",
        )
        hl1 = hodges_lehmann_daily(d1).collect()[0].hl_x2
        hl2 = hodges_lehmann_daily(d2).collect()[0].hl_x2
        assert hl1 == 24  # median Walsh sum of the clean series
        assert abs(hl2 - hl1) <= 2  # outlier shifts HL by <= 1 unit


class TestPackSegments:
    def test_segment_map_invariants(self, spark):
        """The per-bin segment map must tile the stream exactly: every
        bin but the shard's last is full; each doc's segments (in bin
        order) have pos_starts equal to the running prefix of its
        seg_lens and sum to its token count."""
        from collections import defaultdict

        from weather_data_ingestion_service_spark.ext.packing import (
            pack_segments,
        )

        df = spark.createDataFrame(
            [(i, 3 + (i * 7) % 15) for i in range(40)],
            "doc_id long, n_chars long",
        )
        tok = {r.doc_id: r.n_chars for r in df.collect()}
        rows = pack_segments(df, "doc_id", "n_chars", budget=10,
                             n_shards=1).collect()
        last_bin = max(r.bin_id for r in rows)
        bins = defaultdict(list)
        per_doc = defaultdict(list)
        for r in rows:
            bins[(r.shard, r.bin_id)].append(r)
            per_doc[r.doc_id].append((r.bin_id, r.pos_start, r.seg_len))
        for (shard, b), segs in bins.items():
            segs.sort(key=lambda r: r.seg_idx)
            # seg_idx order == seg_start order, tiling contiguously
            run = segs[0].seg_start
            assert run == 0
            for r in segs:
                assert r.seg_start == run
                run += r.seg_len
            if b < last_bin:
                assert run == 10, (b, run)  # every non-final bin full
        for d, segs in per_doc.items():
            segs.sort()
            run = 0
            for _, p, ln in segs:
                assert p == run  # document-reset positions carry over
                run += ln
            assert run == tok[d]


class TestRunsTest:
    def test_hand_computed_runs(self, spark):
        """Series 1,3,2,4,6,5 with a flat tie inserted: signs
        (+,-,+,+,-) after tie-drop -> 4 runs, 3 ups, 2 downs."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            runs_test_daily,
        )

        vals = [1, 3, 2, 4, 4, 6, 5]  # the 4,4 step is a dropped tie
        d = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1) + dt.timedelta(days=i), c)
             for i, c in enumerate(vals)],
            "event_type string, day date, cents long",
        )
        r = runs_test_daily(d).collect()[0]
        # signs: +,-,+,(tie),+,- -> +,-,+,+,- -> runs: +|-|++|- = 4
        assert (r.n_up, r.n_down, r.n_runs) == (3, 2, 4)


class TestLMoments:
    def test_lambda2_matches_gini_mean_difference(self, spark):
        """For {1,2,4}: b0 = 7/3, b1 = (0·1 + 1·2 + 2·4)/(3·2) = 10/6;
        λ2 = 2b1 − b0 = 10/3 − 7/3 = 1 — exactly half the Gini mean
        difference (|1−2|+|1−4|+|2−4|)/3 / 2 = 1.  The published sums
        must reproduce that: s0 = 7, s1 = 10 with n = 3."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            lmoments_daily,
        )

        d = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([4, 1, 2])],
            "event_type string, day date, cents long",
        )
        row = lmoments_daily(d).collect()[0]
        assert (int(row.s0), int(row.s1)) == (7, 10)
        n = 3
        b0 = int(row.s0) / n
        b1 = int(row.s1) / (n * (n - 1))
        assert 2 * b1 - b0 == 1.0

    def test_higher_sums_hand_case(self, spark):
        """{1,2,4,8} in rank order: s2 = 2·4 + 6·8 = 56,
        s3 = 6·8 = 48."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            lmoments_daily,
        )

        d = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([1, 2, 4, 8])],
            "event_type string, day date, cents long",
        )
        row = lmoments_daily(d).collect()[0]
        assert (int(row.s0), int(row.s1), int(row.s2), int(row.s3)) == (
            15, 34, 56, 48,
        )

    def test_long_series_does_not_overflow_rank_polynomial(self, spark):
        """1300 daily rows: (rk−1)(rk−2)(rk−3) reaches ~2.2e9 — past
        int32 — and must flow through the DECIMAL path, not throw
        (review r6 finding; ANSI Spark raised ARITHMETIC_OVERFLOW on
        the int32 multiply)."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            lmoments_daily,
        )

        d = spark.createDataFrame(
            [("t", dt.date(2020, 1, 1) + dt.timedelta(days=i), 1)
             for i in range(1300)],
            "event_type string, day date, cents long",
        )
        row = lmoments_daily(d).collect()[0]
        n = 1300
        assert row.n_days == n and int(row.s0) == n
        # Σ(r−1)(r−2)(r−3) over r=1..n with x=1 is C(n−1,3)·6... check
        # against the closed form n(n−1)(n−2)(n−3)/4
        assert int(row.s3) == n * (n - 1) * (n - 2) * (n - 3) // 4


class TestSpanCorruption:
    def test_spans_non_overlapping_and_within_doc(self, spark, sf_dir):
        """Per doc: spans sit inside their 10-token segments (so never
        overlap), lengths <= 3, and the masked text matches the token
        slice it claims."""
        from collections import defaultdict

        import __spark_entry__ as entry

        df = entry.queries()["ext_span_corruption"](spark, sf_dir)
        from weather_data_ingestion_service_spark.io import load_table

        toks = {
            r.doc_id: r.text.lower().split()
            for r in load_table(spark, sf_dir, "documents").collect()
        }
        per_doc = defaultdict(list)
        for r in df.collect():
            per_doc[r.doc_id].append(r)
        assert per_doc
        for d, rows in per_doc.items():
            seen = set()
            for r in rows:
                seg = r.start_tok // 10
                assert seg == r.span_idx  # span stays in its segment
                assert 1 <= r.span_len <= 3
                assert r.start_tok + r.span_len <= len(toks[d])
                span = set(range(r.start_tok, r.start_tok + r.span_len))
                assert not (span & seen)  # non-overlap
                seen |= span
                assert r.masked_text == " ".join(
                    toks[d][r.start_tok:r.start_tok + r.span_len]
                )


class TestWilcoxon:
    def test_hand_computed_signed_ranks(self, spark):
        """Two types a/b over 4 days: per-day diff for a is
        1·a − b; diffs (2, −4, 6, 0): the zero drops, |diffs| 2,4,6
        rank 1,2,3; a's positives are 2 (rank 1) and 6 (rank 3) →
        W⁺·2 = (2·1+0) + (2·3+0) = 8; b's diffs are the negation →
        only −(−4)=4 (rank 2) is positive → W⁺·2 = 2·2 = 4."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            wilcoxon_one_vs_rest_daily,
        )

        days = [dt.date(2024, 1, 1 + i) for i in range(4)]
        rows = []
        for i, (a, b) in enumerate([(5, 3), (1, 5), (9, 3), (4, 4)]):
            rows += [("a", days[i], a), ("b", days[i], b)]
        d = spark.createDataFrame(
            rows, "event_type string, day date, cents long"
        )
        got = {
            x.event_type: (x.n_pairs, x.wplus_x2)
            for x in wilcoxon_one_vs_rest_daily(d).collect()
        }
        assert got == {"a": (3, 8), "b": (3, 4)}

    def test_mixed_pool_sizes_rank_by_rest_mean_magnitude(self, spark):
        """Cross-day comparability: day1 has 2 types (a=10, b=4 →
        a's own−rest_mean = +6), day2 has 3 types (a=1, b=5, c=6 →
        a's own−rest_mean = 1 − 11/2 = −4.5).  With the lcm-scaled
        rank key, |+6| outranks |−4.5| even though the RAW
        (c−1)-scaled diffs are 6 and −9 — a fixed scaling would
        invert the order.  a: positives {+6 (rank 2 of 2)} →
        W⁺·2 = 2·2 = 4."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            wilcoxon_one_vs_rest_daily,
        )

        d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
        d = spark.createDataFrame(
            [("a", d1, 10), ("b", d1, 4),
             ("a", d2, 1), ("b", d2, 5), ("c", d2, 6)],
            "event_type string, day date, cents long",
        )
        got = {
            x.event_type: (x.n_pairs, x.wplus_x2)
            for x in wilcoxon_one_vs_rest_daily(d).collect()
        }
        # a: diffs +6 (pool 2) and −4.5 (pool 3, stored as −9 with
        # akey 4.5·720720); |6| > |4.5| → the positive diff has rank 2.
        assert got["a"] == (2, 4)


class TestSurvivalKM:
    def test_risk_table_invariants(self, spark, sf_dir):
        """n_risk is non-increasing in duration, n_events <= n_risk,
        total events == closed-session count from the sessionize
        batch twin, and the censored tail (one open session per user)
        is n_risk(0) - total_closed."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.io import load_table

        qs = entry.queries()
        rows = sorted(
            (r.dur_us, r.n_risk, r.n_events)
            for r in qs["agg_survival_km"](spark, sf_dir).collect()
        )
        assert rows
        for (d1, r1, e1), (d2, r2, e2) in zip(rows, rows[1:]):
            assert d1 < d2 and r1 >= r2
        assert all(e <= r for _, r, e in rows)
        total_events = sum(e for _, _, e in rows)
        closed = qs["stream_sessionize_stateful"](spark, sf_dir).count()
        assert total_events == closed
        n_users = (
            load_table(spark, sf_dir, "events").select("user_id").distinct()
            .count()
        )
        # n_risk at the first EVENT duration counts sessions with
        # dur >= it — at most every session (closed + one open tail
        # per user), with equality guaranteed only when that first
        # event sits at the global minimum duration (dur_us == 0).
        assert rows[0][1] <= closed + n_users
        if rows[0][0] == 0:
            assert rows[0][1] == closed + n_users


class TestFleissKappa:
    def test_components_and_kappa_bounds(self, spark, sf_dir):
        import __spark_entry__ as entry

        r = entry.queries()["ext_eval_kappa"](spark, sf_dir).collect()[0]
        n, tot, agree = r.n_items, r.total_keep_votes, r.agree_pairs
        assert 0 <= agree <= 3 * n          # C(3,2) pairs per item
        assert tot == r.c4_keep + r.gopher_keep + r.len_keep
        p_bar = agree / (3 * n)
        p_keep = tot / (3 * n)
        p_e = p_keep ** 2 + (1 - p_keep) ** 2
        if p_e < 1.0:  # unanimous corpus → kappa undefined (0/0)
            kappa = (p_bar - p_e) / (1 - p_e)
            assert -1.0 <= kappa <= 1.0
        else:
            assert agree == 3 * n  # p_e == 1 forces full agreement

    def test_unanimous_corpus_has_full_agreement(self, spark):
        """All three raters keep a long clean doc and drop a short
        one -> agree_pairs == 3 per item."""
        from weather_data_ingestion_service_spark.ext.text import (
            gopher_flags, quality_gate_flags,
        )

        # 60 distinct words, mean length 265/60 ~ 4.42 (inside C4's
        # [4.0, 4.9) band), max token frequency 1 (inside the 12% cap)
        good = " ".join(
            ["the", "and", "with"]
            + [f"ab{i:02d}" for i in range(30)]
            + [f"abc{i:02d}" for i in range(27)]
        )
        df = spark.createDataFrame(
            [(1, good, len(good)), (2, "tiny", 4)],
            "doc_id long, text string, n_chars long",
        )
        c4 = {r.doc_id: r.keep for r in
              quality_gate_flags(df.select("doc_id", "text"), "text").collect()}
        gop = {r.doc_id: r.keep for r in gopher_flags(df).collect()}
        lb = {r.doc_id: 250 <= r.n_chars <= 550 for r in df.collect()}
        assert c4[1] and gop[1] and lb[1]
        assert not (c4[2] or gop[2] or lb[2])

    def test_kappa_marginals_equal_registered_gates(self, spark, sf_dir):
        """Drift canary: the kappa row's per-rater keep counts must
        equal the registered gate queries' own keep counts — if any
        gate restatement drifts, this breaks before the driver does."""
        import __spark_entry__ as entry

        qs = entry.queries()
        r = qs["ext_eval_kappa"](spark, sf_dir).collect()[0]
        c4 = qs["ext_filter_c4"](spark, sf_dir).filter("keep").count()
        gop = qs["ext_filter_gopher"](spark, sf_dir).filter("keep").count()
        assert (r.c4_keep, r.gopher_keep) == (c4, gop)


class TestKendallTau:
    def test_hand_computed_pair_counts(self, spark):
        """n = (1,2,2,3), cents = (10,5,5,20) over 4 days: pairs
        (1,2) disc, (1,3) disc, (1,4) conc, (2,3) both-tie,
        (2,4) conc, (3,4) conc -> 6 pairs, 3 conc, 2 disc, 1 tie_xy."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            kendall_tau_components_daily,
        )

        rows = [
            ("a", dt.date(2024, 1, 1 + i), n, c)
            for i, (n, c) in enumerate([(1, 10), (2, 5), (2, 5), (3, 20)])
        ]
        d = spark.createDataFrame(
            rows, "event_type string, day date, n long, cents long"
        )
        r = kendall_tau_components_daily(d).collect()[0]
        assert (
            r.n_pairs, r.concordant, r.discordant,
            r.ties_x, r.ties_y, r.ties_xy,
        ) == (6, 3, 2, 0, 0, 1)


class TestRSI:
    def test_hand_computed_and_flat_neutral(self, spark):
        """cents (10,12,11,14,14) with a 3-delta frame: deltas
        (+2,-1,+3,0); day4 frame G=5,L=1 -> 5e6//6 = 833333; day5
        frame G=3,L=1 -> 750000.  A flat series pins neutral 500000."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import rsi_daily

        days = [dt.date(2024, 1, 1 + i) for i in range(5)]
        rows = [("a", days[i], c) for i, c in enumerate([10, 12, 11, 14, 14])]
        rows += [("flat", days[i], 7) for i in range(5)]
        d = spark.createDataFrame(
            rows, "event_type string, day date, cents long"
        )
        got = {
            (r.event_type, r.day): r.rsi_micro
            for r in rsi_daily(d, periods=3).collect()
        }
        assert got[("a", days[3])] == 833333
        assert got[("a", days[4])] == 750000
        assert got[("flat", days[3])] == 500000
        assert got[("flat", days[4])] == 500000
        assert len(got) == 4  # rows need a full 3-delta history


class TestHerfindahl:
    def test_even_vs_single_source(self, spark, sf_dir):
        """Registry bounds: 1e6/n_types <= hhi <= 1e6; hand case
        30/10 split -> (900+100)*1e6 // 1600 = 625000."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            q_agg_herfindahl,
        )

        for r in entry.queries()["agg_herfindahl"](spark, sf_dir).collect():
            assert 1000000 // r.n_types <= r.hhi_micro <= 1000000

    def test_hand_computed_split(self, spark):
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            herfindahl_daily,
        )

        d = spark.createDataFrame(
            [("a", dt.date(2024, 1, 1), 30), ("b", dt.date(2024, 1, 1), 10),
             ("a", dt.date(2024, 1, 2), 5)],
            "event_type string, day date, cents long",
        )
        out = {
            r.day.isoformat(): (r.n_types, r.hhi_micro)
            for r in herfindahl_daily(d).collect()
        }
        assert out["2024-01-01"] == (2, 625000)  # (900+100)e6 // 1600
        assert out["2024-01-02"] == (1, 1000000)


class TestZipfHead:
    def test_tie_break_and_products(self, spark):
        """Tokens b,b,a,a,c: freq ties (a,b) break alphabetically ->
        ranks a1 b2 c3, zipf products 2, 4, 3."""
        from weather_data_ingestion_service_spark.registry_r6 import zipf_topk

        docs = spark.createDataFrame(
            [(1, "b b a"), (2, "a c")], "doc_id long, text string"
        )
        rows = [(r.rnk, r.tok, r.freq, r.zipf_product)
                for r in zipf_topk(docs, "text", k=20).collect()]
        assert rows == [(1, "a", 2, 2), (2, "b", 2, 4), (3, "c", 1, 3)]


class TestJackknife:
    def test_hand_computed_loo_means(self, spark, sf_dir):
        """Registry invariants at sf + hand case: cents (10, 20, 60)
        over 3 days -> leave-one-out means (40, 35, 15) in micro-units."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            jackknife_daily,
        )

        d = spark.createDataFrame(
            [("a", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([10, 20, 60])]
            + [("solo", dt.date(2024, 1, 1), 5)],
            "event_type string, day date, cents long",
        )
        got = {
            (r.event_type, r.day.day): r.loo_mean_micro
            for r in jackknife_daily(d).collect()
        }
        assert got == {
            ("a", 1): 40000000, ("a", 2): 35000000, ("a", 3): 15000000,
        }  # the n=1 'solo' key is excluded
        # registry run: every replicate lies within the key's min/max day
        rows = entry.queries()["agg_jackknife"](spark, sf_dir).collect()
        assert rows


class TestCovariancePairs:
    def test_hand_computed_components(self, spark, sf_dir):
        """a=(1,3), b=(2,5) over 2 common days -> n=2, s_a=4, s_b=7,
        s_ab=17 (cov = (2*17 - 4*7)/4 = 1.5 driver-side)."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            covariance_pairs_daily,
        )

        days = [dt.date(2024, 1, 1), dt.date(2024, 1, 2)]
        d = spark.createDataFrame(
            [("a", days[0], 1), ("a", days[1], 3),
             ("b", days[0], 2), ("b", days[1], 5),
             ("c", days[0], 9)],  # c shares only day 1 with a/b
            "event_type string, day date, cents long",
        )
        got = {
            (r.type_a, r.type_b): (r.n_days, r.s_a, r.s_b, int(r.s_ab))
            for r in covariance_pairs_daily(d).collect()
        }
        assert got[("a", "b")] == (2, 4, 7, 17)
        assert got[("a", "c")] == (1, 1, 9, 9)
        assert got[("b", "c")] == (1, 2, 9, 18)
        # registry run sanity: symmetric-pair keys are strictly ordered
        rows = entry.queries()["agg_covariance_pairs"](spark, sf_dir).collect()
        assert all(r.type_a < r.type_b for r in rows)


class TestPoissonBootstrap:
    def test_replicates_deterministic_and_bounded(self, spark, sf_dir):
        """20 replicates, weights in [0,4] (n_eff <= 4n), replicate
        means inside the doc-length range, and the md5 derivation is
        run-to-run identical."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.io import load_table

        q = entry.queries()["ext_sample_bootstrap"]
        rows = sorted((r.replicate_id, r.n_eff, r.mean_chars_micro)
                      for r in q(spark, sf_dir).collect())
        assert [r[0] for r in rows] == list(range(20))
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()
        stats = docs.selectExpr("min(n_chars) lo", "max(n_chars) hi").first()
        for _, n_eff, mean in rows:
            assert 0 < n_eff <= 4 * n
            assert stats.lo * 1000000 <= mean <= stats.hi * 1000000
        again = sorted((r.replicate_id, r.n_eff, r.mean_chars_micro)
                       for r in q(spark, sf_dir).collect())
        assert rows == again


class TestSkyline2D:
    def test_dominance_and_hand_front(self, spark, sf_dir):
        """Points (1,5) (2,5) (3,1): (1,5) is weakly dominated by
        (2,5) (same y, larger x); front = {(2,5), (3,1)}.  Registry
        invariant: along the front x increases and y strictly
        decreases."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            skyline_front,
        )

        t = spark.createDataFrame(
            [(1, 5), (2, 5), (3, 1), (2, 3)], "x long, y long"
        )
        front = sorted(
            (r.x, r.y, r.n_docs) for r in skyline_front(t).collect()
        )
        assert front == [(2, 5, 1), (3, 1, 1)]
        rows = entry.queries()["agg_skyline_2d"](spark, sf_dir).collect()
        xs = [r.n_chars for r in rows]
        ys = [r.distinct_tokens for r in rows]
        assert xs == sorted(xs) and len(set(xs)) == len(xs)
        assert all(a > b for a, b in zip(ys, ys[1:]))  # strictly decreasing


class TestCharStatsArrow:
    def test_registry_invariants(self, spark, sf_dir):
        """Corpus-level invariants: 1 <= distinct <= total code
        points, modal freq bounded, and the pigeonhole identity."""
        import __spark_entry__ as entry

        rows = entry.queries()["ext_text_charstats"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r.n_distinct_chars <= r.n_cp
            assert 1 <= r.max_char_freq <= r.n_cp
            # pigeonhole: distinct * modal-freq >= total
            assert r.n_distinct_chars * r.max_char_freq >= r.n_cp

    def test_kernel_matches_python_counter(self, spark):
        from weather_data_ingestion_service_spark.registry_r6 import (
            charstats,
        )

        docs = spark.createDataFrame(
            [(1, "aab"), (2, "čč š"), (3, ""), (4, "xyz")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_cp, r.n_distinct_chars, r.max_char_freq)
            for r in charstats(docs).collect()
        }
        assert got == {1: (3, 2, 2), 2: (4, 3, 2), 4: (3, 3, 1)}

    def test_all_empty_first_batch_keeps_schema(self, spark):
        """Regression: a partition whose FIRST Arrow batch holds only
        empty docs must not poison the stream schema (explicit
        pa.schema in the kernel) — forced with 1-row batches so the
        empty doc arrives alone before a real one."""
        from weather_data_ingestion_service_spark.registry_r6 import (
            charstats,
        )

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                             None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
        try:
            docs = spark.createDataFrame(
                [(1, ""), (2, "ab")], "doc_id long, text string"
            ).coalesce(1)
            got = {r.doc_id: r.n_cp for r in charstats(docs).collect()}
            assert got == {2: 2}
        finally:
            if old is None:
                spark.conf.unset(
                    "spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", old)


class TestLongestStreak:
    def test_hand_computed_islands(self, spark, sf_dir):
        """User u: types A A B A A A -> longest 3 (A); user v:
        B B and A A tie at 2 -> type asc picks A."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.registry_r6 import (
            longest_streak_per_user,
        )
        from pyspark.sql import functions as F

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("u", t, base + dt.timedelta(minutes=i), i)
            for i, t in enumerate(["A", "A", "B", "A", "A", "A"])
        ] + [
            ("v", t, base + dt.timedelta(minutes=i), 100 + i)
            for i, t in enumerate(["B", "B", "A", "A"])
        ]
        ev = spark.createDataFrame(
            rows, "user_id string, event_type string, ts timestamp,"
            " event_id long"
        )
        got = {
            r.user_id: (r.streak_type, r.longest_streak)
            for r in longest_streak_per_user(ev).collect()
        }
        assert got == {"u": ("A", 3), "v": ("A", 2)}
        # registry invariants: streak <= user's busiest type count
        out = {r.user_id: (r.streak_type, r.longest_streak)
               for r in entry.queries()["win_longest_streak"](
                   spark, sf_dir).collect()}
        counts = {
            (r.user_id, r.event_type): r.c
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("c")).collect()
        }
        for uid, (typ, ln) in out.items():
            assert 1 <= ln <= counts[(uid, typ)]


class TestGiniVolume:
    def test_hand_computed_components_and_bounds(self, spark, sf_dir):
        """cents (10, 30, 60): ranks 1,2,3 -> s=100, sr=1*10+2*30+3*60
        = 250; G = (2*250 - 4*100)/(3*100) = 1/3.  Equal series ->
        G = 0.  Registry: 0 <= G < 1 for every key."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            gini_volume_daily,
        )

        def gini(n, s, sr):
            return (2 * sr - (n + 1) * s) / (n * s)

        d = spark.createDataFrame(
            [("a", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([10, 30, 60])]
            + [("flat", dt.date(2024, 1, 1 + i), 5) for i in range(4)],
            "event_type string, day date, cents long",
        )
        got = {
            r.event_type: (r.n_days, r.s, int(r.sr))
            for r in gini_volume_daily(d).collect()
        }
        assert got["a"] == (3, 100, 250)
        assert abs(gini(*got["a"]) - 1 / 3) < 1e-12
        assert abs(gini(*got["flat"])) < 1e-12
        for r in entry.queries()["agg_gini_volume"](spark, sf_dir).collect():
            if r.s == 0:  # all-zero-cents key: G undefined (0/0)
                continue
            g = gini(r.n_days, r.s, int(r.sr))
            assert 0 <= g < 1


class TestHapax:
    def test_hand_computed_tail_mass(self, spark, sf_dir):
        """'a a b c' + 'c d': freqs a2 b1 c2 d1 -> vocab 4, tokens 6,
        hapax {b,d}=2, dis {a,c}=2, ratio 2e6//4 = 500000."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            hapax_stats,
        )

        docs = spark.createDataFrame(
            [(1, "a a b c"), (2, "c d")], "doc_id long, text string"
        )
        r = hapax_stats(docs, "text").collect()[0]
        assert (r.vocab_size, r.total_tokens, r.n_hapax, r.n_dis,
                r.hapax_ratio_micro) == (4, 6, 2, 2, 500000)
        # synthetic corpus: templated closed vocabulary -> 0 hapax is
        # legitimate; assert the structural bounds only
        out = entry.queries()["ext_text_hapax"](spark, sf_dir).collect()[0]
        assert 0 <= out.n_hapax <= out.vocab_size <= out.total_tokens
        assert 0 <= out.hapax_ratio_micro <= 1000000


class TestEpochShuffle:
    def test_permutation_laws(self, spark, sf_dir):
        """Each epoch is a PERMUTATION of the corpus (every doc exactly
        once), positions within each (epoch, shard) are dense 0..k-1,
        the two epochs realize DIFFERENT orders, and the assignment is
        run-to-run identical."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.io import load_table

        q = entry.queries()["ext_epoch_shuffle"]
        rows = [(r.epoch, r.shard, r.pos, r.doc_id)
                for r in q(spark, sf_dir).collect()]
        n = load_table(spark, sf_dir, "documents").count()
        by_epoch = {}
        for e, s, p, d in rows:
            by_epoch.setdefault(e, []).append((s, p, d))
        assert set(by_epoch) == {0, 1}
        for e, lst in by_epoch.items():
            assert sorted(d for _, _, d in lst) == sorted(
                set(d for _, _, d in lst))
            assert len(lst) == n  # permutation: every doc once
            shard_pos = {}
            for s, p, _ in lst:
                shard_pos.setdefault(s, []).append(p)
            for s, ps in shard_pos.items():
                assert sorted(ps) == list(range(len(ps)))  # dense
        order0 = [d for _, _, d in sorted(by_epoch[0])]
        order1 = [d for _, _, d in sorted(by_epoch[1])]
        assert order0 != order1  # epochs differ
        again = [(r.epoch, r.shard, r.pos, r.doc_id)
                 for r in q(spark, sf_dir).collect()]
        assert rows == again  # deterministic

    def test_kernel_respects_params(self, spark):
        from weather_data_ingestion_service_spark.registry_r6 import (
            epoch_shuffle,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(10)], "doc_id long"
        )
        out = epoch_shuffle(docs, "doc_id", n_epochs=3, n_shards=2)
        rows = out.collect()
        assert len(rows) == 30
        assert {r.epoch for r in rows} == {0, 1, 2}
        assert {r.shard for r in rows} <= {0, 1}


class TestSeasonalResidual:
    def test_residuals_sum_near_zero_per_weekday(self, spark, sf_dir):
        """Within each (key, weekday) bucket the residuals sum to the
        floor-division remainder only: |sum| < n (each term's truncation
        loses < 1 micro-unit x n days), and a flat series gives exactly
        zero."""
        import datetime as dt

        import __spark_entry__ as entry

        rows = entry.queries()["win_seasonal_residual"](
            spark, sf_dir).collect()
        assert rows
        bucket = {}
        for r in rows:
            k = (r.event_type, r.day.weekday())
            bucket.setdefault(k, []).append(r.residual_micro)
        for k, vals in bucket.items():
            assert abs(sum(vals)) < len(vals) * 1000000  # remainder bound
        # flat hand series -> all-zero residuals through the shipped
        # kernel (weekday mean == every day's value)
        from weather_data_ingestion_service_spark.registry_r6 import (
            seasonal_residual_daily,
        )

        d = spark.createDataFrame(
            [("k", dt.date(2024, 1, 1 + i), 7) for i in range(14)],
            "event_type string, day date, cents long",
        )
        res = seasonal_residual_daily(d).collect()
        assert len(res) == 14
        assert all(r.residual_micro == 0 for r in res)


class TestCountMinSketch:
    def test_one_sided_guarantee_and_hand_case(self, spark, sf_dir):
        """CMS never undercounts: est >= true for every probe, both
        on the corpus and on a hand frame where collisions are
        forced (w=1 -> every estimate equals the total token count)."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            cms_estimate_topk,
        )

        for r in entry.queries()["ext_sketch_cms"](spark, sf_dir).collect():
            assert r.cms_est >= r.true_freq
        docs = spark.createDataFrame(
            [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
        )
        # w=1: single bucket per row -> every est == 6 (total tokens)
        got = {r.tok: (r.true_freq, r.cms_est)
               for r in cms_estimate_topk(docs, "text", d=2, w=1, k=3)
               .collect()}
        assert got == {"a": (3, 6), "b": (2, 6), "c": (1, 6)}
        # wide sketch: no collisions among 3 tokens is overwhelmingly
        # likely at w=256; estimates then equal true counts
        wide = {r.tok: (r.true_freq, r.cms_est)
                for r in cms_estimate_topk(docs, "text", d=3, w=256, k=3)
                .collect()}
        for tok, (t, e) in wide.items():
            assert e >= t


class TestDistinctSketch:
    def test_components_laws(self, spark, sf_dir):
        """lc_used <= min(true_distinct, buckets); kmv_k = min(16, V);
        the KMV estimate (k-1)*2^60/h_k lands within a loose factor of
        the truth when k == 16; hand case with 3 tokens pins the
        degenerate k > V branch (kth hash = max of all three)."""
        import math

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            distinct_sketch_components,
        )

        r = entry.queries()["ext_sketch_distinct"](spark, sf_dir).collect()[0]
        assert r.lc_used <= min(r.true_distinct, r.lc_buckets)
        assert r.kmv_k == min(16, r.true_distinct)
        if r.kmv_k == 16:
            est = (r.kmv_k - 1) * (1 << 60) / r.kmv_kth_hash
            assert r.true_distinct / 8 <= est <= r.true_distinct * 8
        # linear-counting estimate recovers the truth when V << w
        if r.true_distinct < r.lc_buckets // 2:
            lc_est = -r.lc_buckets * math.log(
                (r.lc_buckets - r.lc_used) / r.lc_buckets
            )
            assert abs(lc_est - r.true_distinct) <= max(
                5, 0.3 * r.true_distinct
            )
        docs = spark.createDataFrame(
            [(1, "x y"), (2, "y z")], "doc_id long, text string"
        )
        hand = distinct_sketch_components(docs, "text").collect()[0]
        assert (hand.true_distinct, hand.lc_used, hand.kmv_k) == (3, 3, 3)


class TestStreamSketchCMS:
    def test_guarantee_and_totals(self, spark, sf_dir):
        """est >= true per event type, and the sketch's total mass
        equals the event count (cells are sums of occurrences)."""
        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.io import load_table

        rows = entry.queries()["stream_sketch_cms"](spark, sf_dir).collect()
        assert rows
        n_events = load_table(spark, sf_dir, "events").count()
        for r in rows:
            assert r.cms_est >= r.true_freq
        assert sum(r.true_freq for r in rows) == n_events


class TestSeasonalMK:
    def test_hand_case_and_cycle_robustness(self, spark, sf_dir):
        """A pure weekly cycle (same value every Monday, etc.) has
        S' = 0 while plain MK would see spurious pairs; a per-weekday
        increasing series has every same-season pair concordant."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            seasonal_mk_daily,
        )

        base = dt.date(2024, 1, 1)  # a Monday
        cyc = [("cyc", base + dt.timedelta(days=i), 10 + (i % 7))
               for i in range(28)]
        inc = [("inc", base + dt.timedelta(days=i), i)
               for i in range(28)]
        d = spark.createDataFrame(
            cyc + inc, "event_type string, day date, cents long"
        )
        got = {r.event_type: (r.n_seasons, r.n_pairs, r.s_seasonal)
               for r in seasonal_mk_daily(d).collect()}
        # 28 days = 4 of each weekday -> C(4,2)*7 = 42 pairs
        assert got["cyc"] == (7, 42, 0)   # flat within every stratum
        assert got["inc"] == (7, 42, 42)  # all concordant
        for r in entry.queries()["agg_trend_seasonal_mk"](
                spark, sf_dir).collect():
            assert abs(r.s_seasonal) <= r.n_pairs
            assert 1 <= r.n_seasons <= 7


class TestSpellLengths:
    def test_hand_computed_runs_even_n(self, spark, sf_dir):
        """cents (1,9,9,2) over 4 days: median = rank (4+1) DIV 2 = 2
        under (cents, day) -> 2; above-flags (0,1,1,0) -> above side
        1 spell of 2, below side 2 spells of max 1.  Even n exercises
        the DIV selection (a float division would drop the key)."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            spell_lengths_daily,
        )

        d = spark.createDataFrame(
            [("k", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([1, 9, 9, 2])],
            "event_type string, day date, cents long",
        )
        got = {(r.event_type, r.above):
               (r.n_spells, r.max_spell, r.total_days)
               for r in spell_lengths_daily(d).collect()}
        assert got[("k", 1)] == (1, 2, 2)
        assert got[("k", 0)] == (2, 1, 2)
        # registry invariants: per key the two sides partition the days
        rows = entry.queries()["agg_spell_lengths"](spark, sf_dir).collect()
        per_key = {}
        for r in rows:
            per_key.setdefault(r.event_type, 0)
            per_key[r.event_type] += r.total_days
            assert r.max_spell <= r.total_days
        assert len(set(per_key.values())) == 1  # same day count per key


class TestReverseGeocode:
    def test_nearest_and_tie_break(self, spark, sf_dir):
        """A point exactly at an anchor has distance 0 to it; a point
        equidistant between two anchors snaps to the LOWER id; the
        registry run resolves every customer to a valid anchor."""
        import __spark_entry__ as entry
        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.fixtures import LATS
        from weather_data_ingestion_service_spark.operators.spatial import (
            nearest_anchor_sql,
        )

        anchors = [(0, 0, 0), (1, 1000, 0)]
        dist, aid = nearest_anchor_sql("px", "py", anchors)
        pts = spark.createDataFrame(
            [(1, 0, 0), (2, 500, 0), (3, 900, 10)], "k long, px long, py long"
        )
        got = {
            r.k: (r.d, r.a)
            for r in pts.select(
                "k", "px", "py", F.expr(dist).alias("__nd")
            )
            .select("k", F.col("__nd").alias("d"), F.expr(aid).alias("a"))
            .collect()
        }
        assert got[1] == (0, 0)    # exactly at anchor 0
        assert got[2] == (500, 0)  # equidistant -> lowest id wins
        assert got[3] == (100, 1)
        rows = entry.queries()["join_geocode_reverse"](
            spark, sf_dir).collect()
        assert rows and all(0 <= r.nearest_id < len(LATS) for r in rows)
        assert all(r.linf_micro >= 0 for r in rows)


class TestGeohash:
    @staticmethod
    def _ref(lat, lon, length=5):
        """Independent bisection reference (the textbook algorithm)."""
        alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
        bits, out, even, ch = 0, "", True, 0
        while len(out) < length:
            rng, v = (lon_r, lon) if even else (lat_r, lat)
            mid = (rng[0] + rng[1]) / 2
            if v >= mid:
                ch, rng[0] = ch * 2 + 1, mid
            else:
                ch, rng[1] = ch * 2, mid
            even = not even
            bits += 1
            if bits == 5:
                out += alphabet[ch]
                bits, ch = 0, 0
        return out

    def test_matches_bisection_reference(self, spark, sf_dir):
        """The staged bit expression equals the textbook bisection
        geohash, including the canonical u4pru example, and every
        registry row re-derives through the reference."""
        import __spark_entry__ as entry
        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.registry_r6 import (
            _geohash5_parts,
        )

        bx, by, z, chars = _geohash5_parts("lon", "lat")
        pts = [(10.40744, 57.64911), (-5.6, -70.2), (0.0, 0.0),
               (179.99999, 89.99999), (-180.0, -90.0)]
        df = (
            spark.createDataFrame(pts, "lon double, lat double")
            .select("lon", "lat",
                    F.expr(bx).alias("__bx"), F.expr(by).alias("__by"))
            .select("lon", "lat", F.expr(z).alias("__z"))
            .select("lon", "lat", F.expr(chars).alias("gh5"))
        )
        for r in df.collect():
            assert r.gh5 == self._ref(r.lat, r.lon), (r.lon, r.lat)
        assert self._ref(57.64911, 10.40744) == "u4pru"  # spec anchor
        rows = entry.queries()["f_geohash"](spark, sf_dir).collect()
        assert rows
        for r in rows[:50]:
            # lat reconstruction needs acctbal; check alphabet/shape only
            assert len(r.gh5) == 5
            assert all(c in "0123456789bcdefghjkmnpqrstuvwxyz"
                       for c in r.gh5)


class TestSequenceCount:
    def test_hand_greedy_matching(self, spark, sf_dir):
        """Sequences: BAB -> 1 match (A pairs the later B), ABB -> 1,
        AABB -> 2, BB -> 0; brute-force greedy agrees on the registry
        output for 20 users."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.registry_r6 import (
            sequence_pair_counts,
        )

        base = dt.datetime(2024, 1, 1)
        seqs = {"u1": "BAB", "u2": "ABB", "u3": "AABB", "u4": "BB"}
        rows = []
        eid = 0
        for u, s in seqs.items():
            for i, t in enumerate(s):
                rows.append((u, t, base + dt.timedelta(minutes=i), eid))
                eid += 1
        ev = spark.createDataFrame(
            rows, "user_id string, event_type string, ts timestamp,"
            " event_id long",
        )
        got = {r.user_id: (r.n_a, r.n_b, r.n_matched)
               for r in sequence_pair_counts(ev).collect()}
        assert got == {"u1": (1, 2, 1), "u2": (1, 2, 1),
                       "u3": (2, 2, 2), "u4": (0, 2, 0)}

        def greedy(seq):
            open_a = matched = 0
            for t in seq:
                if t == "A":
                    open_a += 1
                elif t == "B" and open_a:
                    open_a -= 1
                    matched += 1
            return matched

        for u, s in seqs.items():
            assert got[u][2] == greedy(s)
        # registry invariants: matched <= min(n_a, n_b)
        ev_full = load_table(spark, sf_dir, "events")
        types = sorted(
            r.event_type
            for r in ev_full.select("event_type").distinct().collect()
        )
        out = entry.queries()["win_sequence_count"](spark, sf_dir).collect()
        for r in out:
            assert 0 <= r.n_matched <= min(r.n_a, r.n_b)
        # per-user totals of A and B match the raw counts
        a, b = types[0], types[1]
        raw = {
            (r.user_id, r.event_type): r.c
            for r in ev_full.filter(F.col("event_type").isin(a, b))
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("c")).collect()
        }
        for r in out:
            assert r.n_a == raw.get((r.user_id, a), 0)
            assert r.n_b == raw.get((r.user_id, b), 0)


class TestHurstComponents:
    def test_hand_computed_range(self, spark, sf_dir):
        """cents (4, 0, 2): S=6, n=3, mean=2; Z·n at t=1..3:
        3*4-1*6=6, 3*4-2*6=0, 3*6-3*6=0 -> max 6, min 0 ->
        range_xn = 6.  A constant series has range_xn = 0."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            hurst_components_daily,
        )

        d = spark.createDataFrame(
            [("k", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([4, 0, 2])]
            + [("flat", dt.date(2024, 1, 1 + i), 5) for i in range(4)],
            "event_type string, day date, cents long",
        )
        got = {r.event_type: (r.n_days, r.s, int(r.sum_sq), int(r.range_xn))
               for r in hurst_components_daily(d).collect()}
        assert got["k"] == (3, 6, 20, 6)
        assert got["flat"] == (4, 20, 100, 0)
        # registry invariants: R >= 0 and sigma > 0 implies R/S finite
        for r in entry.queries()["agg_hurst_components"](
                spark, sf_dir).collect():
            assert int(r.range_xn) >= 0
            # n*sum_sq - s^2 = n^2 * variance >= 0
            assert r.n_days * int(r.sum_sq) - r.s * r.s >= 0


class TestVariogram:
    def test_hand_computed_lags(self, spark, sf_dir):
        """cents (1, 4, 2): lag-1 diffs (3, -2) -> n=2, sum 13;
        lag-2 diff (1) -> n=1, sum 1; lag>=3 absent."""
        import datetime as dt

        import __spark_entry__ as entry
        from weather_data_ingestion_service_spark.registry_r6 import (
            variogram_daily,
        )

        d = spark.createDataFrame(
            [("k", dt.date(2024, 1, 1 + i), c)
             for i, c in enumerate([1, 4, 2])],
            "event_type string, day date, cents long",
        )
        got = {r.lag_k: (r.n_pairs, int(r.sum_sq_diff))
               for r in variogram_daily(d).collect()}
        assert got == {1: (2, 13), 2: (1, 1)}
        # registry invariants: n_pairs(k) = n_days - k for every key
        rows = entry.queries()["agg_variogram"](spark, sf_dir).collect()
        per_key = {}
        for r in rows:
            per_key.setdefault(r.event_type, {})[r.lag_k] = r.n_pairs
            assert int(r.sum_sq_diff) >= 0
        for key, lags in per_key.items():
            # a key with n daily rows legitimately emits only lags
            # 1..min(7, n-1) — don't assume 8+ days per key
            kmin = min(lags)
            n = lags[kmin] + kmin
            assert lags == {
                k: n - k for k in range(1, 8) if n - k >= 1
            }


class TestRound9Ops:
    def test_degree_oriented_edges_exactly_once_and_hub_balanced(self, spark):
        """Every undirected pair appears exactly once in the oriented
        output, oriented low-(degree, id) → high; a unique-max-degree
        hub therefore has OUT-degree 0 — the wedge-balance property
        the triangle census rides."""
        from weather_data_ingestion_service_spark.registry_r8 import (
            degree_oriented_edges,
        )

        # hub 50 connected to 1..6, plus chain 1-2, 2-3 (deg(2)=3)
        pairs = [(min(a, b), max(a, b)) for a, b in
                 [(50, i) for i in range(1, 7)] + [(1, 2), (2, 3)]]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = [(r.x, r.y) for r in degree_oriented_edges(df).collect()]
        assert len(got) == len(pairs)
        assert sorted((min(x, y), max(x, y)) for x, y in got) == sorted(pairs)
        deg = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        for x, y in got:
            assert (deg[x], x) < (deg[y], y)
        assert not [1 for x, _ in got if x == 50]  # hub owns no wedge

    def test_audio_exact_stats_consistent_with_float_decode(self, spark, sf_dir):
        """The exact-integer twin and the float decoder must describe
        the same signal: identical peak/zero-crossings/duration and
        rms == sqrt(ssq/n) bit-for-bit (numpy computes it the same
        way)."""
        import math

        from weather_data_ingestion_service_spark.ext.multimodal import (
            audio_exact_stats,
            decode_audio_features,
            synth_wav_payload,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 8)
        wav = synth_wav_payload(docs, "doc_id")
        exact = {r.doc_id: r for r in audio_exact_stats(wav, "doc_id").collect()}
        flt = {r.doc_id: r for r in decode_audio_features(wav, "doc_id").collect()}
        assert set(exact) == set(flt) == set(range(8))
        for i in exact:
            e, f = exact[i], flt[i]
            assert (e.peak, e.zero_crossings, e.duration_ms, e.n_samples) == (
                f.peak, f.zero_crossings, f.duration_ms, f.n_samples
            )
            # ssq sums ALL interleaved channel samples; rms divides by
            # the same count (frames alone would overstate by sqrt(nch))
            assert abs(
                math.sqrt(e.ssq / (e.n_samples * e.n_channels)) - f.rms
            ) < 1e-9

    def test_bm25_matches_hand_computed(self, spark):
        """BM25 on a 3-doc corpus against the textbook formula
        computed by hand in Python (same glibc ln)."""
        import math

        from weather_data_ingestion_service_spark.ext.text import bm25_topk

        corpus = [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "apple apple apple banana cherry date"),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        # df: apple 2, banana 3, cherry 2, date 1 → rank by (df desc,
        # term asc): banana(1), apple(2), cherry(3), date(4)
        got = {
            r.doc_id: (r.dl, r.score_micro)
            for r in bm25_topk(
                df, "doc_id", "text", n_terms=2, skip_head=1, k=3
            ).collect()
        }
        # query = ranks 2..3 = [apple, cherry]
        n, avgdl = 3, (3 + 2 + 6) / 3
        tf = {0: {"apple": 2, "cherry": 0}, 1: {"apple": 0, "cherry": 1},
              2: {"apple": 3, "cherry": 1}}
        dl = {0: 3, 1: 2, 2: 6}
        idf = {t: math.log((n - d + 0.5) / (d + 0.5) + 1.0)
               for t, d in (("apple", 2), ("cherry", 2))}
        for i in (0, 1, 2):
            s = 0.0
            for t in ("apple", "cherry"):  # fixed rank order
                tfv = float(tf[i][t])
                s = s + idf[t] * (
                    (tfv * 2.2)
                    / (tfv + 1.2 * (0.25 + 0.75 * (float(dl[i]) / avgdl)))
                )
            assert got[i] == (dl[i], math.floor(1e6 * s))

    def test_quantile_bounds_brackets_hold_engine_side(self, spark, sf_dir):
        """Every group's GK p50/p90 must sit inside its exact rank
        bracket and lo <= hi — the contract the driver hash-checks,
        pinned here without DuckDB in the loop."""
        import __spark_entry__ as entry

        rows = entry.queries()["agg_quantile_bounds"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.p50_lo_cents <= r.p50_hi_cents
            assert r.p90_lo_cents <= r.p90_hi_cents
            assert r.p50_ok and r.p90_ok, r


class TestRound10Ops:
    def test_ivfpq_index_query_matches_inline_twin(self, spark, sf_dir):
        """The lifecycle split (persisted integer codes + literal-map
        decode) must reproduce the inline IVF-PQ twin's output
        BIT-FOR-BIT: same codebook, same total orders, same fixed-order
        ADC chain — any drift means the persisted index answers
        differently from the plan it claims to amortize."""
        import shutil
        import tempfile

        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.ext.simsearch import (
            ivfpq_build_index,
            ivfpq_query_index,
            ivfpq_topk_md5,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        q5 = emb.filter(F.col("vec_id") < 5)
        path = tempfile.mkdtemp(prefix="wds_ivfpq_idx_test_")
        try:
            ivfpq_build_index(emb, path)
            got = sorted(
                (r.query_id, r.match_id, r.adc, r.rank)
                for r in ivfpq_query_index(
                    spark, path, q5, k=3, nprobe=4, m=8
                ).collect()
            )
            want = sorted(
                (r.query_id, r.match_id, r.adc, r.rank)
                for r in ivfpq_topk_md5(
                    emb, q5, k=3, n_clusters=16, nprobe=4, m=8
                ).collect()
            )
            assert got == want
        finally:
            shutil.rmtree(path, ignore_errors=True)

    def test_ivfpq_codes_are_small_ints_per_vector(self, spark, sf_dir):
        """The persisted-index form: one row per corpus vector, the
        coarse id plus m integer codebook ids, every code a member of
        the 16-entry codebook — the ~4-byte/vector compression claim."""
        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.ext.simsearch import (
            _md5_codebook,
            ivfpq_encode_codes,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        codes = ivfpq_encode_codes(emb, "vec_id", "embedding")
        n = emb.count()
        assert codes.count() == n
        cids = {
            r.cid for r in _md5_codebook(emb, "vec_id", "embedding", 16).collect()
        }
        bad = codes.filter(
            ~F.col("cid").isin(list(cids))
            | ~F.col("c0").isin(list(cids))
            | ~F.col("c7").isin(list(cids))
        )
        assert bad.count() == 0

    def test_power_iteration_hand_matrix(self, spark, sf_dir):
        """Hand-checkable 2x2-in-64 fixture: S = diag-dominant with a
        single dominant direction along e0+e1 — after a few rounds the
        integer vector must align with it (v0 == v1 == unit, rest 0)."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            power_iteration_int,
        )

        rows = [(0, 0, 2), (0, 1, 2), (1, 1, 2)]  # upper triangle
        gram = spark.createDataFrame(rows, "i long, j long, s long")
        got = {r.idx: r.v_unit for r in power_iteration_int(gram).collect()}
        assert got[0] == 1_000_000 and got[1] == 1_000_000
        assert all(got[i] == 0 for i in range(2, 64))

    def test_power_iteration_floor_semantics_negative(self, spark, sf_dir):
        """Negative components must floor (CPython //), not truncate:
        S = [[0, -1], [-1, 0]]-ish forces sign flips every round; pin
        the exact integer output against a hand replay."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            power_iteration_int,
        )

        rows = [(0, 0, 3), (0, 1, -2), (1, 1, 3)]
        gram = spark.createDataFrame(rows, "i long, j long, s long")
        got = {r.idx: r.v_unit for r in power_iteration_int(gram).collect()}
        S = [[0] * 64 for _ in range(64)]
        S[0][0] = S[1][1] = 3
        S[0][1] = S[1][0] = -2
        v = [1_000_000] * 64
        for _ in range(8):
            w = [sum(S[i][j] * v[j] for j in range(64)) for i in range(64)]
            m = max(abs(x) for x in w)
            v = [(x * 1_000_000) // m for x in w]
        assert [got[i] for i in range(64)] == v

    def test_hll_bounds_verdict_holds_engine_side(self, spark, sf_dir):
        """Every group's HLL estimate must sit inside its 5-sigma
        bracket and lo <= hi — the contract the driver hash-checks,
        pinned here without DuckDB in the loop."""
        import __spark_entry__ as entry

        rows = entry.queries()["agg_distinct_bounds"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.hll_lo <= r.n_exact <= r.hll_hi
            assert r.hll_ok, r

    def test_resize_exact_detects_pixel_transposition(self, spark, sf_dir):
        """The position-weighted checksum is the load-bearing half:
        swapping two distinct pixel VALUES keeps px_sum but must flip
        px_wsum (a plain sum would pass the corruption)."""
        from weather_data_ingestion_service_spark.ext.multimodal import (
            _encode_png_stdlib,
            image_resize_exact_stats,
        )

        px = bytearray(range(48))  # 4x4 RGB, all-distinct values
        a = _encode_png_stdlib(bytes(px), 4, 4, 3)
        swapped = bytearray(px)
        swapped[0], swapped[47] = swapped[47], swapped[0]
        b = _encode_png_stdlib(bytes(swapped), 4, 4, 3)
        df = spark.createDataFrame(
            [(1, bytearray(a)), (2, bytearray(b))], "doc_id long, payload binary"
        )
        got = {
            r.doc_id: (r.px_sum, r.px_wsum)
            for r in image_resize_exact_stats(df).collect()
        }
        assert got[1][0] == got[2][0]
        assert got[1][1] != got[2][1]

    def test_bpe_train_driver_path_matches_distributed(self, spark, sf_dir):
        """The size-adaptive switch must be invisible in the result
        (the dedup_clusters/pagerank_int rule): force the distributed
        per-round loop with driver_max_words=0 and compare the merge
        table bit-for-bit against the driver fast path."""
        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.ext.text import bpe_train
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 8
        )
        fast = [tuple(r) for r in bpe_train(docs, "text", n_merges=6).collect()]
        dist = [
            tuple(r)
            for r in bpe_train(
                docs, "text", n_merges=6, driver_max_words=0
            ).collect()
        ]
        assert fast == dist and len(fast) == 6

    def test_idw_bounded_by_neighbor_values(self, spark, sf_dir):
        """IDW is a convex combination: every interpolated value must
        lie within [min, max] of its 3 neighbor station values."""
        import __spark_entry__ as entry

        from weather_data_ingestion_service_spark.registry_r10 import (
            _idw_station_values,
        )

        sv = _idw_station_values()
        rows = entry.queries()["join_idw_interpolation"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 200
        for r in rows:
            nb = [sv[r.s1], sv[r.s2], sv[r.s3]]
            assert min(nb) * 1_000_000 - 1 <= r.idw_micro <= max(nb) * 1_000_000
            assert r.dd1 <= r.dd2 <= r.dd3

    def test_power_iteration_partitioning_invariant(self, spark, sf_dir):
        """Exact integer state makes the eigensolve a pure function of
        the Gram matrix — repartitioning the triangle frame (different
        collect order) must not move a single component."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            gram_matrix_quantized,
            power_iteration_int,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        g = gram_matrix_quantized(emb, "vec_id", "embedding").persist()
        try:
            a = sorted(map(tuple, power_iteration_int(g).collect()))
            b = sorted(
                map(tuple, power_iteration_int(g.repartition(7)).collect())
            )
        finally:
            g.unpersist()
        assert a == b

    def test_ivfpq_encode_batching_invariant(self, spark, sf_dir):
        """The streaming-maintenance correctness argument, pinned
        directly: encoding is per-row against a fixed codebook, so
        encode(partA) UNION encode(partB) must equal encode(all) for
        an arbitrary split — the property that makes
        stream_simsearch_index's shared-verbatim oracle exact for ANY
        micro-batch boundaries."""
        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.ext.simsearch import (
            _md5_codebook,
            ivfpq_encode_codes,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cent = emb.sparkSession.createDataFrame(
            _md5_codebook(emb, "vec_id", "embedding", 16).collect(),
            "cid long, ce array<float>",
        )
        whole = {
            tuple(r)
            for r in ivfpq_encode_codes(
                emb, "vec_id", "embedding", cent=cent
            ).collect()
        }
        # arbitrary uneven split (md5-keyed, ~1/3 vs ~2/3)
        key = F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("long")
        a = emb.filter(key % 3 == 0)
        b = emb.filter(key % 3 != 0)
        parts = set()
        for p in (a, b):
            parts |= {
                tuple(r)
                for r in ivfpq_encode_codes(
                    p, "vec_id", "embedding", cent=cent
                ).collect()
            }
        assert parts == whole

    def test_kmeans_fixedpoint_paths_identical(self, spark, sf_dir):
        """The size-adaptive switch must be invisible (the pagerank
        rule): force the distributed broadcast-centroid loop with
        driver_max_vectors=0 and compare against the driver loop
        bit-for-bit."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            kmeans_fixedpoint_int,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = sorted(map(tuple, kmeans_fixedpoint_int(emb).collect()))
        b = sorted(
            map(
                tuple,
                kmeans_fixedpoint_int(emb, driver_max_vectors=0).collect(),
            )
        )
        assert a == b and len(a) == 8 * 64

    def test_kmeans_empty_cluster_carry_cross_engine(self, spark, sf_dir):
        """Adversarial corpus forcing EMPTY clusters (two tight value
        groups, k=4 → md5 init lands 3 centroids in one group and ties
        collapse to the min cid, emptying the rest): the previous-
        centroid carry rule must agree across the driver loop, the
        forced distributed loop, AND the DuckDB recursive replay —
        the one branch the real embeddings fixture never exercises."""
        import duckdb
        import numpy as np
        import pandas as pd

        from weather_data_ingestion_service_spark.ext.simsearch import (
            kmeans_fixedpoint_int,
        )
        from weather_data_ingestion_service_spark.registry_r10 import (
            _kmeans_exact_oracle,
        )

        rows = []
        for i in range(12):
            base = 1.0 if i % 2 == 0 else -1.0
            vec = [
                float(base * (1.0 + 0.01 * d) + i * 0.002) for d in range(64)
            ]
            rows.append((i, vec))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = sorted(
            map(tuple, kmeans_fixedpoint_int(df, k=4, n_iter=3).collect())
        )
        dist = sorted(
            map(
                tuple,
                kmeans_fixedpoint_int(
                    df, k=4, n_iter=3, driver_max_vectors=0
                ).collect(),
            )
        )
        pdf = pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [np.array(r[1], dtype=np.float32) for r in rows],
            }
        )
        con = duckdb.connect()
        con.register("pdf", pdf)
        con.execute(
            "CREATE VIEW embeddings AS SELECT vec_id,"
            " CAST(embedding AS FLOAT[]) AS embedding FROM pdf"
        )
        want = sorted(
            tuple(r) for r in con.execute(_kmeans_exact_oracle(k=4)).fetchall()
        )
        assert got == want
        assert dist == got

    def test_hll_estimate_partitioning_invariant(self, spark, sf_dir):
        """approx_count_distinct merges by per-register MAX —
        associative and commutative — so the estimate is a pure
        function of the SET, identical under any partitioning: the
        exact property that makes stream_distinct_bounds' merged
        sketch equal the single-pass one for any micro-batch split."""
        from pyspark.sql import functions as F
        from weather_data_ingestion_service_spark.io import load_table

        ev = load_table(spark, sf_dir, "events").select(
            "event_type", "user_id"
        )
        def est(df):
            return {
                r.event_type: r.h
                for r in df.groupBy("event_type")
                .agg(F.approx_count_distinct("user_id", 0.05).alias("h"))
                .collect()
            }
        a = est(ev.repartition(1))
        b = est(ev.repartition(32, "user_id"))
        c = est(ev.repartition(7, "event_type"))
        assert a == b == c and a


class TestDailySummaryWithMode:
    def test_matches_join_shape_and_tie_break(self, spark):
        """The single-pass two-level daily+mode (round 11) must equal
        daily_summary ⋈ categorical_mode exactly on integer-valued
        measures, including the mode tie-break (largest count, ties to
        the smallest value — server.py:132)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from weather_data_ingestion_service_spark.operators.aggregates import (
            categorical_mode,
            daily_summary,
            daily_summary_with_mode,
        )

        t0 = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
        rows = []
        # day 0: code 7 ×3, code 2 ×3 (tie → 2 wins), code 9 ×1
        # day 1: code 5 ×2, code 8 ×1
        for h, code, v in [
            (0, 7, 10.0), (1, 7, -3.0), (2, 7, 4.0),
            (3, 2, 8.0), (4, 2, 1.0), (5, 2, 0.0), (6, 9, 2.0),
            (24, 5, 6.0), (25, 5, 7.0), (26, 8, -1.0),
        ]:
            rows.append((1, t0 + dt.timedelta(hours=h), code, v))
        df = spark.createDataFrame(
            rows, "location_id long, ts timestamp, weather_code int, v double"
        )
        specs = {
            "v_max": ("v", "max"),
            "v_min": ("v", "min"),
            "v_sum": ("v", "sum"),
            "v_hours": ("v", "cond_hours"),
        }
        got = {
            r["day"]: (r["v_max"], r["v_min"], r["v_sum"], r["v_hours"],
                       r["weather_code"])
            for r in daily_summary_with_mode(
                df, "ts", ["location_id"],
                {**specs, "weather_code": ("weather_code", "mode")},
            ).collect()
        }
        base = daily_summary(df, "ts", ["location_id"], specs)
        mode = categorical_mode(
            df.withColumn("day", F.window("ts", "1 day")["start"]),
            ["location_id", "day"],
            "weather_code",
        )
        want = {
            r["day"]: (r["v_max"], r["v_min"], r["v_sum"], r["v_hours"],
                       r["weather_code"])
            for r in base.join(mode, ["location_id", "day"]).collect()
        }
        assert got == want
        # the tie day resolves to the SMALLEST code among max-count
        day0 = min(got)
        assert got[day0][4] == 2

    def test_requires_exactly_one_mode_spec(self, spark):
        import pytest

        from weather_data_ingestion_service_spark.operators.aggregates import (
            daily_summary_with_mode,
        )

        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1, 1.0)],
            "location_id long, ts string, weather_code int, v double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(ValueError, match="exactly one mode"):
            daily_summary_with_mode(
                df, "ts", ["location_id"], {"v_max": ("v", "max")}
            )


class TestKmeansMultiArrow:
    def test_fused_subspace_fits_match_separate_kmeans(self, spark, sf_dir):
        """The fused one-pass-per-round multi-subspace trainer
        (`_kmeans_multi_arrow`) must be bit-identical to m separate
        `kmeans_fixedpoint_int` fits on the same slices (the
        size-adaptive/reformulation rule: a perf path may not change a
        single integer)."""
        import numpy as np

        from pyspark.sql import functions as F

        from weather_data_ingestion_service_spark.ext.simsearch import (
            _kmeans_multi_arrow,
            kmeans_fixedpoint_int,
            quantize_embeddings,
        )
        from weather_data_ingestion_service_spark.io import load_table

        m, sub, ksub = 4, 16, 16
        emb = load_table(spark, sf_dir, "embeddings")
        q256 = quantize_embeddings(emb, "vec_id", "embedding").select(
            F.col("vec_id").alias("match_id"),
            F.transform("qvec", lambda x: x.cast("long") * 256).alias("q"),
        ).persist()
        fused = _kmeans_multi_arrow(q256, ksub, m, sub, n_iter=3)
        for s in range(m):
            sl = q256.select(
                F.col("match_id").alias("vec_id"),
                F.slice("q", s * sub + 1, sub).alias("emb"),
            )
            want = np.zeros((ksub, sub), dtype=np.int64)
            for r in kmeans_fixedpoint_int(
                sl, "vec_id", "emb", k=ksub, n_iter=3, dim=sub,
                pre_scaled=True,
            ).collect():
                want[int(r["cid"]), int(r["dim"])] = int(r["c_fix"])
            assert (fused[s] == want).all(), f"subspace {s} diverged"
        q256.unpersist()
