"""Property-based + invariant tests (SURVEY.md §5.3): resampling and
aggregation laws on generated frames; fixture sanity; extension-
operator laws (self-similarity, symmetry, score bounds)."""

import datetime as dt

import pytest
from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_data_ingestion_service_spark import fixtures
from weather_data_ingestion_service_spark.operators.aggregates import daily_summary


@st.composite
def hourly_series(draw):
    """(hour_offset, value) series over up to 4 days, values 2-decimal."""
    n = draw(st.integers(min_value=1, max_value=96))
    vals = draw(
        st.lists(
            st.decimals(
                min_value=-1000, max_value=1000, places=2, allow_nan=False
            ).map(float),
            min_size=n,
            max_size=n,
        )
    )
    return list(enumerate(vals))


class TestAggregationLaws:
    @settings(max_examples=8, deadline=None)
    @given(series=hourly_series())
    def test_daily_sum_partitions_total_and_max_bounds(self, spark, series):
        base = dt.datetime(2024, 3, 1)
        rows = [(base + dt.timedelta(hours=h), v) for h, v in series]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        daily = daily_summary(
            df,
            "ts",
            [],
            {"vmax": ("value", "max"), "vmin": ("value", "min"), "vsum": ("value", "sum")},
        ).collect()
        # daily sums partition the total
        total = sum(r.vsum for r in daily)
        assert total == pytest.approx(sum(v for _, v in series), rel=1e-9)
        for r in daily:
            assert r.vmax >= r.vmin

    @settings(max_examples=8, deadline=None)
    @given(series=hourly_series())
    def test_cond_hours_counts_positive_rows(self, spark, series):
        base = dt.datetime(2024, 3, 1)
        rows = [(base + dt.timedelta(hours=h), v) for h, v in series]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        daily = daily_summary(df, "ts", [], {"ph": ("value", "cond_hours")})
        got = sum(r.ph for r in daily.collect())
        assert got == sum(1 for _, v in series if v > 0)


class TestFixtureInvariants:
    @pytest.fixture(scope="class")
    def wh(self, spark):
        df = fixtures.weather_hourly(spark, n_locations=2, n_days=3).cache()
        df.count()
        yield df
        df.unpersist()

    def test_grid_is_complete_and_unique(self, wh):
        assert wh.count() == 2 * 3 * 24
        assert wh.select("location_id", "ts").distinct().count() == 2 * 3 * 24

    def test_value_domains(self, wh):
        bad = wh.filter(
            (F.col("relative_humidity_2m") < 0)
            | (F.col("relative_humidity_2m") > 100)
            | (F.col("precipitation") < 0)
            | (F.col("cloud_cover") < 0)
            | (F.col("cloud_cover") > 100)
            | (F.col("shortwave_radiation") < 0)
        )
        assert bad.count() == 0

    def test_rain_snow_partition_precipitation(self, wh):
        bad = wh.filter(
            F.col("rain") + F.col("snowfall") > F.col("precipitation") * 1.0 + 1e-9
        )
        assert bad.count() == 0

    def test_deterministic_generation(self, spark, wh):
        again = fixtures.weather_hourly(spark, n_locations=2, n_days=3)
        a = sorted(map(tuple, wh.collect()))
        b = sorted(map(tuple, again.collect()))
        assert a == b

    def test_null_patch_present_and_skipped_by_agg(self, wh):
        nulls = wh.filter(F.col("uv_index").isNull()).count()
        assert nulls > 0
        agg = daily_summary(wh, "ts", ["location_id"], {"uvmax": ("uv_index", "max")})
        assert agg.filter(F.col("uvmax").isNull()).count() == 0


class TestExtensionLaws:
    def test_jaccard_self_union_is_1(self, spark):
        from weather_data_ingestion_service_spark.ext.dedup import ngram_jaccard_pairs

        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q r")],
            "doc_id long, text string",
        )
        pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0
        ).collect()}
        assert pairs[(1, 2)] == 1.0
        assert (1, 3) not in pairs  # no shared shingle → never compared

    def test_simhash_identical_texts_distance_zero(self, spark):
        from weather_data_ingestion_service_spark.ext.dedup import simhash_pairs

        docs = spark.createDataFrame(
            [(1, "spark window hash join"), (2, "spark window hash join")],
            "doc_id long, text string",
        )
        out = simhash_pairs(docs, "doc_id", "text", max_hamming=0).collect()
        assert len(out) == 1 and out[0].hamming == 0

    def test_simhash_recall_guard(self, spark):
        """max_hamming beyond bands-1 silently loses recall, so the
        banded generator rejects it unless the caller opts into
        candidate-subset semantics."""
        from weather_data_ingestion_service_spark.ext.dedup import simhash_pairs

        docs = spark.createDataFrame(
            [(1, "spark window hash join"), (2, "spark window hash join")],
            "doc_id long, text string",
        )
        with pytest.raises(ValueError, match="allow_candidate_subset"):
            simhash_pairs(docs, "doc_id", "text", max_hamming=16, bands=4)
        out = simhash_pairs(
            docs, "doc_id", "text", max_hamming=16, bands=4,
            allow_candidate_subset=True,
        ).collect()
        assert len(out) == 1

    def test_shingles_whitespace_insensitive(self, spark):
        """Tokenization drops empty tokens, so runs of spaces / tabs /
        newlines shingle identically to single spaces — and identically
        to the DuckDB oracle's regexp_split + list_filter."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            hashed_shingles,
            word_shingles,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha  beta\tgamma\ndelta")],
            "doc_id long, text string",
        )
        ws = {r.doc_id: sorted(r.shingles)
              for r in word_shingles(docs, "text", n=3).collect()}
        assert ws[1] == ws[2]
        hs = {r.doc_id: sorted(r.sh)
              for r in hashed_shingles(docs, "text", n=3).collect()}
        assert hs[1] == hs[2]

    def test_cosine_topk_finds_planted_duplicate(self, spark):
        from weather_data_ingestion_service_spark.ext.simsearch import cosine_topk

        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        top = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=1).first()
        assert top.match_id == 1 and top.cosine > 0.99

    def test_quality_score_bounded(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.text import quality_score
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = quality_score(docs, "doc_id", "text")
        bad = out.filter((F.col("quality_score") < 0) | (F.col("quality_score") > 1))
        assert bad.count() == 0

    def test_c4_gate_zero_token_doc_cross_engine(self, spark):
        """Empty / whitespace-only documents must gate to keep=false on
        BOTH engines with no NULL rule flags: DuckDB ``list_sum`` over
        an empty token list is NULL, so without the oracle's
        ``coalesce(..., 0)`` a zero-token doc would publish
        r_meanlen=NULL against Spark's false (VERDICT r5 #3)."""
        import duckdb
        import pandas as pd

        from weather_data_ingestion_service_spark.ext.text import (
            quality_gate_flags,
        )
        from weather_data_ingestion_service_spark.registry_r4 import _TOK_SQL

        rows = [(1, ""), (2, "   \t  "), (3, "regular words " * 10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.r_wordcount, r.r_meanlen, r.r_repetition, r.keep)
            for r in quality_gate_flags(docs, "text").collect()
        }
        assert got[1] == (False, False, False, False)
        assert got[2] == (False, False, False, False)
        assert all(v is not None for flags in got.values() for v in flags)

        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        oracle = con.execute(
            f"""
            WITH t AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents),
            u AS (
              SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                     CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                          AS BIGINT) AS sum_chars
              FROM t),
            fr AS (
              SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
                SELECT doc_id, tok, count(*) AS cnt
                FROM (SELECT doc_id, unnest(w) AS tok FROM t)
                GROUP BY doc_id, tok) GROUP BY doc_id)
            SELECT u.doc_id,
                   (u.n_words BETWEEN 20 AND 80) AS r_wordcount,
                   (u.sum_chars * 1000 >= 4000 * u.n_words
                    AND u.sum_chars * 1000 < 4900 * u.n_words) AS r_meanlen,
                   (coalesce(fr.max_freq, 0) * 100 < 12 * u.n_words)
                     AS r_repetition
            FROM u LEFT JOIN fr ON u.doc_id = fr.doc_id
            """
        ).fetchall()
        for doc_id, wc, ml, rep in oracle:
            assert (wc, ml, rep) == got[doc_id][:3], f"doc {doc_id}"

    def test_rolling_hash_order_sensitive(self, spark):
        from weather_data_ingestion_service_spark.ext.text import fingerprints

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "gamma beta alpha")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.rolling_hash for r in fingerprints(docs, "doc_id", "text").collect()}
        assert out[1] != out[2]

    def test_solar_daylight_longer_toward_summer(self, spark):
        from weather_data_ingestion_service_spark.functions.astro import solar_events

        df = spark.createDataFrame(
            [(50.0, 14.0, dt.date(2024, 1, 15)), (50.0, 14.0, dt.date(2024, 6, 15))],
            "latitude double, longitude double, day date",
        )
        out = {r.day.month: r.daylight_duration for r in solar_events(df).collect()}
        assert out[6] > out[1] > 0


class TestAnnRecall:
    """ANN variants must recover planted near-duplicates (the LSH/IVF
    use case: near-angle neighbors).  Deterministic: fixed seeds."""

    def _planted(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        pert = emb.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array((F.element_at("embedding", 1) + F.lit(0.1)).cast("float")),
                F.slice("embedding", 2, 100000),
            ).alias("embedding"),
        )
        return emb.unionByName(pert), pert

    def test_lsh_finds_planted_neighbors(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import lsh_topk

        corpus, queries = self._planted(spark, sf_dir)
        top1 = lsh_topk(corpus, queries, k=1, n_planes=8, n_tables=8).collect()
        hits = sum(1 for r in top1 if r.match_id == r.query_id - 100000)
        assert hits / queries.count() >= 0.9

    def test_lsh_md5_scheme_finds_planted_neighbors(self, spark, sf_dir):
        """The md5-Rademacher scheme (the oracle-restatable one behind
        ext_simsearch_lsh / ext_knn_graph since r8) must keep the same
        planted-neighbor recall as the uniform float planes —
        Rademacher projections satisfy the same JL bounds."""
        from weather_data_ingestion_service_spark.ext.simsearch import lsh_topk

        corpus, queries = self._planted(spark, sf_dir)
        top1 = lsh_topk(
            corpus, queries, k=1, n_planes=8, n_tables=8,
            scheme="md5-rademacher",
        ).collect()
        hits = sum(1 for r in top1 if r.match_id == r.query_id - 100000)
        assert hits / queries.count() >= 0.9

    def test_adaptive_plane_formula_matches_oracle_sql(self):
        """ext_knn_graph's INTEGER adaptive plane count must equal the
        oracle's greatest(3, length(bin(n // 64)) - 1) for every corpus
        size — the float-log2 version could diverge at powers of two."""
        import duckdb

        for n in (0, 1, 63, 64, 127, 128, 129, 500, 2000, 4095, 4096,
                  8191, 8192, 100000, (1 << 20) - 1, 1 << 20):
            py = max(3, (n >> 6).bit_length() - 1)
            sql = duckdb.sql(
                f"SELECT greatest(3, length(bin({n} // 64)) - 1)"
            ).fetchone()[0]
            assert py == sql, (n, py, sql)

    def test_srp_bad_scheme_raises(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import srp_buckets
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        with pytest.raises(ValueError, match="scheme"):
            srp_buckets(emb, scheme="gaussian").collect()

    def test_ivf_finds_planted_neighbors(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import ivf_topk

        corpus, queries = self._planted(spark, sf_dir)
        top1 = ivf_topk(
            corpus, queries, k=1, n_clusters=8, nprobe=2
        ).collect()
        hits = sum(1 for r in top1 if r.match_id == r.query_id - 100000)
        assert hits / queries.count() >= 0.9

    def test_pq_finds_planted_neighbors(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import pq_topk

        corpus, queries = self._planted(spark, sf_dir)
        top1 = pq_topk(corpus, queries, k=1, m=8, ksub=16).collect()
        hits = sum(1 for r in top1 if r.match_id == r.query_id - 100000)
        assert hits / queries.count() >= 0.9

    def test_ivf_md5_finds_planted_neighbors(self, spark, sf_dir):
        """The hash-sampled-codebook IVF (oracle twin, r8) must keep
        planted-neighbor recall: a perturbed copy lands in the same
        coarse cell as its original for nprobe-probed queries."""
        from weather_data_ingestion_service_spark.ext.simsearch import ivf_topk_md5

        corpus, queries = self._planted(spark, sf_dir)
        top1 = ivf_topk_md5(corpus, queries, k=1, n_clusters=8, nprobe=2).collect()
        hits = sum(1 for r in top1 if r.match_id == r.query_id - 100000)
        assert hits / queries.count() >= 0.9

    def test_pq_md5_finds_planted_neighbors(self, spark, sf_dir):
        """The hash-sampled-codebook PQ (oracle twin, r8): ADC against
        quantized codes must still rank the near-identical planted
        copy first for ≥90% of queries."""
        from weather_data_ingestion_service_spark.ext.simsearch import pq_topk_md5

        corpus, queries = self._planted(spark, sf_dir)
        top1 = pq_topk_md5(corpus, queries, k=1, m=8, n_cent=16).collect()
        hits = sum(1 for r in top1 if r.match_id == r.query_id - 100000)
        assert hits / queries.count() >= 0.9

    def test_minhash_md5_recovers_planted_near_dups(self, spark, sf_dir):
        """ext_dedup_minhash_md5's banded candidates must recover most
        planted 80%-prefix truncations (true Jaccard ≈ 0.8 ≫ the 0.4
        estimate threshold) — the recall property the oracle cannot
        check (it restates the same bands)."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            minhash_lsh_pairs_md5,
        )
        from weather_data_ingestion_service_spark.registry_ext import (
            _near_dup_corpus,
        )

        corpus = _near_dup_corpus(spark, sf_dir)
        pairs = minhash_lsh_pairs_md5(corpus, "doc_id", "text").collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        planted = [
            r.doc_id
            for r in corpus.filter(F.col("doc_id") >= 1000000).collect()
        ]
        hits = sum(1 for d in planted if (d - 1000000, d) in got)
        assert hits / len(planted) >= 0.6, (hits, len(planted))

    def test_pq_result_is_partitioning_independent(self, spark, sf_dir):
        """Per-batch partial top-k under the (adc_d2, match_id) total
        order must merge to the same global result for any
        partitioning."""
        from weather_data_ingestion_service_spark.ext.simsearch import pq_topk

        corpus, queries = self._planted(spark, sf_dir)
        a = pq_topk(corpus, queries.limit(5), k=3).collect()
        b = pq_topk(corpus.repartition(13), queries.limit(5), k=3).collect()
        assert sorted(((r.query_id, r.rank, r.match_id) for r in a)) == sorted(
            ((r.query_id, r.rank, r.match_id) for r in b)
        )

    def test_pq_query_guard(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import pq_topk

        corpus, queries = self._planted(spark, sf_dir)
        with pytest.raises(ValueError, match="pq_topk"):
            pq_topk(corpus, corpus, max_queries=10)


class TestBlasCosineEquivalence:
    def test_blas_pairs_match_expression_pairs(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import (
            embedding_near_dup_pairs,
            embedding_near_dup_pairs_blas,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        pert = emb.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array((F.element_at("embedding", 1) + F.lit(0.5)).cast("float")),
                F.slice("embedding", 2, 100000),
            ).alias("embedding"),
            F.col("label"),
        )
        corpus = emb.unionByName(pert)
        a = {
            (r.id_a, r.id_b): round(r.cosine, 6)
            for r in embedding_near_dup_pairs(corpus, threshold=0.9).collect()
        }
        b = {
            (r.id_a, r.id_b): round(r.cosine, 6)
            for r in embedding_near_dup_pairs_blas(corpus, threshold=0.9).collect()
        }
        assert a == b and len(a) > 0

    def test_blas_guard_rejects_large_corpus(self, spark, sf_dir):
        """The collect+broadcast kernel must fail loudly past its bound
        (VERDICT r03 #9) — the unbounded path is how a library helper
        becomes a driver OOM at corpus scale."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            embedding_near_dup_pairs_blas,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        with pytest.raises(ValueError, match="near_dup_pairs_grid"):
            embedding_near_dup_pairs_blas(emb, max_broadcast_corpus=10)

    def test_grid_pairs_match_blas(self, spark, sf_dir):
        """The block-grid distributed path must emit the same pair set
        as the collect-BLAS variant with cosines equal to 12 decimals
        (BLAS summation order varies with matrix shape → ~1 ulp) —
        across block counts (including B=1 and B larger than distinct
        hash buckets)."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            embedding_near_dup_pairs_blas,
            embedding_near_dup_pairs_grid,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        pert = emb.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array((F.element_at("embedding", 1) + F.lit(0.5)).cast("float")),
                F.slice("embedding", 2, 100000),
            ).alias("embedding"),
            F.col("label"),
        )
        corpus = emb.unionByName(pert)
        ref = {
            (r.id_a, r.id_b): round(r.cosine, 12)
            for r in embedding_near_dup_pairs_blas(corpus, threshold=0.9).collect()
        }
        assert len(ref) > 0
        for n_blocks in (1, 4, 31):
            got = {
                (r.id_a, r.id_b): round(r.cosine, 12)
                for r in embedding_near_dup_pairs_grid(
                    corpus, threshold=0.9, n_blocks=n_blocks
                ).collect()
            }
            assert got == ref, f"n_blocks={n_blocks}"


class TestTrainingDataTextOps:
    def test_repetition_fraction_known_values(self, spark):
        from weather_data_ingestion_service_spark.ext.text import repetition_stats

        docs = spark.createDataFrame(
            [
                (1, "a b a b a b"),      # bigrams: ab ba ab ba ab → 5 total, 2 distinct
                (2, "u v w x y z"),      # all 5 bigrams distinct
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in repetition_stats(docs, "doc_id", "text").collect()}
        assert got[1].n_ngrams == 5 and got[1].n_distinct_ngrams == 2
        assert got[1].dup_ngram_frac == pytest.approx(3 / 5)
        assert got[2].dup_ngram_frac == 0.0

    def test_contamination_finds_planted_overlap(self, spark):
        from weather_data_ingestion_service_spark.ext.text import (
            contamination_pairs,
        )

        train = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine ten"),
             (2, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        test = spark.createDataFrame(
            [(100, "zzz one two three four five six seven eight qqq"),
             (200, "completely different words with no overlap at all here")],
            "doc_id long, text string",
        )
        got = {(r.train_id, r.test_id): r.shared_ngrams
               for r in contamination_pairs(train, test, "doc_id", "text", n=8).collect()}
        # train 1 tokens 1..8 == test 100 tokens 2..9 → exactly one shared 8-gram
        assert got == {(1, 100): 1}

    def test_redact_pii_known_strings(self, spark):
        from weather_data_ingestion_service_spark.ext.text import redact_pii

        docs = spark.createDataFrame(
            [
                (1, "reach me at jane.doe+spam@mail-server.org thanks"),
                (2, "call 555-867-5309 or +01 234 5678 x"),
                (3, "no pii here at all"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in redact_pii(docs, "doc_id", "text").collect()}
        assert got[1].text_redacted == "reach me at <EMAIL> thanks"
        assert got[1].n_emails == 1 and got[1].n_phones == 0
        assert "<PHONE>" in got[2].text_redacted and got[2].n_phones >= 1
        assert got[3].text_redacted == got[3].text_redacted == "no pii here at all"
        assert got[3].n_emails == 0 and got[3].n_phones == 0

    def test_sessionize_gap_boundaries(self, spark):
        """A gap of exactly gap_seconds stays in-session (> starts a
        new one); sessions are per-key and 1-based."""
        import datetime as dt

        from weather_data_ingestion_service_spark.operators.windows import (
            sessionize,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, 7, t0),
            (2, 7, t0 + dt.timedelta(seconds=3600)),   # == gap → same session
            (3, 7, t0 + dt.timedelta(seconds=7201)),   # > gap → new session
            (4, 8, t0),                                 # other key restarts
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        got = {r.event_id: r.session_no for r in sessionize(
            df, ["user_id"], "ts", gap_seconds=3600, tiebreak=["event_id"]
        ).collect()}
        assert got == {1: 1, 2: 1, 3: 2, 4: 1}

    def test_quantize_roundtrip_error_bound(self, spark, sf_dir):
        """Dequantized values reconstruct within half a quantization
        step of the original (the defining property of symmetric
        rounding), and the all-zero vector is representable."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            quantize_embeddings,
        )
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        zero = spark.createDataFrame(
            [(999999, [0.0] * 64, 0)], "vec_id long, embedding array<float>, label int"
        )
        q = quantize_embeddings(emb.unionByName(zero), "vec_id", "embedding")
        joined = (
            emb.unionByName(zero)
            .join(q, "vec_id")
            .select("vec_id", "embedding", "qvec", "scale")
            .collect()
        )
        assert len(joined) == emb.count() + 1
        for r in joined:
            if r.scale == 0.0:
                assert all(v == 0 for v in r.qvec)
                continue
            for x, qi in zip(r.embedding, r.qvec):
                assert abs(qi * r.scale - x) <= r.scale / 2 + 1e-12
                assert -127 <= qi <= 127


class TestHashTfLaws:
    def test_bucket_range_and_mass_conservation(self, spark, sf_dir):
        """Feature-hashing TF: every bucket in [0, 16) and the per-doc
        tf mass equals the doc's token count — the hashing trick drops
        no occurrences."""
        from weather_data_ingestion_service_spark import registry
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.registry_r4 import _tok

        out = registry.queries()["ext_text_hashtf"](spark, sf_dir)
        bad = out.filter((F.col("bucket") < 0) | (F.col("bucket") >= 16))
        assert bad.count() == 0
        mass = out.groupBy("doc_id").agg(F.sum("tf").alias("mass"))
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.size(_tok()).cast("long").alias("n_tok")
        )
        diff = (
            mass.join(docs, "doc_id")
            .filter(F.col("mass") != F.col("n_tok"))
            .count()
        )
        assert diff == 0


class TestCosineTopkBroadcastGuard:
    def test_large_query_side_fails_loudly(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import cosine_topk
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        with pytest.raises(ValueError, match="lsh_topk"):
            cosine_topk(emb, emb, max_broadcast_queries=10).collect()

    def test_small_query_side_unaffected(self, spark, sf_dir):
        from weather_data_ingestion_service_spark.ext.simsearch import cosine_topk
        from weather_data_ingestion_service_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        out = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=2)
        assert out.count() == 6


class TestNormalizeKeyProperties:
    @given(
        names=st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")
                ),
                max_size=30,
            ),
            min_size=1,
            max_size=25,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_normalize_place_key_idempotent_and_variant_stable(self, spark, names):
        """norm(norm(x)) == norm(x), and case/extra-space variants of a
        name normalize identically — the property the fuzzy geocode
        join depends on."""
        from weather_data_ingestion_service_spark.operators.joins import (
            normalize_place_key,
        )

        rows = [(n,) for n in names]
        df = spark.createDataFrame(rows, "name string")
        out = df.select(
            normalize_place_key("name").alias("n1"),
            normalize_place_key(normalize_place_key("name")).alias("n2"),
            normalize_place_key(F.upper(F.col("name"))).alias("nu"),
            normalize_place_key(F.concat(F.lit("  "), F.col("name"), F.lit("  "))).alias("np"),
        ).collect()
        for r in out:
            assert r.n1 == r.n2 == r.nu == r.np


class TestRrfProperties:
    def test_rrf_agreement_ranks_first(self, spark):
        """A doc ranked #1 by BOTH runs must outrank any doc retrieved
        by only one run — the fusion property RRF exists for."""
        from weather_data_ingestion_service_spark.ext.simsearch import rrf_fuse

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, match_id long, rank int",
        )
        b = spark.createDataFrame(
            [(1, 10, 1), (1, 13, 2), (1, 14, 3)],
            "query_id long, match_id long, rank int",
        )
        out = rrf_fuse(a, b, k=5).collect()
        best = min(out, key=lambda r: r.rank)
        assert best.match_id == 10


class TestNdcgLaws:
    """ndcg_at_k invariants on generated rankings."""

    @settings(max_examples=6, deadline=None)
    @given(perm=st.permutations(list(range(8))))
    def test_ndcg_bounded_and_permutation_consistent(self, spark, perm):
        """0 < ndcg <= 1 for any approx permutation of a truth top-k
        superset; exactly 1 iff the top-k prefix order matches."""
        from weather_data_ingestion_service_spark.ext.simsearch import ndcg_at_k

        k = 5
        truth = spark.createDataFrame(
            [(1, m, r + 1) for r, m in enumerate(range(8))],
            "query_id long, match_id long, rank int",
        )
        approx = spark.createDataFrame(
            [(1, m, r + 1) for r, m in enumerate(perm)],
            "query_id long, match_id long, rank int",
        )
        row = ndcg_at_k(truth, approx, k=k).collect()[0]
        assert 0.0 < row["ndcg"] <= 1.0
        assert 0 < row["dcg_micro"] <= row["idcg_micro"]
        if perm[:k] == list(range(k)):
            assert row["ndcg"] == 1.0

    def test_ndcg_monotone_in_displacement(self, spark):
        """Swapping a relevant item further down strictly lowers NDCG."""
        from weather_data_ingestion_service_spark.ext.simsearch import ndcg_at_k

        truth = spark.createDataFrame(
            [(1, m, m + 1) for m in range(5)],
            "query_id long, match_id long, rank int",
        )

        def score(order):
            approx = spark.createDataFrame(
                [(1, m, r + 1) for r, m in enumerate(order)],
                "query_id long, match_id long, rank int",
            )
            return ndcg_at_k(truth, approx, k=5).collect()[0]["ndcg"]

        perfect = score([0, 1, 2, 3, 4])
        one_swap = score([1, 0, 2, 3, 4])     # top-2 swapped
        far_swap = score([4, 1, 2, 3, 0])     # best item sent to rank 5
        assert perfect == 1.0
        assert far_swap < one_swap < perfect


class TestRound4bKernelLaws:
    @settings(max_examples=10, deadline=None)
    @given(
        toks=st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e"]), max_size=30
        )
    )
    def test_max_token_freq_matches_counter(self, spark, toks):
        """The sorted-array run-length fold equals collections.Counter's
        max count on arbitrary token lists (empty -> 0)."""
        from collections import Counter

        from weather_data_ingestion_service_spark.registry_r4b import (
            _max_token_freq,
        )

        df = spark.createDataFrame([(toks,)], "w array<string>")
        got = df.select(_max_token_freq("w").alias("m")).collect()[0]["m"]
        want = max(Counter(toks).values()) if toks else 0
        assert got == want

    @settings(max_examples=6, deadline=None)
    @given(
        labeled=st.lists(
            st.tuples(st.sampled_from(["p", "n"]), st.integers(0, 5)),
            min_size=2,
            max_size=24,
        ).filter(lambda xs: len({l for l, _ in xs}) == 2)
    )
    def test_exact_auc_matches_bruteforce_pairs(self, spark, labeled):
        """AUC micro from the distributed kernel equals the O(n²)
        definition (wins + half-ties over pos×neg pairs) for every
        class."""
        from weather_data_ingestion_service_spark.ext.simsearch import exact_auc

        df = spark.createDataFrame(labeled, "lang string, score long")
        got = {
            r["lang"]: r["auc_micro"]
            for r in exact_auc(df, "lang", "score").collect()
        }
        for cls in {l for l, _ in labeled}:
            pos = [s for l, s in labeled if l == cls]
            neg = [s for l, s in labeled if l != cls]
            wins = sum(1 for p in pos for q in neg if p > q)
            ties = sum(1 for p in pos for q in neg if p == q)
            want = (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg))
            assert got[cls] == want, cls

    @settings(max_examples=6, deadline=None)
    @given(seed=st.integers(0, 10_000))
    def test_image_hash_deterministic_and_brightness_invariant(
        self, spark, seed
    ):
        """aHash is a pure function of the pixels and invariant to a
        global +delta brightness shift (threshold is the image's own
        mean)."""
        import random

        from weather_data_ingestion_service_spark.ext.multimodal import (
            _encode_png_stdlib,
            image_avg_hash,
        )

        rng = random.Random(seed)
        w, h = 16, 16
        base = bytes(rng.randrange(0, 200) for _ in range(w * h * 3))
        shifted = bytes(min(255, b + 20) for b in base)
        df = spark.createDataFrame(
            [
                (1, bytearray(_encode_png_stdlib(base, w, h, 3))),
                (2, bytearray(_encode_png_stdlib(base, w, h, 3))),
                (3, bytearray(_encode_png_stdlib(shifted, w, h, 3))),
            ],
            "doc_id long, payload binary",
        )
        rows = {
            r["doc_id"]: r["ahash"]
            for r in image_avg_hash(df, "doc_id", "payload").collect()
        }
        assert rows[1] == rows[2]
        # +20 on every channel moves every cell mean AND the global
        # mean by the same amount when no pixel clips; with clipping
        # at 255 the hash may move a little — allow <= 8 bits
        drift = bin((rows[1] ^ rows[3]) & ((1 << 64) - 1)).count("1")
        assert drift <= 8


class TestRound5Laws:
    def test_duplicate_spans_invariants(self, spark):
        """Laws: 0 <= dup_tokens <= n_tokens; a doc with a span has
        dup_tokens >= k; spans count <= dup_tokens / 1 (each span
        covers >= k tokens so n_dup_spans * k <= dup_tokens)."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            duplicate_spans,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).limit(200)
        k = 5
        rows = duplicate_spans(docs, "doc_id", "text", k=k).collect()
        assert rows
        for r in rows:
            assert 0 <= r.dup_tokens <= r.n_tokens, r
            assert r.n_dup_spans * k <= max(r.dup_tokens, 0) or r.n_dup_spans == 0, r
            if r.n_dup_spans > 0:
                assert r.dup_tokens >= k, r

    def test_span_removal_conserves_tokens(self, spark):
        """Removal law: n_kept + n_removed == n_tokens, and the
        cleaned text tokenizes to exactly n_kept tokens."""
        from weather_data_ingestion_service_spark.ext.dedup import (
            remove_duplicate_spans,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).limit(100)
        for r in remove_duplicate_spans(docs, "doc_id", "text", k=5).collect():
            assert r.n_kept + r.n_removed == r.n_tokens, r
            retok = len([t for t in r.text_clean.lower().split() if t])
            assert retok == r.n_kept, r

    def test_ks_stat_bounds_and_self_distance(self, spark):
        """KS laws: 0 <= d_micro <= 1e6 on real pairs; identical
        samples give D = 0."""
        from weather_data_ingestion_service_spark import registry

        out = registry.queries()["agg_ks_stat"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert out
        for r in out:
            assert 0 <= r.d_micro <= 1_000_000, r
            assert 0 <= r.d_num <= r.n_a * r.n_b, r
        # self-distance: duplicate one type's sample under two labels
        df = spark.createDataFrame(
            [("a", i % 7 + 1) for i in range(50)]
            + [("b", i % 7 + 1) for i in range(50)],
            ["event_type", "cents"],
        )
        from pyspark.sql import Window, functions as F
        n = df.groupBy("event_type").count()
        # ECDFs identical → max |cum_a*n_b - cum_b*n_a| = 0
        c = df.groupBy("event_type", "cents").count()
        a = c.filter(F.col("event_type") == "a").select("cents", F.col("count").alias("ka"))
        b = c.filter(F.col("event_type") == "b").select("cents", F.col("count").alias("kb"))
        j = a.join(b, "cents", "full")
        assert j.filter(F.coalesce("ka", F.lit(0)) != F.coalesce("kb", F.lit(0))).count() == 0

    def test_spearman_perfect_and_reversed(self, spark):
        """ρ(x, x) = 1e6 exactly; ρ(x, −x) = −1e6 exactly (no ties)."""
        from weather_data_ingestion_service_spark.ext.simsearch import (
            spearman_rho,
        )

        df = spark.createDataFrame(
            [(i, i * 3 + 7, -(i * 3 + 7)) for i in range(40)],
            ["id", "x", "neg_x"],
        )
        same = spearman_rho(df, "id", "x", "x").collect()[0]
        # sum_d2_x4 is published as a digit string (canonicalizer-proof)
        assert same.rho_micro == 1_000_000 and int(same.sum_d2_x4) == 0
        rev = spearman_rho(df, "id", "x", "neg_x").collect()[0]
        assert rev.rho_micro == -1_000_000

    def test_bestfit_bins_respect_budget(self, spark):
        """BFD law: no bin's token sum exceeds the budget unless it
        holds a single oversized doc."""
        from collections import defaultdict

        from weather_data_ingestion_service_spark.ext.packing import (
            pack_bestfit,
        )
        from weather_data_ingestion_service_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id",
            F.ceil(F.col("n_chars") / 4).cast("long").alias("tok"),
        )
        rows = pack_bestfit(docs, "doc_id", "tok", budget=256).collect()
        bins = defaultdict(list)
        for r in rows:
            bins[(r.shard, r.bin_id)].append(r)
        for members in bins.values():
            total = sum(m.n_tokens for m in members)
            if total > 256:
                assert len(members) == 1 and members[0].oversized, members

    def test_mix_realize_quota_law(self, spark):
        """Every source's kept set crosses the quota at most once:
        cum_tokens - est_tokens < quota for every kept doc, and the
        kept token total is < quota + max single doc."""
        from weather_data_ingestion_service_spark import registry

        rows = registry.queries()["ext_mix_realize"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        per_src = {}
        for r in rows:
            assert r.cum_tokens - r.est_tokens < r.quota, r
            per_src.setdefault(r.source, []).append(r)
        for src, ms in per_src.items():
            total = sum(m.est_tokens for m in ms)
            mx = max(m.est_tokens for m in ms)
            assert total < ms[0].quota + mx, (src, total)


class TestPointInPolygonProperties:
    """The crossing expression is ONE generated SQL string shared by
    the Spark plan and the oracle, so fuzzing it through DuckDB (fast,
    hundreds of examples) covers both engines; the Python reference
    re-implements the identical half-open ray-cast rule."""

    @staticmethod
    def _ref_inside(px, py, verts):
        n = len(verts)
        crossings = 0
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if y1 == y2:
                continue
            if (y1 <= py) == (y2 <= py):
                continue
            lhs = (py - y1) * (x2 - x1)
            rhs = (px - x1) * (y2 - y1)
            if (lhs > rhs) if y2 > y1 else (lhs < rhs):
                crossings += 1
        return crossings % 2 == 1

    @settings(max_examples=200, deadline=None)
    @given(
        verts=st.lists(
            st.tuples(
                st.integers(min_value=-(10**8), max_value=10**8),
                st.integers(min_value=-(10**8), max_value=10**8),
            ),
            min_size=3,
            max_size=8,
        ),
        pt=st.tuples(
            st.integers(min_value=-(2 * 10**8), max_value=2 * 10**8),
            st.integers(min_value=-(10**8), max_value=10**8),
        ),
    )
    def test_sql_expression_matches_reference(self, verts, pt):
        import duckdb

        from weather_data_ingestion_service_spark.operators.spatial import (
            polygon_inside_sql,
        )

        px, py = pt
        sql = polygon_inside_sql(str(px), str(py), verts)
        got = duckdb.connect().execute(f"SELECT {sql}").fetchone()[0]
        assert got == self._ref_inside(px, py, verts)

    def test_triangle_interior_and_exterior_grid(self):
        """Deterministic sweep: every grid point classified identically
        by SQL and reference over a skewed triangle (covers vertex-row
        and edge-collinear cases the fuzzer may miss)."""
        import duckdb

        from weather_data_ingestion_service_spark.operators.spatial import (
            polygon_inside_sql,
        )

        verts = [(0, 0), (10, 2), (4, 9)]
        con = duckdb.connect()
        for px in range(-2, 13):
            for py in range(-2, 11):
                sql = polygon_inside_sql(str(px), str(py), verts)
                got = con.execute(f"SELECT {sql}").fetchone()[0]
                assert got == self._ref_inside(px, py, verts), (px, py)


class TestRankStatProperties:
    @settings(max_examples=6, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=-50, max_value=50),
                    min_size=2, max_size=12),
        ys=st.lists(st.integers(min_value=-50, max_value=50),
                    min_size=2, max_size=12),
    )
    def test_mannwhitney_matches_bruteforce(self, spark, xs, ys):
        """u_x2 for a group == Σ over (own, other) pairs of
        2·[own>other] + [own==other] — the comparison-count definition
        of U, doubled."""
        from weather_data_ingestion_service_spark.operators.aggregates import (
            mannwhitney_one_vs_rest,
        )

        d = spark.createDataFrame(
            [("a", v) for v in xs] + [("b", v) for v in ys],
            "event_type string, cents long",
        )
        got = {r.event_type: r.u_x2
               for r in mannwhitney_one_vs_rest(d).collect()}
        for key, own, other in (("a", xs, ys), ("b", ys, xs)):
            exp = sum(
                2 if o > t else (1 if o == t else 0)
                for o in own for t in other
            )
            assert got[key] == exp, key

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                      min_size=1, max_size=10),
    )
    def test_hodges_lehmann_matches_bruteforce(self, spark, vals):
        import datetime as dt

        from weather_data_ingestion_service_spark.registry_r6 import (
            hodges_lehmann_daily,
        )

        d = spark.createDataFrame(
            [("t", dt.date(2024, 1, 1) + dt.timedelta(days=i), c)
             for i, c in enumerate(vals)],
            "event_type string, day date, cents long",
        )
        walsh = sorted(
            vals[i] + vals[j]
            for i in range(len(vals)) for j in range(i, len(vals))
        )
        r = hodges_lehmann_daily(d).collect()[0]
        assert r.n_pairs == len(walsh)
        assert r.hl_x2 == walsh[(len(walsh) + 1) // 2 - 1]

    @settings(max_examples=6, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=-100, max_value=100),
                    min_size=2, max_size=8),
        ys=st.lists(st.integers(min_value=-100, max_value=100),
                    min_size=2, max_size=8),
    )
    def test_welch_matches_python_float_tree(self, spark, xs, ys):
        """The published t must equal the SAME IEEE tree evaluated in
        Python (int-exact moments, correctly-rounded / and sqrt) —
        bit-equality, not approximation."""
        import math

        from weather_data_ingestion_service_spark.operators.aggregates import (
            welch_ttest_one_vs_rest,
        )

        d = spark.createDataFrame(
            [("a", v) for v in xs] + [("b", v) for v in ys],
            "event_type string, cents long",
        )
        rows = {r.event_type: r for r in welch_ttest_one_vs_rest(d).collect()}

        def expect(own, other):
            n1, a1, b1 = len(own), sum(own), sum(v * v for v in own)
            n2, a2, b2 = len(other), sum(other), sum(v * v for v in other)
            if n1 * b1 - a1 * a1 == 0 and n2 * b2 - a2 * a2 == 0:
                return None
            mean = a1 / n1 - a2 / n2
            v1 = (n1 * b1 - a1 * a1) / (n1 * (n1 - 1)) / n1
            v2 = (n2 * b2 - a2 * a2) / (n2 * (n2 - 1)) / n2
            return mean / math.sqrt(v1 + v2)

        for key, own, other in (("a", xs, ys), ("b", ys, xs)):
            exp = expect(own, other)
            if exp is None:
                assert key not in rows
            else:
                assert rows[key].t_welch == exp, key


class TestRound6BatchLaws:
    """Laws for the late-round-6 kernels: Wilcoxon scale invariance,
    RSI offset invariance, bootstrap weight law, skyline dominance."""

    @settings(max_examples=6, deadline=None)
    @given(
        cents=st.lists(
            st.tuples(st.integers(0, 500), st.integers(0, 500),
                      st.integers(0, 500)),
            min_size=3, max_size=8,
        ),
        scale=st.sampled_from([2, 7, 100]),
    )
    def test_wilcoxon_scale_invariant(self, spark, cents, scale):
        """Multiplying every daily value by a positive constant must
        not change signs or |diff| ranks, hence not W+*2."""
        from weather_data_ingestion_service_spark.registry_r6 import (
            wilcoxon_one_vs_rest_daily,
        )

        def run(mult):
            rows = []
            for i, (a, b, c) in enumerate(cents):
                d = dt.date(2024, 1, 1 + i)
                rows += [("a", d, a * mult), ("b", d, b * mult),
                         ("c", d, c * mult)]
            df = spark.createDataFrame(
                rows, "event_type string, day date, cents long"
            )
            return sorted(
                (r.event_type, r.n_pairs, r.wplus_x2)
                for r in wilcoxon_one_vs_rest_daily(df).collect()
            )

        assert run(1) == run(scale)

    @settings(max_examples=6, deadline=None)
    @given(
        cents=st.lists(st.integers(0, 1000), min_size=5, max_size=10),
        offset=st.integers(1, 10000),
    )
    def test_rsi_offset_invariant(self, spark, cents, offset):
        """RSI depends only on deltas: adding a constant to every
        daily level leaves every rsi_micro unchanged."""
        from weather_data_ingestion_service_spark.registry_r6 import rsi_daily

        def run(add):
            rows = [("a", dt.date(2024, 1, 1 + i), c + add)
                    for i, c in enumerate(cents)]
            df = spark.createDataFrame(
                rows, "event_type string, day date, cents long"
            )
            return sorted(
                (r.day, r.rsi_micro)
                for r in rsi_daily(df, periods=3).collect()
            )

        assert run(0) == run(offset)

    def test_bootstrap_weight_frequencies_near_poisson(self, spark, sf_dir):
        """Across docs x replicates the md5-derived weights must hit
        the Poisson(1) pmf within a loose tolerance (law of the
        construction, not of the data)."""
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.registry_r6 import (
            poisson_boot_weight,
        )

        docs = load_table(spark, sf_dir, "documents")
        e = docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(19))).alias("b"),
        )
        freq = {
            r.w: r.c
            for r in e.select(poisson_boot_weight("doc_id", "b").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c")).collect()
        }
        tot = sum(freq.values())
        assert tot >= 2000
        p0 = freq.get(0, 0) / tot
        p1 = freq.get(1, 0) / tot
        assert abs(p0 - 0.367879) < 0.05
        assert abs(p1 - 0.367879) < 0.05

    @settings(max_examples=6, deadline=None)
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 20), st.integers(0, 20)),
            min_size=1, max_size=25,
        )
    )
    def test_skyline_matches_bruteforce_dominance(self, spark, pts):
        """The window-based front equals the O(n^2) dominance
        definition: keep (x,y) iff no other point has x'>=x, y'>=y
        with one strict."""
        from weather_data_ingestion_service_spark.registry_r6 import (
            skyline_front,
        )

        t = spark.createDataFrame(pts, "x long, y long")
        got = sorted((r.x, r.y) for r in skyline_front(t).collect())
        uniq = set(pts)
        brute = sorted(
            (x, y) for (x, y) in uniq
            if not any(
                (x2 >= x and y2 >= y and (x2 > x or y2 > y))
                for (x2, y2) in uniq
            )
        )
        assert got == brute

    @settings(max_examples=6, deadline=None)
    @given(
        series=st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 50)),
            min_size=2, max_size=12,
        )
    )
    def test_kendall_components_match_bruteforce(self, spark, series):
        """The join-based tau-b components equal the O(n^2) pair
        classification computed in Python over the same (n, cents)
        day series."""
        from weather_data_ingestion_service_spark.registry_r6 import (
            kendall_tau_components_daily,
        )

        rows = [("k", dt.date(2024, 1, 1 + i), n, c)
                for i, (n, c) in enumerate(series)]
        d = spark.createDataFrame(
            rows, "event_type string, day date, n long, cents long"
        )
        r = kendall_tau_components_daily(d).collect()[0]
        conc = disc = tx = ty = txy = 0
        for i in range(len(series)):
            for j in range(i + 1, len(series)):
                (na, ca), (nb, cb) = series[i], series[j]
                if na == nb and ca == cb:
                    txy += 1
                elif na == nb:
                    tx += 1
                elif ca == cb:
                    ty += 1
                elif (na > nb) == (ca > cb):
                    conc += 1
                else:
                    disc += 1
        n_pairs = len(series) * (len(series) - 1) // 2
        assert (
            r.n_pairs, r.concordant, r.discordant,
            r.ties_x, r.ties_y, r.ties_xy,
        ) == (n_pairs, conc, disc, tx, ty, txy)

    @settings(max_examples=6, deadline=None)
    @given(
        cents=st.lists(st.integers(0, 200), min_size=4, max_size=12),
    )
    def test_rsi_matches_python_fold(self, spark, cents):
        """rsi_daily equals the direct Python computation: 3-delta
        rolling gain/loss sums, floor-divide micro-units, neutral
        500000 on flat frames."""
        from weather_data_ingestion_service_spark.registry_r6 import rsi_daily

        rows = [("k", dt.date(2024, 1, 1 + i), c)
                for i, c in enumerate(cents)]
        d = spark.createDataFrame(
            rows, "event_type string, day date, cents long"
        )
        got = {r.day.day: r.rsi_micro
               for r in rsi_daily(d, periods=3).collect()}
        deltas = [b - a for a, b in zip(cents, cents[1:])]
        want = {}
        for t in range(2, len(deltas)):
            frame = deltas[t - 2:t + 1]
            g = sum(x for x in frame if x > 0)
            l = -sum(x for x in frame if x < 0)
            day = t + 2  # delta t sits on day index t+1 (1-based +1)
            want[day] = 500000 if g + l == 0 else g * 1000000 // (g + l)
        assert got == want


class TestRound6LateLaws:
    """Brute-force laws for the last round-6 kernels."""

    @settings(max_examples=6, deadline=None)
    @given(
        cents=st.lists(st.integers(0, 30), min_size=8, max_size=21),
    )
    def test_seasonal_mk_matches_bruteforce(self, spark, cents):
        """seasonal_mk_daily equals the O(n^2) same-weekday pair
        classification in Python."""
        from weather_data_ingestion_service_spark.registry_r6 import (
            seasonal_mk_daily,
        )

        base = dt.date(2024, 1, 1)
        days = [base + dt.timedelta(days=i) for i in range(len(cents))]
        d = spark.createDataFrame(
            [("k", dy, c) for dy, c in zip(days, cents)],
            "event_type string, day date, cents long",
        )
        r = seasonal_mk_daily(d).collect()[0]
        s = n_pairs = 0
        for i in range(len(cents)):
            for j in range(i + 1, len(cents)):
                if days[i].weekday() != days[j].weekday():
                    continue
                n_pairs += 1
                s += (cents[j] > cents[i]) - (cents[j] < cents[i])
        # n_seasons counts only strata that produced >= 1 pair
        strata_with_pairs = {
            days[i].weekday()
            for i in range(len(cents))
            for j in range(i + 1, len(cents))
            if days[i].weekday() == days[j].weekday()
        }
        assert (r.n_seasons, r.n_pairs, r.s_seasonal) == (
            len(strata_with_pairs), n_pairs, s,
        )

    @settings(max_examples=6, deadline=None)
    @given(
        cents=st.lists(st.integers(0, 9), min_size=1, max_size=15),
    )
    def test_spell_lengths_match_python_runs(self, spark, cents):
        """spell_lengths_daily equals a direct Python computation:
        median by rank selection, then run-length encoding of the
        above-flags."""
        from itertools import groupby

        from weather_data_ingestion_service_spark.registry_r6 import (
            spell_lengths_daily,
        )

        base = dt.date(2024, 1, 1)
        d = spark.createDataFrame(
            [("k", base + dt.timedelta(days=i), c)
             for i, c in enumerate(cents)],
            "event_type string, day date, cents long",
        )
        got = {r.above: (r.n_spells, r.max_spell, r.total_days)
               for r in spell_lengths_daily(d).collect()}
        med = sorted(cents)[(len(cents) + 1) // 2 - 1]
        flags = [1 if c > med else 0 for c in cents]
        want = {}
        for side in (0, 1):
            runs = [len(list(g)) for f, g in groupby(flags) if f == side]
            if runs:
                want[side] = (len(runs), max(runs), sum(runs))
        assert got == want


class TestRound7Laws:
    @settings(max_examples=6, deadline=None)
    @given(cents=st.lists(st.integers(0, 1000), min_size=9, max_size=20))
    def test_hampel_matches_python(self, spark, cents):
        """hampel_daily equals a direct Python computation: rank-5
        selection for both the window median and the MAD, flag at
        |x − med| > 3·MAD."""
        from weather_data_ingestion_service_spark.registry_r7 import (
            hampel_daily,
        )

        base = dt.date(2024, 1, 1)
        d = spark.createDataFrame(
            [("k", base + dt.timedelta(days=i), c)
             for i, c in enumerate(cents)],
            "event_type string, day date, cents long",
        )
        got = [(r.cents, r.med, r.mad, r.outlier)
               for r in hampel_daily(d).collect()]
        want = []
        for i in range(8, len(cents)):
            win = cents[i - 8: i + 1]
            med = sorted(win)[4]
            mad = sorted(abs(v - med) for v in win)[4]
            want.append(
                (cents[i], med, mad, int(abs(cents[i] - med) > 3 * mad))
            )
        assert got == want

    def test_m4_duplicate_ts_tiebreak_and_extremes(self, spark):
        """m4_downsample: first/last follow the (ts, event_id) total
        order even when every row shares one timestamp; min/max equal
        the true extremes."""
        from weather_data_ingestion_service_spark.registry_r7 import (
            m4_downsample,
        )

        ts = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [("k", 0, c, ts, i)
                for i, c in enumerate([50, 10, 99, 30])]
        base = spark.createDataFrame(
            rows,
            "event_type string, bucket long, cents long, "
            "ts timestamp, event_id long",
        )
        r = m4_downsample(base).collect()[0]
        assert (r.n, r.v_min, r.v_max, r.v_first, r.v_last) == (
            4, 10, 99, 50, 30,
        )

    def test_ngram_novelty_planted_corpus(self, spark):
        """A verbatim re-occurrence of an earlier doc has novelty 0;
        a disjoint doc has novelty 1; short docs emit a zero row."""
        from weather_data_ingestion_service_spark.registry_r7 import (
            ngram_novelty,
        )

        first = "a b c d e f g"
        docs = spark.createDataFrame(
            [(1, first), (2, first), (3, "p q r s t u"), (4, "x y")],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty_micro)
               for r in ngram_novelty(docs).collect()}
        assert got[1] == (3, 3, 1_000_000)
        assert got[2] == (3, 0, 0)
        assert got[3] == (2, 2, 1_000_000)
        assert got[4] == (0, 0, 0)

    def test_embed_hamming_code_construction(self, spark):
        """Two vectors with equal top-8 sign bits pair up with the
        exact bit-count distance over the other 56; a vector in a
        different band never pairs."""
        from weather_data_ingestion_service_spark.registry_r7 import (
            embed_hamming_pairs,
        )

        # dims 0..55 → rest bits, 56..63 → band bits
        v_a = [1.0] * 64                    # rest = 2^56-1, band = 255
        v_b = [1.0] * 50 + [-1.0] * 6 + [1.0] * 8   # 6 rest bits differ
        v_c = [1.0] * 56 + [-1.0] * 8       # band 0 — never pairs
        emb = spark.createDataFrame(
            [(1, v_a), (2, v_b), (3, v_c)],
            "vec_id long, embedding array<float>",
        )
        rows = embed_hamming_pairs(emb, max_dist=56).collect()
        assert [(r.vec_id_a, r.vec_id_b, r.hamming) for r in rows] == [
            (1, 2, 6)
        ]
        # widening the band moves 6 of the differing rest bits INTO a
        # 16-bit band (dims 48..63): a and b now land in different
        # buckets and never pair; a and c still differ in the band
        wide = embed_hamming_pairs(emb, max_dist=56, band_bits=16).collect()
        assert wide == []

    @settings(max_examples=3, deadline=None)
    @given(seed=st.integers(0, 2**31 - 1))
    def test_minhash_ingest_is_batching_invariant(self, spark, sf_dir, seed):
        """stream_dedup_minhash's exactly-once claim as a LAW: for a
        RANDOM 3-way document partition, driving the foreachBatch
        handler batch-by-batch emits exactly the batch pairs op's
        result (each pair once, in its last member's batch)."""
        import random
        import shutil
        import uuid

        from weather_data_ingestion_service_spark.ext.dedup import (
            minhash_lsh_pairs_md5,
        )
        from weather_data_ingestion_service_spark.io import load_table
        from weather_data_ingestion_service_spark.streaming.jobs import (
            minhash_ingest_batch,
        )

        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .limit(200)
        )
        rng = random.Random(seed)
        ids = [r.doc_id for r in docs.select("doc_id").collect()]
        assign = {d: rng.randrange(3) for d in ids}
        root = f"/root/repo/.tmp/mh_inv_{uuid.uuid4().hex[:8]}"
        state_dir, pairs_dir = f"{root}/sigs", f"{root}/pairs"
        spark.createDataFrame(
            [], "id_a long, id_b long, n_equal int, jaccard_est_micro long"
        ).write.mode("overwrite").parquet(pairs_dir)
        handle = minhash_ingest_batch(spark, state_dir, pairs_dir)
        docs = docs.persist()
        try:
            for b in range(3):
                members = [d for d, k in assign.items() if k == b]
                handle(docs.filter(F.col("doc_id").isin(members)), b)
            got = sorted(
                tuple(r)
                for r in spark.read.parquet(pairs_dir)
                .select("id_a", "id_b", "n_equal", "jaccard_est_micro")
                .collect()
            )
            want = sorted(
                tuple(r)
                for r in minhash_lsh_pairs_md5(docs, "doc_id", "text").collect()
            )
            assert got == want
        finally:
            docs.unpersist()
            shutil.rmtree(root, ignore_errors=True)

    @settings(max_examples=5, deadline=None)
    @given(
        vals=st.lists(st.integers(0, 100), min_size=3, max_size=24),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_m4_merge_is_batching_invariant(self, spark, vals, seed):
        """stream_downsample_m4's claim, exercised with REAL multi-way
        splits: merging per-batch M4 partials equals the one-shot M4
        for any 3-way partition of the rows."""
        import random

        from weather_data_ingestion_service_spark.registry_r7 import (
            m4_merge,
            m4_partial,
        )

        rows = [
            ("k", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=7 * i),
             i, float(v))
            for i, v in enumerate(vals)
        ]
        schema = ("event_type string, ts timestamp, event_id long, "
                  "value double")
        rng = random.Random(seed)
        parts = [[], [], []]
        for r in rows:
            parts[rng.randrange(3)].append(r)
        partials = [
            m4_partial(spark.createDataFrame(p, schema))
            for p in parts if p
        ]
        merged = partials[0]
        for nxt in partials[1:]:
            merged = merged.unionByName(nxt)
        got = [tuple(r) for r in m4_merge(merged).collect()]
        want = [tuple(r) for r in
                m4_merge(m4_partial(
                    spark.createDataFrame(rows, schema))).collect()]
        assert got == want


class TestRound8Laws:
    def test_forecast_skill_date_join_skips_gap_days(self, spark):
        """agg_forecast_skill's lag alignment is an exact DATE join:
        a missing day contributes no (t, t−k) pair — lag()-over-rows
        would silently pair across the gap.  Series: days 1,2,4 (day 3
        missing) → lag-1 pairs are (2←1) and nothing else (4's
        predecessor day 3 is absent); lag-7 yields none."""
        import datetime as dt

        from weather_data_ingestion_service_spark.registry import _cents
        from weather_data_ingestion_service_spark.registry_r8 import (
            forecast_skill,
        )

        rows = [
            ("a", dt.datetime(2024, 1, d, 12), float(v))
            for d, v in [(1, 10.0), (2, 13.0), (4, 99.0)]
        ]
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        )
        d = df.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        ).agg(F.sum(_cents("value")).cast("long").alias("cents"))
        got = [tuple(r) for r in forecast_skill(d).collect()]
        # only (day2 ← day1) pairs at lag 1: n=1, |err|=300, err=+300,
        # |actual|=1300; day4's predecessor (day3) is missing; lag 7
        # yields no pairs at all (the group simply doesn't appear)
        assert got == [("a", 1, 1, 300, 300, 1300)]


class TestTriangleCensusLaw:
    @settings(max_examples=6, deadline=None)
    @given(
        edges=st.sets(
            st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=3,
            max_size=30,
        )
    )
    def test_degree_oriented_census_equals_brute_force(self, spark, edges):
        """Law: the degree-oriented wedge join counts exactly the
        brute-force per-node triangle census on ANY small graph —
        orientation changes the join fan-out, never the result."""
        from itertools import combinations

        from weather_data_ingestion_service_spark.registry_r8 import (
            degree_oriented_edges,
        )

        und = {(min(a, b), max(a, b)) for a, b in edges}
        pairs = spark.createDataFrame(sorted(und), "a long, b long")
        e = degree_oriented_edges(pairs).persist()
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        tri = (
            e1.join(e2, F.col("e1.y") == F.col("e2.x"))
            .join(
                e3,
                (F.col("e3.x") == F.col("e1.x"))
                & (F.col("e3.y") == F.col("e2.y")),
            )
            .select(
                F.col("e1.x").alias("a"),
                F.col("e1.y").alias("b"),
                F.col("e2.y").alias("c"),
            )
        )
        got = {
            r.vec_id: r.n
            for r in tri.select(
                F.explode(F.array("a", "b", "c")).alias("vec_id")
            )
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        e.unpersist()
        nodes = {v for p in und for v in p}
        want: dict[int, int] = {}
        for x, y, z in combinations(sorted(nodes), 3):
            if (
                (x, y) in und and (y, z) in und and (x, z) in und
            ):
                for v in (x, y, z):
                    want[v] = want.get(v, 0) + 1
        assert got == want


class TestBufferedSessionizerLaw:
    @settings(max_examples=5, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.integers(0, 2),            # user
                st.integers(0, 4320),         # minute offset within 3 days
                st.integers(0, 1),            # batch assignment
            ),
            min_size=1,
            max_size=25,
        )
    )
    # ADVICE-r9 counterexample: every event in batch 1 leaves batch 0
    # empty; a flush-derived filler there advanced the watermark past
    # all real events and dropped them as late.
    @example(data=[(0, 0, 1)])
    def test_arrival_order_invariance(self, spark, data):
        """Law: sessions_buffered emits EXACTLY the batch gap-islands
        regardless of which micro-batch each event arrives in — the
        watermark delay (4 d) exceeds the 3-day event span, so no
        arrival order can drop or split anything, and a far-future
        flush event in the last batch closes every real session.  The
        eager sessionizer violates this law for out-of-order splits;
        the buffered one may not."""
        import datetime as dt
        import os
        import shutil
        from itertools import count

        from weather_data_ingestion_service_spark.streaming.jobs import (
            run_stream_to_memory,
        )
        from weather_data_ingestion_service_spark.streaming.stateful import (
            sessions_buffered,
        )

        t0 = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
        eid = count(1)
        batches = [[], []]
        for user, minute, b in data:
            ts = t0 + dt.timedelta(minutes=minute)
            batches[b].append((next(eid), user, int(ts.timestamp() * 1e6)))
        # flush: a sentinel user far in the future, final batch only
        flush = t0 + dt.timedelta(days=40)
        batches[1].append((next(eid), 999, int(flush.timestamp() * 1e6)))

        path = "/root/repo/.tmp/stream_tests/sess_buffered_law"
        shutil.rmtree(path, ignore_errors=True)
        now = 1_700_000_000
        early = t0 - dt.timedelta(days=1)
        for i, rows in enumerate(batches):
            if not rows:
                # Only batch 0 can be empty (batch 1 always holds the
                # flush sentinel).  The filler must NOT be flush-derived:
                # a day-40 filler in batch 0 pushes the watermark to day
                # 36 and every real event (<= day 3) in batch 1 would be
                # dropped as late — use a pre-t0 sentinel instead.
                rows = [(next(eid), 999, int(early.timestamp() * 1e6) - i)]
            sub = os.path.join(path, f"f{i}")
            spark.createDataFrame(
                rows, "event_id long, user_id long, ts_us long"
            ).selectExpr(
                "event_id", "user_id", "timestamp_micros(ts_us) AS ts"
            ).coalesce(1).write.parquet(sub)
            for f in os.listdir(sub):
                os.utime(os.path.join(sub, f), (now + i * 3600, now + i * 3600))

        stream = (
            spark.readStream.schema("event_id long, user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(path + "/f*")
        )
        got = sorted(
            (r.key, r.session_start, r.session_end, r.n_events)
            for r in run_stream_to_memory(
                sessions_buffered(stream, "user_id", "ts",
                                  gap_seconds=1800, watermark="4 days"),
                "append",
            ).collect()
            if r.key != 999
        )
        # batch truth: gap islands per user over ALL real events
        per_user: dict[int, list] = {}
        for user, minute, _ in data:
            per_user.setdefault(user, []).append(
                (t0 + dt.timedelta(minutes=minute)).replace(tzinfo=None)
            )
        want = []
        for user, tss in per_user.items():
            tss.sort()
            island = [tss[0]]
            for t in tss[1:]:
                if (t - island[-1]).total_seconds() > 1800:
                    want.append((user, island[0], island[-1], len(island)))
                    island = [t]
                else:
                    island.append(t)
            want.append((user, island[0], island[-1], len(island)))
        assert got == sorted(want)
        shutil.rmtree(path, ignore_errors=True)
