#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the sum of per-query wall-clock seconds (each query fully
executed via a noop-sink write so every operator materializes).

Each query runs ``SPARK_GRAFT_BENCH_REPS`` times (default 3) and
reports the per-query MINIMUM: shared-session noise (GC pressure from
neighboring queries, scheduler contention, JIT warmup) inflates
individual samples uniformly upward, so the min is the attributable
plan cost — a regression in min-of-3 is a plan regression, not session
drift (the round-2 bench showed a uniform ~1.28x drift on unchanged
plans with single samples).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline suite: the flagship + the operator families that dominate
#: cost at scale (wide agg, star join, as-of, windowing, union-dedup,
#: bucketing, top-k)
HEADLINE = [
    "wx_daily_summary",
    "agg_multi",
    "bench_q3",
    "bench_q6",
    "join_equi_inner",
    "join_asof_nearest",
    "bucket_hourly",
    "win_rank",
    "set_union_history_forecast",
    "sort_topk",
    "agg_rollup",
    "ext_dedup_exact",
    "ext_dedup_ngram",
    "ext_simsearch_topk",
    "ext_text_analysis",
    # LLM-pipeline heavies: regressions in the dedup/ANN stack must be
    # visible round-over-round (superset of the r01 suite)
    "ext_dedup_cluster",
    "ext_simsearch_lsh",
    "ext_dedup_embedding",
    "join_asof_chunked",
    # round-3 additions (r01 ⊂ r02 ⊂ r03): the remaining heavy
    # LLM-pipeline stages — TF-IDF keywording, n-gram decontamination,
    # sequence packing, semantic dedup end-to-end
    "ext_text_tfidf",
    "ext_text_contamination",
    "ext_pack_sequences",
    "ext_dedup_semantic",
    # round-4 additions (r01 ⊂ r02 ⊂ r03 ⊂ r04): newly driver-green
    # heavies — URL canonicalization dedup, SCD2 window chains,
    # equi-width histogram agg, tolerance-bounded as-of join
    "ext_dedup_url",
    "win_scd2",
    "agg_histogram",
    "join_asof_tolerance",
    # round-4 second batch: the heavy composites added this round —
    # TPC-H Q18/Q7/Q2 shapes, the funnel, and the vocab builder
    "bench_q18",
    "bench_q7",
    "bench_q2",
    "win_funnel",
    "ext_tokenizer_vocab",
    "agg_median_mad",
    # round-4 third batch: the second-wave heavies — the 5-way star
    # join (Q9), the outer-join distribution (Q13), the decorrelated
    # threshold join (Q17), the runtime-filtered join, and the two
    # corpus-pass LLM stages (quality gate, exact AUC)
    "bench_q9",
    "bench_q13",
    "bench_q17",
    "join_bloom_prefilter",
    "ext_filter_c4",
    "ext_eval_auc",
    # round-4 fourth batch: the deepest star (Q8), the blame
    # self-aggregation (Q21), the curation pipeline end-to-end, the
    # sub-document chunk scan, the dataset card, and the k-NN graph
    "bench_q8",
    "bench_q21",
    "ext_pipeline_e2e",
    "ext_dedup_chunks",
    "ext_data_card",
    "ext_knn_graph",
    # round-5 additions (r01 ⊂ … ⊂ r05): the previously-unbenched
    # heavies — integer PageRank over the near-dup graph, incremental
    # dedup vs the admitted corpus, the streaming-curation batch twin,
    # and MinHash+LSH near-dup (newly fixed explode barrier)
    "ext_graph_pagerank",
    "ext_dedup_incremental",
    "stream_curation_pipeline",
    "ext_dedup_near",
    # round-6 additions (r01 ⊂ … ⊂ r06): the two perceptual-hash dedup
    # stages upgraded to oracle status this round — SimHash banding
    # (pandas_udf fingerprints + band self-join) and the planted-PNG
    # aHash grouping (stdlib decode in mapInPandas + hash window)
    "ext_dedup_simhash",
    "ext_multimodal_phash",
    # round-6 second batch: the new whole-corpus passes — the Zipf
    # vocabulary head (classic wordcount), the 20x Poisson-bootstrap
    # fan-out, and the tokenize+distinct skyline reduction
    "ext_text_zipf",
    "ext_sample_bootstrap",
    "agg_skyline_2d",
    # round-6 third batch: the mapInArrow character pass over the
    # corpus and the gap-islands streak pass over raw events
    "ext_text_charstats",
    "win_longest_streak",
    # round-6 fourth batch: the deterministic sketch family — batch
    # Count-Min, the Linear-Counting/KMV distinct components, and the
    # streaming foreachBatch Count-Min maintenance run
    "ext_sketch_cms",
    "ext_sketch_distinct",
    "stream_sketch_cms",
    # round-7 additions (consolidation round): the corpus-pass gram
    # novelty sweep, the banded Hamming pair search, the M4 reduction
    # over raw events, and the JSONL rescue round-trip
    "ext_text_ngram_novelty",
    "ext_embed_hamming",
    "win_downsample_m4",
    "stream_downsample_m4",
    "src_jsonl_scan",
    # round-8 additions (consolidation): the real session-window
    # stream, the md5 MinHash+LSH oracle twin, the hash-sampled
    # IVF-flat, and the Hamming-graph triangle census
    "stream_session_exec",
    "stream_sliding_exec",
    "stream_dedup_minhash",
    "ext_dedup_minhash_md5",
    "ext_simsearch_ivf_md5",
    "ext_simsearch_pq_md5",
    "ext_graph_triangles",
    "ext_eval_dedup_md5",
    # round-9 additions: the IVF-PQ composition (probed-list ADC), the
    # GK error-contract bracket (full window sort + sketch per group),
    # the 2-micro-batch stateful sessionization replay, and the
    # watermark-buffered exact sessionizer (event-buffering state)
    "ext_simsearch_ivfpq",
    "agg_quantile_bounds",
    "stream_sessionize_exec2",
    "stream_sessionize_buffered",
    # round-10 additions: the IVF-PQ index LIFECYCLE — build runs
    # FIRST (one-time encode + partitioned write), so the query row
    # right after it shows the amortized per-query serving cost the
    # inline ext_simsearch_ivfpq row pays in full every time
    "ext_simsearch_index_build",
    "ext_simsearch_index_query",
    # round-10 second batch: the streaming HLL merge run, the Gram-pass
    # power iteration, the real-codec resize round trip, and the
    # 10-round distributed BPE trainer (job-scheduling heavy)
    "stream_distinct_bounds",
    "ext_embed_power_iteration",
    "ext_multimodal_resize_exact",
    "ext_tokenizer_bpe_exact",
    # round-10 third batch: streaming index ingest (foreachBatch
    # encode-on-arrival) and the full ingest→compact→serve flow
    "stream_simsearch_index",
    "ext_simsearch_index_compact",
    # round-11 additions: the serving-grade trained IVF-PQ + refine
    # (17 codebook fits + encode + probed ADC + exact-int8 re-rank),
    # its hash-pinned recall gate, the epoch-supersedence upsert flow,
    # the exact text-redundancy twin, and the weather-path end-to-end
    # pipeline (one Catalyst plan, 4 exchanges)
    "ext_simsearch_ivfpq_refined",
    # trained-index lifecycle: build runs FIRST, then the amortized
    # serve row and the recall gate (both read the persisted index)
    "ext_simsearch_index_refined_build",
    "ext_simsearch_index_refined_serve",
    "ext_eval_ivfpq_recall_trained",
    "ext_simsearch_index_upsert",
    "ext_text_redundancy_exact",
    "wx_pipeline_e2e",
    # round-11 second batch: the clipped n-gram overlap evaluator —
    # a two-granularity corpus pass (uni+bi grams) whose counts
    # shuffle on (n, pair, gram); the climate-normals/TX90p entries
    # are constant-size (wx twin) and stay out of the suite
    "ext_eval_ngram_overlap",
    # round-12 additions: upsert/delete on the TRAINED serving-config
    # index (runs after the refined build so the ensure is a no-op)
    # and the retrain-drift gate (reads the upserted serving layout);
    # the ETCCDI extremes are constant-size (wx twin) and stay out of
    # the suite; ext_simsearch_index_retrain and stream_refined_index
    # stay out too — both are build+encode re-runs whose cost the
    # refined-build row and its per-stage split already attribute
    "ext_simsearch_index_refined_upsert",
    "ext_eval_index_drift",
    # round-12 second batch: the fused single-pass truncated-dim
    # recall eval (one broadcast corpus pass, 3 ranks)
    "ext_eval_matryoshka",
]

#: iterative heavies also get a NO-NEIGHBOR sample: one extra timing
#: each, taken back-to-back at the end of the run from a
#: clearCache+GC'd JVM with no interleaved suite neighbors — the
#: number to read when an in-suite min drifts (BASELINE.md r4:
#: ext_dedup_cluster 5.2 s in-suite vs 2.8 s isolated was suite noise
#: plus a real recompute, only visible with this sample)
ISOLATED = [
    "ext_dedup_cluster",
    "ext_dedup_ngram",
    "ext_knn_graph",
    "ext_graph_pagerank",
    "ext_pipeline_e2e",
    # r6 judge: win_scd2 wobbled 0.41->0.69 s in-suite with untouched
    # code; the isolated sample makes suite noise separable by
    # construction next round
    "win_scd2",
    # r11 judge: stream_dedup_minhash drifted 3.24->4.22 anchor-over-
    # anchor; round-12 isolated probes read it inside the iterative
    # noise band once ambient host drift is factored out — keep the
    # clean sample so future rounds separate it by construction
    "stream_dedup_minhash",
    # r12 judge #7: the remaining >5 s in-suite rows get isolated
    # samples too, so suite-neighbor noise is separable for them by
    # construction (the exact failure mode ext_knn_graph hit in r12)
    "stream_simsearch_index",
    "stream_sessionize_buffered",
    "ext_eval_dedup_md5",
    # r13 judge #6: the only residual anchor movers (1.15-1.19x
    # mid-round r13) without isolated attribution — carry the
    # no-neighbor sample so their drift is classifiable by
    # construction like the rows above
    "ext_simsearch_index_build",
    "ext_simsearch_index_query",
]


def main() -> None:
    from weather_data_ingestion_service_spark.session import get_spark
    from weather_data_ingestion_service_spark import registry

    spark = get_spark(app_name="wds-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    suite = [q for q in HEADLINE if q in qs]

    # warm the JVM + parquet footers once so timings measure the
    # queries, not session startup
    qs[suite[0]](spark, SF_DIR).count()

    # warm the Python-UDF workers + Arrow transfer path too: spawning
    # the per-core Python workers is a one-time process cost (~2 s on
    # local[32]) that would otherwise land entirely on whichever
    # pandas_udf query happens to run first
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf signature inference rejects
    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).select(_warm("id")).count()

    # streaming cold-start warmup (VERDICT r14 #7, additions-only,
    # OUTSIDE the timed region): the first Structured Streaming query
    # in a session pays a one-time 10-33 s machinery cost (micro-batch
    # execution classloading, state-store init, commit-log setup) that
    # otherwise lands entirely on whichever streaming row runs first —
    # r13/r14 both measured the first-in-session streaming row 2-5x
    # its steady state.  One throwaway availableNow micro-batch with a
    # stateful aggregate absorbs it so every timed streaming row
    # measures its plan, not session initialization.
    import shutil
    import tempfile

    wdir = tempfile.mkdtemp(prefix="wds_bench_stream_warm_")
    try:
        spark.range(4).coalesce(1).write.mode("overwrite").parquet(
            wdir + "/in"
        )
        sq = (
            spark.readStream.schema("id bigint")
            .parquet(wdir + "/in")
            .groupBy("id")
            .count()
            .writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", wdir + "/ck")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    # rep-major order (full suite, then the next pass) so one query's
    # reps aren't back-to-back benefiting from its own hot caches more
    # than the single-sample rounds did
    for rep in range(reps):
        for name in suite:
            # start every sample from a consistent JVM state: drop
            # blocks persisted by the PREVIOUS query (iterative
            # queries localCheckpoint/persist internally) and collect
            # the garbage they left — accumulated heap pressure from
            # suite neighbors inflated the iterative heavies ~25%
            # (ext_dedup_cluster: 5.4 s after four heavies vs 3.4 s
            # isolated; 4.2 s with this reset), which is session
            # noise, not plan cost
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.setdefault(name, []).append(time.perf_counter() - t0)
    timings = {name: round(min(ts), 3) for name, ts in samples.items()}

    isolated: dict[str, float] = {}
    for name in ISOLATED:
        if name not in qs:
            continue
        best = float("inf")
        # 3 samples: with the suite preceding these, a min-of-2 still
        # caught residual heap-pressure outliers (ext_knn_graph 4.5 s
        # vs a fresh-session steady 3.0 s in r7)
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        isolated[name] = round(best, 3)

    # per-stage sub-timings for multi-stage lifecycle entries (VERDICT
    # r10 #8): the suite row times the WHOLE flow; these rows attribute
    # it, so a regression in one stage is visible instead of drowned.
    # Keys are "<entry>/<stage>"; they do NOT sum exactly to the suite
    # row (separate run, own cache state) — read them as ratios.
    from weather_data_ingestion_service_spark.registry_r10 import (
        _index_compact_stages,
    )

    from weather_data_ingestion_service_spark.registry_r11 import (
        _index_upsert_stages,
        _refined_build_stages,
    )

    from weather_data_ingestion_service_spark.registry_r12 import (
        _refined_upsert_stages,
    )

    for entry, stage_fn in [
        ("ext_simsearch_index_compact", _index_compact_stages),
        ("ext_simsearch_index_refined_build", _refined_build_stages),
        # VERDICT r11 #3: the two upsert flows attributed per verb
        ("ext_simsearch_index_upsert", _index_upsert_stages),
        ("ext_simsearch_index_refined_upsert", _refined_upsert_stages),
    ]:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        stages, _state = stage_fn(spark, SF_DIR)
        for stage_name, fn in stages:
            t0 = time.perf_counter()
            fn()
            isolated[f"{entry}/{stage_name}"] = round(
                time.perf_counter() - t0, 3
            )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "isolated": isolated,
        "sf": float(sf),
        "reps": reps,
        "agg": "min",
    }
    # VERDICT r11 #4: the driver's BENCH_rN.json artifact keeps only a
    # stdout *tail*, which truncated the per-query dict to 46 of ~100
    # rows in r11. Persist the complete result to a stable file so
    # round-over-round diffs never depend on tail luck.
    with open(os.path.join(REPO, "bench_results.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # VERDICT r14 tail hardening: BENCH_r13.json's tail window cut into
    # the JSON line and left it unparseable.  Emit the line COMPACT
    # (no separator whitespace) and make it the LAST stdout bytes of
    # the process — spark.stop() runs first so no shutdown output can
    # land after it and push the line's head out of a byte-capped tail.
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
