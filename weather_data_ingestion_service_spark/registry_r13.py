"""Round-13 registry entries.

Headline: the index GENERATION SWAP — the serve-during-retrain pointer
flip the round-12 retrain verb stopped short of (VERDICT r12 #2) — plus
its failure path (gate-checked ROLLBACK with un-retire), DELTA
compaction (rewrite only touched lists, hardlink the rest — I/O ∝
touched lists, with the streaming continuous-compaction composition
and the hardlink-safe vacuum retention verb), the deleted-list recall
blind spot as a hash-green planted-hole entry (VERDICT r12 #3), the
streaming ingest → drift gate → retrain composition (VERDICT r12 #6),
and two calendar-config climate indices over a 3-year md5 twin record:
ETCCDI TX90p at the true ±2-day calendar percentile window (VERDICT
r12 #5) and Growing Season Length (spell-trigger + after-midyear
selection).

Reference parity: the reference service (server.py) has no ANN or
climate-index path — these are the large-scale training-data-pipeline
and climate-analytics extensions the build brief mandates.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .io import load_table, local_frame
from .registry import register
from .registry_r12 import _DRIFT_MIN_RECALL_MICRO, _LIVE_WHERE


# =====================================================================
# A. Index GENERATION SWAP — serve-during-retrain (VERDICT r12 #2)
# =====================================================================


def _swap_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    cols = """CAST(query_id AS BIGINT) AS query_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(rank AS BIGINT) AS rank, adc, refine_micro"""
    return f"""
    SELECT * FROM (
      WITH RECURSIVE {_ivfpq_refined_ctes()}
      SELECT CAST(0 AS BIGINT) AS generation, {cols} FROM refined)
    UNION ALL
    SELECT * FROM (
      WITH RECURSIVE live AS (
        SELECT vec_id, embedding FROM embeddings WHERE {_LIVE_WHERE}),
      {_ivfpq_refined_ctes(src="live")}
      SELECT CAST(1 AS BIGINT) AS generation, {cols} FROM refined)
    ORDER BY generation, query_id, rank
    """


@register("ext_simsearch_index_swap", _swap_oracle())
def q_ext_simsearch_index_swap(spark, sf_dir):
    """GENERATION SWAP — serve-during-retrain (VERDICT r12 #2): the
    round-12 retrain verb builds generation N+1 into its own directory
    "while the old one keeps serving", and THIS entry exercises the
    swap itself: a tiny append-only generation MANIFEST is the pointer
    every query-path consumer resolves through; retrain appends the
    new generation's row, ONE further append flips the pointer (N+1
    active, N retired), and the retired generation is garbage-collected
    only once no reader needs it.

    Hash-pinned END TO END: top-3 is served THROUGH THE POINTER both
    before the flip (generation 0 — the full-corpus trained index;
    oracle = the unrestricted serving-config replay) and after it
    (generation 1 — retrained on the live post-delete corpus; oracle =
    the retrain replay), published under a ``generation`` column, so a
    pointer that resolves to the wrong generation, a flip that leaks a
    stale score, or a GC that breaks the new generation's layout all
    fail the hash (the lifecycle-split-cannot-change-a-score
    discipline, registry_r10 precedent).  The pre-flip serve runs
    ``eager`` (materialized before GC deletes generation 0 — exactly
    the barrier a real swap needs: in-flight queries finish on the old
    generation before its files go).  At 100 TB: the manifest is a
    handful of control-plane rows; the flip is one append — no
    downtime, no index-sized move beyond the retrain itself."""
    import shutil

    from .ext.simsearch import (
        index_generation_active,
        index_generation_append,
        index_generation_states,
        ivfpq_refined_build_index,
        ivfpq_refined_query_index,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    _clean_stale_scratch("/tmp/wds_swap_*")
    root = f"/tmp/wds_swap_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    manifest = f"{root}/manifest"

    # generation 0: the full-corpus trained index, copied into its own
    # generation directory (control-plane copy — GC of a retired
    # generation must never touch the shared session index)
    gen0 = f"{root}/gen0"
    shutil.copytree(_ensure_refined_index(spark, sf_dir), gen0)
    index_generation_append(spark, manifest, [(0, gen0, 0, 1)])

    emb = load_table(spark, sf_dir, "embeddings")
    q_all = emb.filter(F.col("vec_id") < _RT["n_queries"])

    def serve_through_pointer(expect_gen, queries):
        gen, path = index_generation_active(spark, manifest)
        if gen != expect_gen:  # load-bearing lifecycle check — never
            # a bare assert (stripped under python -O; ADVICE r13 #3)
            raise RuntimeError(
                f"pointer resolved generation {gen}, expected {expect_gen}"
            )
        return ivfpq_refined_query_index(
            spark, path, queries, "vec_id", "embedding",
            k=_RT["k"], nprobe=_RT["nprobe"], shortlist=_RT["shortlist"],
            m=_RT["m"], dim=_RT["dim"],
        ).withColumn("generation", F.lit(expect_gen).cast("long"))

    # pre-flip: queries resolve through the pointer to generation 0;
    # eager (default) materializes the result BEFORE gen0 is GC'd
    pre = serve_through_pointer(0, q_all)

    # retrain generation 1 from the LIVE corpus while gen0 serves
    live = emb.filter(F.expr(_LIVE_WHERE))
    gen1 = f"{root}/gen1"
    ivfpq_refined_build_index(
        live, gen1, "vec_id", "embedding",
        n_clusters=_RT["n_clusters"], ksub=_RT["ksub"], m=_RT["m"],
        n_iter=_RT["n_iter"], dim=_RT["dim"],
    )

    # THE FLIP: one manifest append marks gen1 active and retires gen0
    index_generation_append(
        spark, manifest, [(1, gen1, 1, 1), (0, gen0, 1, 0)]
    )

    # GC: retired generations (latest state inactive) are reclaimed —
    # the pre-flip result is already materialized, so no reader needs
    # generation 0's files
    for row in index_generation_states(spark, manifest).collect():
        if int(row["active"]) == 0:
            shutil.rmtree(row["path"], ignore_errors=True)

    # post-flip: the SAME pointer read now lands on generation 1
    post = serve_through_pointer(1, live.filter(
        F.col("vec_id") < _RT["n_queries"]
    ))

    return (
        pre.unionByName(post)
        .select(
            "generation", "query_id", "match_id", "rank", "adc",
            "refine_micro",
        )
        .orderBy("generation", "query_id", "rank")
    )


# =====================================================================
# B. Deleted-list recall blind spot — the planted empty-list hole
#    (VERDICT r12 #3)
# =====================================================================


def _hole_dist(a, b):
    """The replay's exact squared-distance text on the shared ×256
    grid — must match ``_ivfpq_refined_ctes``'s ``lists`` CTE
    byte-for-byte so the hole predicate selects EXACTLY the list the
    index assigns."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        " z -> (z[1]-z[2])*(z[1]-z[2])))"
    )


def _hole_where():
    """Live-rows predicate deleting EVERY member of the coarse list
    that query 0's EXACT nearest neighbor assigns to — the planted
    "my true top hit lived in the now-empty list" case.  The target id
    is the brute-force cosine top-1 (the drift oracle's exact-side
    ranking, same total order (cosine DESC, vec_id)); its list — and
    every member's assignment — is re-derived inside the predicate
    from the same ``qv``/``coarse`` CTEs the replay builds, under the
    same total order (distance, cid), so the oracle's hole is
    bit-identical to the one the Spark side reads off the built
    index's cid partitions."""
    from .registry_ext import _COSINE_SQL

    cos = _COSINE_SQL.format(a="e0.embedding", b="ec.embedding")
    return f"""vec_id NOT IN (
      SELECT hx.vec_id FROM (
        SELECT qh.vec_id, ch.cid,
               row_number() OVER (PARTITION BY qh.vec_id ORDER BY
                 {_hole_dist("qh.q256", "ch.cvec")}, ch.cid) AS rn
        FROM qv qh, coarse ch) hx
      WHERE hx.rn = 1 AND hx.cid IN (
        SELECT hy.cid FROM (
          SELECT qy.vec_id, cy.cid,
                 row_number() OVER (PARTITION BY qy.vec_id ORDER BY
                   {_hole_dist("qy.q256", "cy.cvec")}, cy.cid) AS rn
          FROM qv qy, coarse cy) hy
        WHERE hy.rn = 1 AND hy.vec_id = (
          SELECT t1.vec_id FROM (
            SELECT ec.vec_id,
                   row_number() OVER (ORDER BY {cos} DESC, ec.vec_id)
                     AS rn
            FROM embeddings e0, embeddings ec
            WHERE e0.vec_id = 0 AND ec.vec_id <> 0) t1
          WHERE t1.rn = 1)))"""


def _list_hole_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    return f"""
    WITH RECURSIVE {_ivfpq_refined_ctes(live_where=_hole_where())}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(rank AS BIGINT) AS rank, adc, refine_micro
    FROM refined ORDER BY query_id, rank
    """


@register("ext_simsearch_index_list_hole", _list_hole_oracle())
def q_ext_simsearch_index_list_hole(spark, sf_dir):
    """DELETED-LIST recall blind spot (VERDICT r12 #3) — the
    degenerate case real ANN systems hit that the round-12 tombstone
    pattern never tested: a probe list whose vectors are ALL deleted
    (an EMPTY list after compaction) for a query whose true neighbors
    lived in that list.  The hole is planted deterministically: every
    member of the coarse list holding query 0's EXACT nearest neighbor
    (brute-force cosine top-1 — the true top hit becomes unreachable)
    is tombstoned, the epoch
    store is superseded and compacted, and top-3 is served through the
    pruned layout — the serve path must return k results per query
    from the surviving lists, scan the now-nonexistent partition as
    zero rows (not an error), and score them identically to the
    replay.  The oracle re-derives the hole INSIDE the live-rows
    predicate — the same (distance, cid) assignment ranking the
    ``lists`` CTE uses — so a Spark-side hole that differs by even one
    member fails the hash.  At 100 TB: a dead list costs nothing at
    query time (partition pruning skips what is not there); the gate
    is that the shortlist still fills from the remaining probes."""
    import shutil

    from .ext.simsearch import (
        ivfpq_refined_apply_epochs,
        ivfpq_refined_compact_epochs,
        ivfpq_refined_encode_epoch,
        ivfpq_refined_query_index,
        ivfpq_refined_tombstones,
        load_refined_codebooks,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    from .ext.simsearch import cosine_topk

    idx = _ensure_refined_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    # the hole: the coarse list holding query 0's exact top-1
    # neighbor, read off the built index's own cid partitions
    top1 = int(
        cosine_topk(
            emb, emb.filter(F.col("vec_id") == 0), "vec_id",
            "embedding", k=1,
        ).first()["match_id"]
    )
    vecs = spark.read.parquet(idx + "/vectors")
    cid0 = int(
        vecs.filter(F.col("match_id") == top1).select("cid").first()["cid"]
    )
    dead = vecs.filter(F.col("cid") == cid0).select("match_id")

    _clean_stale_scratch("/tmp/wds_hole_*")
    root = f"/tmp/wds_hole_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    ingest, serving = f"{root}/ingest", f"{root}/serving"

    cb = load_refined_codebooks(spark, idx, _RT["m"])
    ivfpq_refined_encode_epoch(
        emb, cb[0], cb[1], _RT["m"], _RT["dim"]
    ).write.mode("overwrite").parquet(f"{ingest}/epoch=0")
    ivfpq_refined_tombstones(
        emb.join(
            dead, emb["vec_id"] == dead["match_id"], "left_semi"
        )
    ).write.mode("overwrite").parquet(f"{ingest}/epoch=1")
    live = ivfpq_refined_apply_epochs(spark, ingest)
    ivfpq_refined_compact_epochs(spark, idx, live, serving)

    return ivfpq_refined_query_index(
        spark,
        serving,
        emb.filter(F.col("vec_id") < _RT["n_queries"]),
        "vec_id",
        "embedding",
        k=_RT["k"],
        nprobe=_RT["nprobe"],
        shortlist=_RT["shortlist"],
        m=_RT["m"],
        dim=_RT["dim"],
    )


# =====================================================================
# C. Streaming ingest → drift gate → retrain composition
#    (VERDICT r12 #6)
# =====================================================================

#: the planted streaming fault: a poisoned decode path silently drops
#: every other arrival — the index under-covers the catalog corpus, so
#: the gate (recall vs exact over the CATALOG truth) flips red (a
#: one-third loss measured recall_micro exactly AT the 800000
#: threshold at sf0.001 — too close to certify; half-loss sits far
#: below it at every SF)
_STREAM_LOSS_WHERE = "NOT (vec_id % 2 = 1)"


def _gate_block(stage, live_where):
    """One drift-gate evaluation as a nested-CTE SQL block: recall@k of
    the replayed index (optionally live-restricted — the planted loss)
    against exact cosine over the FULL catalog corpus, plus the
    retrain decision at the pinned threshold.  Nested ``WITH
    RECURSIVE`` keeps the two stages' replay CTEs from colliding in
    one UNION ALL query (probe-verified DuckDB supports it)."""
    from .registry_ext import _COSINE_SQL
    from .registry_r11 import _RT, _ivfpq_refined_ctes

    cos = _COSINE_SQL.format(a="eq.embedding", b="ec.embedding")
    return f"""
    SELECT * FROM (
      WITH RECURSIVE {_ivfpq_refined_ctes(live_where=live_where)},
      appr AS (SELECT query_id, match_id FROM refined),
      exact AS (
        SELECT query_id, match_id FROM (
          SELECT eq.vec_id AS query_id, ec.vec_id AS match_id,
                 row_number() OVER (PARTITION BY eq.vec_id
                   ORDER BY {cos} DESC, ec.vec_id) AS rank
          FROM embeddings eq CROSS JOIN embeddings ec
          WHERE eq.vec_id < {_RT["n_queries"]}
            AND eq.vec_id <> ec.vec_id)
        WHERE rank <= {_RT["k"]}),
      hits AS (
        SELECT e.query_id, e.match_id
        FROM exact e JOIN appr a
          ON a.query_id = e.query_id AND a.match_id = e.match_id),
      agg AS (
        SELECT
          CAST((SELECT count(DISTINCT query_id) FROM exact) AS BIGINT)
            AS n_queries,
          CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_truth,
          CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
          CAST((SELECT count(*) FROM hits) * 1000000
               // greatest((SELECT count(*) FROM exact), 1) AS BIGINT)
            AS recall_micro)
      SELECT CAST({stage} AS BIGINT) AS stage, n_queries, n_truth,
             n_hits, recall_micro,
             CAST(CASE WHEN recall_micro < {_DRIFT_MIN_RECALL_MICRO}
                       THEN 1 ELSE 0 END AS BIGINT) AS retrain_needed
      FROM agg)"""


def _stream_drift_retrain_oracle():
    return f"""
    {_gate_block(0, _STREAM_LOSS_WHERE)}
    UNION ALL
    {_gate_block(1, "")}
    ORDER BY stage
    """


@register("stream_drift_retrain", _stream_drift_retrain_oracle())
def q_stream_drift_retrain(spark, sf_dir):
    """STREAMING ingest → DRIFT GATE → RETRAIN, composed (VERDICT r12
    #6): micro-batches encode-on-arrival against the offline trained
    codebooks (the ``stream_refined_index`` foreachBatch wiring), but
    a PLANTED FAULT — a poisoned decode path that silently drops every
    other arrival — leaves the index under-covering the catalog
    corpus.  The drift gate evaluates the post-stream compacted index
    against exact cosine over the CATALOG truth (the upstream table —
    what the system believes it ingested) and flips
    ``retrain_needed=1``; the corrective verb rebuilds a NEW
    GENERATION from the catalog corpus (codebooks retrained, every
    vector re-encoded — the round-12 retrain verb across the
    generation boundary) and the gate re-evaluates green.  BOTH gate
    rows — the measured recalls and both decisions — are hash-pinned:
    stage 0 replays the index with the loss predicate, stage 1 replays
    the full rebuild, each against the unrestricted exact side.  At
    100 TB: the gate is one evaluation pass per generation; the
    retrain it authorizes is the corpus-sized verb, paid exactly once
    per detected fault."""
    import os
    import shutil

    from .ext.simsearch import (
        cosine_topk,
        ivfpq_refined_apply_epochs,
        ivfpq_refined_build_index,
        ivfpq_refined_compact_epochs,
        ivfpq_refined_encode_epoch,
        ivfpq_refined_query_index,
        load_refined_codebooks,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    idx = _ensure_refined_index(spark, sf_dir)
    cb = load_refined_codebooks(spark, idx, _RT["m"])
    _clean_stale_scratch("/tmp/wds_sdrt_*")
    root = f"/tmp/wds_sdrt_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")

    # stage the corpus as two arrival files (the stream_refined_index
    # staging pattern)
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
    now = 1_700_000_000
    for i, part in enumerate(
        [emb.filter(F.col("vec_id") <= mid),
         emb.filter(F.col("vec_id") > mid)]
    ):
        sub = os.path.join(root, "in", f"f{i}")
        part.select("vec_id", "embedding").coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (now + i * 3600, now + i * 3600))

    store = f"{root}/store"

    def handle(batch_df, epoch_id):
        # THE FAULT: the decode path silently drops vec_id % 2 == 1
        ivfpq_refined_encode_epoch(
            batch_df.filter(F.expr(_STREAM_LOSS_WHERE)),
            cb[0], cb[1], _RT["m"], _RT["dim"],
        ).write.mode("overwrite").parquet(
            f"{store}/epoch={int(epoch_id)}"
        )

    q = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(root + "/in/f*")
        .writeStream.foreachBatch(handle)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # compact the streamed epochs into a servable generation-1 layout
    gen1 = f"{root}/gen1"
    live = ivfpq_refined_apply_epochs(spark, store)
    ivfpq_refined_compact_epochs(spark, idx, live, gen1)

    q5 = emb.filter(F.col("vec_id") < _RT["n_queries"])
    exact = (
        cosine_topk(emb, q5, "vec_id", "embedding", k=_RT["k"])
        .select("query_id", "match_id")
        .persist()
    )

    def gate_row(stage, serving):
        appr = ivfpq_refined_query_index(
            spark, serving, q5, "vec_id", "embedding",
            k=_RT["k"], nprobe=_RT["nprobe"], shortlist=_RT["shortlist"],
            m=_RT["m"], dim=_RT["dim"],
        ).select("query_id", "match_id")
        n_truth = exact.count()
        n_q = exact.select("query_id").distinct().count()
        n_hits = exact.join(
            appr, ["query_id", "match_id"], "left_semi"
        ).count()
        recall_micro = n_hits * 1_000_000 // max(n_truth, 1)
        return (
            int(stage), int(n_q), int(n_truth), int(n_hits),
            int(recall_micro),
            int(recall_micro < _DRIFT_MIN_RECALL_MICRO),
        )

    try:
        row0 = gate_row(0, gen1)
        # the gate flipped: retrain generation 2 from the CATALOG
        # corpus (the upstream source of truth — the loss was
        # ingest-side, the catalog still has every row)
        gen2 = f"{root}/gen2"
        ivfpq_refined_build_index(
            emb, gen2, "vec_id", "embedding",
            n_clusters=_RT["n_clusters"], ksub=_RT["ksub"], m=_RT["m"],
            n_iter=_RT["n_iter"], dim=_RT["dim"],
        )
        row1 = gate_row(1, gen2)
    finally:
        exact.unpersist()

    return local_frame(
        spark,
        [row0, row1],
        "stage long, n_queries long, n_truth long, n_hits long,"
        " recall_micro long, retrain_needed long",
    )


# =====================================================================
# D. ETCCDI TX90p at the TRUE calendar config over a 3-year twin
#    (VERDICT r12 #5)
# =====================================================================

#: 3 synthetic years (2024 is leap): enough base-period sample that the
#: calendar-day p90 is a real selection (±2-day window × 3 years ≈ 15
#: values → rank 14), not the degenerate single-window max
_TX_YEAR_DAYS = 1095


def _tx90p_year_oracle():
    from .registry_ext import wx_twin_sql

    return f"""
    WITH wx AS ({wx_twin_sql("duckdb", days=_TX_YEAR_DAYS)}),
    d AS (SELECT location_id, CAST(ts AS DATE) AS dd,
                 CAST(max(temperature_2m) AS BIGINT) AS tx
          FROM wx WHERE temperature_2m IS NOT NULL
          GROUP BY location_id, CAST(ts AS DATE)),
    di AS (SELECT location_id, dd,
                  CAST(dayofyear(dd) AS BIGINT) AS doy, tx
           FROM d),
    contrib AS (
      SELECT location_id, unnest(range(doy - 2, doy + 3)) AS tdoy, tx
      FROM di),
    thr AS (
      SELECT location_id, tdoy,
             (list_sort(list(tx)))[(9 * count(*) + 9) // 10] AS thr,
             CAST(count(*) AS BIGINT) AS n_base
      FROM contrib GROUP BY location_id, tdoy),
    e AS (
      SELECT di.location_id, di.dd, di.tx, t.thr
      FROM di JOIN thr t
        ON t.location_id = di.location_id AND t.tdoy = di.doy)
    SELECT CAST(location_id AS BIGINT) AS location_id,
           CAST(year(dd) AS BIGINT) AS yr,
           CAST(month(dd) AS BIGINT) AS mth,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN tx > thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exceed,
           CAST(sum(CASE WHEN tx > thr THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS tx90p_micro,
           CAST(sum(thr) AS BIGINT) AS thr_sum
    FROM e GROUP BY location_id, year(dd), month(dd)
    ORDER BY location_id, yr, mth
    """


@register("agg_extreme_tx90p_year", _tx90p_year_oracle())
def q_agg_extreme_tx90p_year(spark, sf_dir):
    """ETCCDI TX90p at the TRUE calendar config (VERDICT r12 #5): the
    round-11 entry re-keyed percentiles to hour-of-day slots because
    the 21-day twin record cannot support a calendar-day base period —
    this entry extends the SAME md5 grid to a 3-year record
    (2024-2026, leap year included) and computes the real index:
    daily-max temperature TX, the 90th percentile of each CALENDAR
    day-of-year's ±2-day window pooled across all base years (≈15
    values — exact rank SELECTION at (9n+9) DIV 10 under sorted order,
    never interpolation), and the monthly per-location percentage of
    days with TX above that calendar threshold (floor-micro), with the
    threshold table pinned through ``thr_sum``.

    Scale shape: the hourly record reduces to daily grain FIRST (a
    map-side-combining aggregate — 24× smaller before any window
    work; it runs once per branch, threshold-build and exceedance —
    a production pipeline materializes the daily rollup once as the
    shared input), the calendar pooling is an explode-by-5 + hash
    aggregate on
    (location, day-of-year) — 1830 uniform groups, no window sort over
    the hourly record at all — and the 1830-row threshold table
    broadcasts back onto the daily series for a shuffle-free
    exceedance count.  At 100 TB (thousands of stations × decades)
    every stage keys on (station, calendar-day): uniform by
    construction, no skew, no driver collect."""
    from .registry_ext import wx_twin_sql
    from .session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark", days=_TX_YEAR_DAYS))
    d = (
        wx.filter(F.col("temperature_2m").isNotNull())
        .groupBy("location_id", F.col("ts").cast("date").alias("dd"))
        .agg(F.max("temperature_2m").cast("long").alias("tx"))
    )
    di = d.withColumn("doy", F.dayofyear("dd").cast("long"))
    contrib = di.select(
        "location_id",
        F.explode(
            F.sequence(F.col("doy") - 2, F.col("doy") + 2)
        ).alias("tdoy"),
        "tx",
    )
    thr = contrib.groupBy("location_id", "tdoy").agg(
        F.expr(
            "element_at(sort_array(collect_list(tx)),"
            " CAST((9 * count(*) + 9) DIV 10 AS INT))"
        ).alias("thr"),
        F.count(F.lit(1)).cast("long").alias("n_base"),
    )
    e = (
        di.alias("di")
        .join(
            F.broadcast(thr.alias("t")),
            F.expr(
                "t.location_id = di.location_id AND t.tdoy = di.doy"
            ),
        )
        .select(
            F.col("di.location_id").alias("location_id"),
            "dd", "tx", "thr",
        )
    )
    exceed = F.when(F.col("tx") > F.col("thr"), 1).otherwise(0)
    return (
        e.groupBy(
            F.col("location_id").cast("long").alias("location_id"),
            F.year("dd").cast("long").alias("yr"),
            F.month("dd").cast("long").alias("mth"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(exceed).cast("long").alias("n_exceed"),
            F.expr(
                "CAST(sum(CASE WHEN tx > thr THEN 1 ELSE 0 END)"
                " * CAST(1000000 AS BIGINT) DIV count(*) AS BIGINT)"
            ).alias("tx90p_micro"),
            F.sum("thr").cast("long").alias("thr_sum"),
        )
        .orderBy("location_id", "yr", "mth")
    )


# (Round-13 `_register_new_this_round` tail deleted at round-14 start
# per the CLAUDE.md rotation checklist — its ids are now carryovers.)


# =====================================================================
# E. ETCCDI Growing Season Length over the 3-year twin — spell-trigger
#    + after-midyear selection (a composition TX90p/WSDI don't cover)
# =====================================================================

#: GSL temperature threshold on the DAILY SUM grain: mean > 5 over 24
#: hourly readings ⇔ sum > 120 — exact integers, no division anywhere
_GSL_TSUM = 120


def _gsl_year_oracle():
    from .registry_ext import wx_twin_sql

    return f"""
    WITH wx AS ({wx_twin_sql("duckdb", days=_TX_YEAR_DAYS)}),
    d AS (SELECT location_id, CAST(ts AS DATE) AS dd,
                 CAST(sum(temperature_2m) AS BIGINT) AS tsum
          FROM wx WHERE temperature_2m IS NOT NULL
          GROUP BY location_id, CAST(ts AS DATE)),
    di AS (SELECT location_id, CAST(year(dd) AS BIGINT) AS yr,
                  CAST(dayofyear(dd) AS BIGINT) AS doy,
                  CAST(month(dd) AS BIGINT) AS mth, tsum
           FROM d),
    warm AS (
      SELECT location_id, yr, doy,
             doy - row_number() OVER (PARTITION BY location_id, yr
                                      ORDER BY doy) AS grp
      FROM di WHERE tsum > {_GSL_TSUM}),
    wruns AS (
      SELECT location_id, yr, CAST(min(doy) AS BIGINT) AS start_doy,
             CAST(count(*) AS BIGINT) AS len
      FROM warm GROUP BY location_id, yr, grp),
    cold AS (
      SELECT location_id, yr, doy, mth,
             doy - row_number() OVER (PARTITION BY location_id, yr
                                      ORDER BY doy) AS grp
      FROM di WHERE tsum < {_GSL_TSUM}),
    cruns AS (
      SELECT location_id, yr, CAST(min(doy) AS BIGINT) AS start_doy,
             CAST(min(mth) AS BIGINT) AS start_mth,
             CAST(count(*) AS BIGINT) AS len
      FROM cold GROUP BY location_id, yr, grp),
    years AS (
      SELECT location_id, yr, CAST(max(doy) AS BIGINT) AS year_days
      FROM di GROUP BY location_id, yr),
    s AS (
      SELECT location_id, yr, CAST(min(start_doy) AS BIGINT) AS gstart
      FROM wruns WHERE len >= 6 GROUP BY location_id, yr),
    e AS (
      SELECT location_id, yr, CAST(min(start_doy) AS BIGINT) AS gend
      FROM cruns WHERE len >= 6 AND start_mth >= 7
      GROUP BY location_id, yr)
    SELECT y.location_id, y.yr,
           CAST(coalesce(s.gstart, 0) AS BIGINT) AS start_doy,
           CAST(coalesce(e.gend, 0) AS BIGINT) AS end_doy,
           CAST(CASE
                  WHEN s.gstart IS NULL THEN 0
                  WHEN e.gend IS NULL THEN y.year_days + 1 - s.gstart
                  ELSE greatest(0, e.gend - s.gstart)
                END AS BIGINT) AS gsl_days,
           y.year_days
    FROM years y
    LEFT JOIN s ON s.location_id = y.location_id AND s.yr = y.yr
    LEFT JOIN e ON e.location_id = y.location_id AND e.yr = y.yr
    ORDER BY y.location_id, y.yr
    """


@register("agg_extreme_gsl_year", _gsl_year_oracle())
def q_agg_extreme_gsl_year(spark, sf_dir):
    """ETCCDI Growing Season Length over the 3-year calendar twin — a
    composition none of the existing extreme indices cover: a
    SPELL-TRIGGERED season start (first run of ≥6 consecutive days
    with daily-mean temperature above 5 — spelled divide-free as
    daily SUM > 120 over the twin's fixed 24 readings/day) closed by
    an AFTER-MIDYEAR spell trigger (first run of ≥6 consecutive
    sub-threshold days whose run STARTS in July or later — the
    run-start-keyed reading of ETCCDI's "first occurrence after 1
    July", documented simplification), per location × calendar year.
    No-start years publish GSL 0; no-end years run to year end
    (year_days + 1 − start).  Gap-islands runs are keyed
    (location, year) so spells never cross calendar years; equality
    days (sum == 120) break warm runs without extending cold ones,
    exactly as ETCCDI's strict inequalities demand.  Scale shape: one
    daily reduce, two filtered island windows on uniform
    (location, year) keys, then three tiny per-year aggregates joined
    broadcast — no window ever touches hourly rows."""
    from pyspark.sql import Window

    from .registry_ext import wx_twin_sql
    from .session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark", days=_TX_YEAR_DAYS))
    d = (
        wx.filter(F.col("temperature_2m").isNotNull())
        .groupBy("location_id", F.col("ts").cast("date").alias("dd"))
        .agg(F.sum("temperature_2m").cast("long").alias("tsum"))
    )
    di = d.select(
        "location_id",
        F.year("dd").cast("long").alias("yr"),
        F.dayofyear("dd").cast("long").alias("doy"),
        F.month("dd").cast("long").alias("mth"),
        "tsum",
    )
    wly = Window.partitionBy("location_id", "yr").orderBy("doy")

    def runs(flt, with_mth=False):
        base = di.filter(flt).withColumn(
            "grp", F.col("doy") - F.row_number().over(wly)
        )
        aggs = [
            F.min("doy").cast("long").alias("start_doy"),
            F.count(F.lit(1)).cast("long").alias("len"),
        ]
        if with_mth:
            aggs.insert(1, F.min("mth").cast("long").alias("start_mth"))
        return base.groupBy("location_id", "yr", "grp").agg(*aggs)

    wruns = runs(F.col("tsum") > _GSL_TSUM)
    cruns = runs(F.col("tsum") < _GSL_TSUM, with_mth=True)
    years = di.groupBy("location_id", "yr").agg(
        F.max("doy").cast("long").alias("year_days")
    )
    s = (
        wruns.filter(F.col("len") >= 6)
        .groupBy("location_id", "yr")
        .agg(F.min("start_doy").cast("long").alias("gstart"))
    )
    e = (
        cruns.filter((F.col("len") >= 6) & (F.col("start_mth") >= 7))
        .groupBy("location_id", "yr")
        .agg(F.min("start_doy").cast("long").alias("gend"))
    )
    return (
        years.join(F.broadcast(s), ["location_id", "yr"], "left")
        .join(F.broadcast(e), ["location_id", "yr"], "left")
        .select(
            "location_id",
            "yr",
            F.coalesce("gstart", F.lit(0)).cast("long").alias("start_doy"),
            F.coalesce("gend", F.lit(0)).cast("long").alias("end_doy"),
            F.when(F.col("gstart").isNull(), F.lit(0))
            .when(
                F.col("gend").isNull(),
                F.col("year_days") + 1 - F.col("gstart"),
            )
            .otherwise(
                F.greatest(F.lit(0), F.col("gend") - F.col("gstart"))
            )
            .cast("long")
            .alias("gsl_days"),
            "year_days",
        )
        .orderBy("location_id", "yr")
    )


# =====================================================================
# F. Generation ROLLBACK — the swap's failure path: gate-checked flip,
#    un-retire, and GC of the FAULTED generation instead of the old one
# =====================================================================


def _rollback_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    cols = """CAST(query_id AS BIGINT) AS query_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(rank AS BIGINT) AS rank, adc, refine_micro"""

    def healthy(phase):
        return f"""
    SELECT * FROM (
      WITH RECURSIVE {_ivfpq_refined_ctes()}
      SELECT CAST({phase} AS BIGINT) AS phase, {cols} FROM refined)"""

    return f"""
    {healthy(0)}
    UNION ALL
    SELECT * FROM (
      WITH RECURSIVE corrupt AS (
        SELECT vec_id,
               CASE WHEN vec_id % 2 = 0 THEN list_reverse(embedding)
                    ELSE embedding END AS embedding
        FROM embeddings),
      {_ivfpq_refined_ctes(src="corrupt")}
      SELECT CAST(1 AS BIGINT) AS phase, {cols} FROM refined)
    UNION ALL
    {healthy(2)}
    ORDER BY phase, query_id, rank
    """


@register("ext_simsearch_index_rollback", _rollback_oracle())
def q_ext_simsearch_index_rollback(spark, sf_dir):
    """Generation ROLLBACK — the swap verb's FAILURE path: generation
    1 retrains from a corrupted decode (half the vectors arrive
    coordinate-REVERSED — the r12 stale-encode corruption at retrain
    scale; the corruption must hit a SUBSET, a uniform permutation
    would preserve every dot product), the pointer flips, the
    post-flip drift gate reads recall against the CATALOG truth and
    comes back red, so ONE manifest append rolls the pointer back
    (generation 0 un-retired — the ``state_epoch``-latest-wins
    resolution makes un-retire a first-class verb, never an in-place
    edit) and GC reclaims the FAULTED generation instead of the old
    one.  All three pointer reads are hash-pinned under a ``phase``
    column: pre-flip (gen 0 — unrestricted replay), post-flip (the
    faulted gen 1 — the full replay re-derived from the corrupted
    corpus CTE: wrong codebooks, wrong lists, wrong scores, exactly
    what serving a bad generation looks like), and post-rollback —
    whose oracle block is the phase-0 SQL verbatim, so the hash proves
    the rollback restored bit-identical serving.  GC policy refinement
    over the swap entry: the old generation is reclaimed only after
    the NEW one passes its gate.  At 100 TB: a rollback is one
    control-plane append — the blast radius of a bad retrain is one
    gate evaluation, never an outage."""
    import shutil

    from .ext.simsearch import (
        cosine_topk,
        index_generation_active,
        index_generation_append,
        index_generation_states,
        ivfpq_refined_build_index,
        ivfpq_refined_query_index,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    _clean_stale_scratch("/tmp/wds_rollb_*")
    root = f"/tmp/wds_rollb_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    manifest = f"{root}/manifest"

    gen0 = f"{root}/gen0"
    shutil.copytree(_ensure_refined_index(spark, sf_dir), gen0)
    index_generation_append(spark, manifest, [(0, gen0, 0, 1)])

    emb = load_table(spark, sf_dir, "embeddings")

    def serve_through_pointer(expect_gen, phase, queries):
        gen, path = index_generation_active(spark, manifest)
        if gen != expect_gen:  # load-bearing lifecycle check — never
            # a bare assert (stripped under python -O; ADVICE r13 #3)
            raise RuntimeError(
                f"pointer resolved generation {gen}, expected {expect_gen}"
            )
        return ivfpq_refined_query_index(
            spark, path, queries, "vec_id", "embedding",
            k=_RT["k"], nprobe=_RT["nprobe"], shortlist=_RT["shortlist"],
            m=_RT["m"], dim=_RT["dim"],
        ).withColumn("phase", F.lit(phase).cast("long"))

    q_all = emb.filter(F.col("vec_id") < _RT["n_queries"])
    pre = serve_through_pointer(0, 0, q_all)

    # generation 1 retrains from the CORRUPTED decode (the planted
    # upstream fault: even vec_ids arrive coordinate-reversed) and the
    # pointer flips to it
    corrupt = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 2 == 0, F.reverse("embedding")
        ).otherwise(F.col("embedding")),
    )
    gen1 = f"{root}/gen1"
    ivfpq_refined_build_index(
        corrupt, gen1, "vec_id", "embedding",
        n_clusters=_RT["n_clusters"], ksub=_RT["ksub"], m=_RT["m"],
        n_iter=_RT["n_iter"], dim=_RT["dim"],
    )
    index_generation_append(
        spark, manifest, [(1, gen1, 1, 1), (0, gen0, 1, 0)]
    )
    # the faulted generation SERVES (that is the failure's blast
    # radius) — queries come through the same corrupted decode, the
    # retrain discipline
    post = serve_through_pointer(
        1, 1, corrupt.filter(F.col("vec_id") < _RT["n_queries"])
    )

    # post-flip gate vs the CATALOG truth — red on the lossy build
    exact = (
        cosine_topk(emb, q_all, "vec_id", "embedding", k=_RT["k"])
        .select("query_id", "match_id")
        .persist()
    )
    try:
        n_truth = exact.count()
        appr = ivfpq_refined_query_index(
            spark, gen1, q_all, "vec_id", "embedding",
            k=_RT["k"], nprobe=_RT["nprobe"], shortlist=_RT["shortlist"],
            m=_RT["m"], dim=_RT["dim"],
        ).select("query_id", "match_id")
        n_hits = exact.join(
            appr, ["query_id", "match_id"], "left_semi"
        ).count()
    finally:
        exact.unpersist()
    recall_micro = n_hits * 1_000_000 // max(n_truth, 1)
    if recall_micro >= _DRIFT_MIN_RECALL_MICRO:
        # the red gate MUST have fired for the faulted build — a green
        # faulted generation means the planted corruption (or the
        # gate) regressed; never a bare assert (ADVICE r13 #3)
        raise RuntimeError(
            f"faulted generation passed the recall gate: {recall_micro}"
        )

    # ROLLBACK: one append un-retires gen 0 and retires gen 1; GC then
    # reclaims the FAULTED generation (gate-checked GC policy)
    index_generation_append(
        spark, manifest, [(0, gen0, 2, 1), (1, gen1, 2, 0)]
    )
    for row in index_generation_states(spark, manifest).collect():
        if int(row["active"]) == 0:
            shutil.rmtree(row["path"], ignore_errors=True)

    back = serve_through_pointer(0, 2, q_all)

    return (
        pre.unionByName(post)
        .unionByName(back)
        .select(
            "phase", "query_id", "match_id", "rank", "adc",
            "refine_micro",
        )
        .orderBy("phase", "query_id", "rank")
    )


# =====================================================================
# G. DELTA compaction — rewrite only the touched lists (the answer to
#    "compaction is the one index-sized rewrite")
# =====================================================================

#: sparse change stream for the delta story: ~0.5% of ids re-encoded,
#: ~0.5% deleted — the realistic steady-state between compactions
_DELTA_UPSERT = "vec_id % 97 = 0"
_DELTA_DELETE = "vec_id % 89 = 3"


def _compact_delta_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    return f"""
    WITH RECURSIVE {_ivfpq_refined_ctes(
        live_where=f"NOT ({_DELTA_DELETE})")}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(rank AS BIGINT) AS rank, adc, refine_micro
    FROM refined ORDER BY query_id, rank
    """


@register("ext_simsearch_index_compact_delta", _compact_delta_oracle())
def q_ext_simsearch_index_compact_delta(spark, sf_dir):
    """DELTA compaction — the scale answer to the one remaining
    index-sized recurring cost: full compaction moves EVERY live
    vector once per cycle, but a steady-state change stream touches a
    handful of coarse lists, so the delta verb merges the new epochs
    into a previously compacted serving layout rewriting ONLY the
    touched lists (new list of every upsert ∪ previous list of every
    changed/deleted id — supersedence runs the verbatim read-path
    ``max_by(payload, epoch)`` with the previous serving rows entering
    as epoch −1) and carries every untouched list over as a hardlink —
    a metadata move, a manifest pointer on an object store.

    Flow: full ingest epoch (a ~0.5% slice encoded from STALE reversed
    vectors) → FULL compact (the baseline serving store) → sparse
    epochs (the slice re-encoded true + ~0.5% tombstones) → DELTA
    compact → serve top-3 through the pruned layout.  The oracle is
    the serving-config replay over exactly the live rows — a stale
    code surviving in an unrewritten list, a moved row leaking outside
    the touched set, or a hardlinked file that should have been
    rewritten all change a score and fail the hash.  At 100 TB: delta
    cost ∝ |touched lists|, not index size (sf0.1 probe: see
    BASELINE round-13 (5))."""
    import shutil

    from .ext.simsearch import (
        ivfpq_refined_apply_epochs,
        ivfpq_refined_compact_delta,
        ivfpq_refined_compact_epochs,
        ivfpq_refined_encode_epoch,
        ivfpq_refined_query_index,
        ivfpq_refined_tombstones,
        load_refined_codebooks,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    idx = _ensure_refined_index(spark, sf_dir)
    cb = load_refined_codebooks(spark, idx, _RT["m"])
    _clean_stale_scratch("/tmp/wds_dcmp_*")
    root = f"/tmp/wds_dcmp_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    changed = F.expr(_DELTA_UPSERT)

    # baseline: full ingest (stale slice) folded into a compacted store
    stale0 = emb.withColumn(
        "embedding",
        F.when(changed, F.reverse("embedding")).otherwise(
            F.col("embedding")
        ),
    )
    ivfpq_refined_encode_epoch(
        stale0, cb[0], cb[1], _RT["m"], _RT["dim"]
    ).write.mode("overwrite").parquet(f"{root}/ingest0/epoch=0")
    base = ivfpq_refined_apply_epochs(spark, f"{root}/ingest0")
    ivfpq_refined_compact_epochs(spark, idx, base, f"{root}/serving1")

    # the sparse change stream since that compaction
    ivfpq_refined_encode_epoch(
        emb.filter(changed), cb[0], cb[1], _RT["m"], _RT["dim"]
    ).write.mode("overwrite").parquet(f"{root}/delta/epoch=1")
    ivfpq_refined_tombstones(
        emb.filter(F.expr(_DELTA_DELETE))
    ).write.mode("overwrite").parquet(f"{root}/delta/epoch=2")

    # DELTA: only the touched lists are rewritten; the rest hardlink
    ivfpq_refined_compact_delta(
        spark, f"{root}/serving1", f"{root}/delta", f"{root}/serving2"
    )

    return ivfpq_refined_query_index(
        spark,
        f"{root}/serving2",
        emb.filter(F.col("vec_id") < _RT["n_queries"]),
        "vec_id",
        "embedding",
        k=_RT["k"],
        nprobe=_RT["nprobe"],
        shortlist=_RT["shortlist"],
        m=_RT["m"],
        dim=_RT["dim"],
    )


# =====================================================================
# H. Streaming CONTINUOUS compaction — epoch appends + per-batch delta
#    folds, deletes arriving mid-stream
# =====================================================================


def _stream_delta_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    return f"""
    WITH RECURSIVE {_ivfpq_refined_ctes(live_where=_LIVE_WHERE)},
    csum AS (SELECT match_id, CAST(sum(code) AS BIGINT) AS cs
             FROM codes GROUP BY match_id)
    SELECT CAST(l.cid AS BIGINT) AS cid,
           CAST(count(*) AS BIGINT) AS n_codes,
           CAST(sum(l.match_id) AS BIGINT) AS match_sum,
           CAST(sum(c.cs) AS BIGINT) AS code_sum
    FROM lists l JOIN csum c ON c.match_id = l.match_id
    GROUP BY l.cid ORDER BY cid
    """


@register("stream_delta_compact", _stream_delta_oracle())
def q_stream_delta_compact(spark, sf_dir):
    """STREAMING CONTINUOUS COMPACTION — the epoch store never grows
    past one uncompacted epoch: arrivals carry an ``op`` column
    (upsert/delete), each micro-batch encodes its upserts against the
    offline codebooks and tombstones its deletes into ``epoch=N``,
    and foreachBatch FOLDS that epoch into the serving store on the
    spot — the first batch full-compacts the baseline, every later
    batch delta-compacts (only its touched lists rewrite; the rest
    hardlink), and the superseded stores + epoch dirs vacuum at the
    end (``index_vacuum``, hardlink-safe).  Deletes arrive MID-STREAM
    as batch 3, so the final store is the live post-delete world.

    The published per-list manifest (count, id checksum, PQ-code
    checksum per coarse list) must equal the live-restricted
    serving-config replay bit-for-bit — a stale code in a hardlinked
    list, a tombstone that missed its list, or a fold that dropped a
    late row all change a checksum.  At 100 TB: read amplification is
    bounded at one epoch (the serve path never unions a growing epoch
    store), and each fold's I/O is ∝ that batch's touched lists —
    the delta probe's 14×-fewer-bytes bound, paid continuously
    instead of in one index-sized rewrite."""
    import os
    import shutil

    from .ext.simsearch import (
        index_vacuum,
        ivfpq_refined_apply_epochs,
        ivfpq_refined_compact_delta,
        ivfpq_refined_compact_epochs,
        ivfpq_refined_encode_epoch,
        ivfpq_refined_tombstones,
        load_refined_codebooks,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    idx = _ensure_refined_index(spark, sf_dir)
    cb = load_refined_codebooks(spark, idx, _RT["m"])
    _clean_stale_scratch("/tmp/wds_sdlt_*")
    root = f"/tmp/wds_sdlt_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")

    # arrivals: two upsert halves, then the delete stream
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
    parts = [
        emb.filter(F.col("vec_id") <= mid).withColumn(
            "op", F.lit("upsert")
        ),
        emb.filter(F.col("vec_id") > mid).withColumn(
            "op", F.lit("upsert")
        ),
        emb.filter(~F.expr(_LIVE_WHERE)).withColumn(
            "op", F.lit("delete")
        ),
    ]
    now = 1_700_000_000
    for i, part in enumerate(parts):
        sub = os.path.join(root, "in", f"f{i}")
        part.select("vec_id", "embedding", "op").coalesce(1).write.parquet(
            sub
        )
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (now + i * 3600, now + i * 3600))

    def handle(batch_df, epoch_id):
        n = int(epoch_id)
        ep_dir = f"{root}/delta_{n}"
        ups = batch_df.filter(F.col("op") == "upsert")
        dels = batch_df.filter(F.col("op") == "delete")
        ivfpq_refined_encode_epoch(
            ups, cb[0], cb[1], _RT["m"], _RT["dim"]
        ).unionByName(ivfpq_refined_tombstones(dels)).write.mode(
            "overwrite"
        ).parquet(f"{ep_dir}/epoch={n}")
        # FOLD: baseline full-compact on the first batch, delta after
        if n == 0:
            ivfpq_refined_compact_epochs(
                spark, idx,
                ivfpq_refined_apply_epochs(spark, ep_dir),
                f"{root}/serving_0",
            )
        else:
            ivfpq_refined_compact_delta(
                spark, f"{root}/serving_{n - 1}", ep_dir,
                f"{root}/serving_{n}",
            )

    q = (
        spark.readStream.schema(
            "vec_id bigint, embedding array<float>, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(root + "/in/f*")
        .writeStream.foreachBatch(handle)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # retention: superseded generations + folded epochs vacuum away;
    # the final store's hardlinked lists survive (refcounted)
    final = f"{root}/serving_2"
    index_vacuum(
        [f"{root}/serving_0", f"{root}/serving_1"]
        + [f"{root}/delta_{n}" for n in range(3)]
    )

    vecs = spark.read.parquet(final + "/vectors").select(
        "match_id", F.col("cid").cast("long").alias("cid")
    )
    csum = (
        spark.read.parquet(final + "/codes")
        .groupBy("match_id")
        .agg(F.sum("code").cast("long").alias("cs"))
    )
    return (
        vecs.join(csum, "match_id")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_codes"),
            F.sum("match_id").cast("long").alias("match_sum"),
            F.sum("cs").cast("long").alias("code_sum"),
        )
        .orderBy("cid")
    )
