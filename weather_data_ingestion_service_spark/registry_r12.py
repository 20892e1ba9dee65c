"""Round-12 registry entries.

Headline: UPSERT + DELETE on the TRAINED serving-config IVF-PQ index
(VERDICT r11 #2) — the epoch-supersedence + tombstone + compaction
lifecycle ported onto ``ivfpq_refined_build_index``'s layout (codes AND
the int8 vector store both cid-partitioned), hash-verified against a
clean rebuild over exactly the live rows; plus the retrain-drift gate
(VERDICT r11 #5) and the ETCCDI precipitation extremes (VERDICT r11
#6: Rx1day / Rx5day / CDD).

Reference parity: the reference service (server.py) has no ANN or
climate-index path — these are the large-scale training-data-pipeline
and climate-analytics extensions the build brief mandates.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .io import load_table, local_frame
from .registry import register

# (Round-14 hygiene: the round-13
# _register_changed_since_green("ext_pack_length_buckets") marker was
# deleted — the id re-greened in CORRECTNESS_r13. Round-12's own
# markers and _register_new_this_round tail were deleted at round-13
# start.)

#: live-rows predicate of the round-12 upsert/delete story (mirrors the
#: r11 md5-index story so the two lifecycles are comparable)
_LIVE_WHERE = "NOT (vec_id % 11 = 3)"

#: retrain-drift gate: flag the index for retraining when post-upsert
#: recall@3 (vs exact cosine over the live corpus) drops below 0.80 —
#: the trained config measures 0.86 on the full corpus (BASELINE r11
#: probe 2), so a healthy upsert keeps the gate green
_DRIFT_MIN_RECALL_MICRO = 800_000


# =====================================================================
# A. UPSERT + DELETE on the TRAINED serving-config index (VERDICT #2)
# =====================================================================


def _refined_upsert_stages(spark, sf_dir):
    """The trained-index upsert/delete flow split into its five timed
    stages (the ``_index_upsert_stages`` discipline, VERDICT r11 #3):
    composing the ``(name, thunk)`` pairs verbatim IS the registry
    entry; bench.py times each stage separately.

    Precondition (resolved lazily at first use, so constructing the
    stage list costs nothing — the name-pinning test calls builders
    without running them): the trained serving index exists —
    codebooks train OFFLINE and the ingest verbs never retrain, so
    every epoch encodes against the codebooks loaded back from the
    persisted index (``load_refined_codebooks``)."""
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

    root = f"/tmp/wds_rups_{_session_tag(spark, sf_dir)}"
    ingest, serving = f"{root}/ingest", f"{root}/serving"
    state: dict = {"root": root, "serving": serving}
    changed = F.col("vec_id") % 7 == 0
    m, dim = _RT["m"], _RT["dim"]

    def _emb():
        return load_table(spark, sf_dir, "embeddings")

    def _idx():
        if "idx" not in state:
            state["idx"] = _ensure_refined_index(spark, sf_dir)
        return state["idx"]

    def _cb():
        if "cb" not in state:
            state["cb"] = load_refined_codebooks(spark, _idx(), m)
        return state["cb"]

    def _prep():
        # scratch hygiene + codebook load, idempotent (state-flagged):
        # runs lazily from ingest_stage on the bench's sequential path
        # (ADVICE r12 #3: stage-list construction stays side-effect
        # free), and ONCE up front when the composed entry overlaps
        # the three independent epoch writes — the rmtree must not
        # race a concurrent epoch-1/2 write under the same root.
        if state.get("prepped"):
            return
        _clean_stale_scratch("/tmp/wds_rups_*")
        shutil.rmtree(root, ignore_errors=True)
        _cb()
        state["prepped"] = True

    state["prep"] = _prep

    def ingest_stage():
        _prep()
        # epoch 0: full initial ingest, every vec_id % 7 = 0 row
        # encoded from a STALE vector (its reversed embedding — a
        # deterministic corruption the upsert must fully shadow)
        stale0 = _emb().withColumn(
            "embedding",
            F.when(changed, F.reverse("embedding")).otherwise(
                F.col("embedding")
            ),
        )
        cb = _cb()
        ivfpq_refined_encode_epoch(stale0, cb[0], cb[1], m, dim).write.mode(
            "overwrite"
        ).parquet(f"{ingest}/epoch=0")

    def upsert_stage():
        # epoch 1: the changed ids re-encoded from their true vectors
        cb = _cb()
        ivfpq_refined_encode_epoch(
            _emb().filter(changed), cb[0], cb[1], m, dim
        ).write.mode("overwrite").parquet(f"{ingest}/epoch=1")

    def tombstone_stage():
        # epoch 2: alive = 0 records for every vec_id % 11 = 3
        ivfpq_refined_tombstones(
            _emb().filter(F.col("vec_id") % 11 == 3)
        ).write.mode("overwrite").parquet(f"{ingest}/epoch=2")

    def compact_stage():
        # supersede-at-read (one max_by(struct, epoch) hash aggregate)
        # then rewrite the live view into the pruned serving layout —
        # codes AND the int8 vector store both cid-partitioned
        live = ivfpq_refined_apply_epochs(spark, ingest)
        ivfpq_refined_compact_epochs(spark, _idx(), live, serving)

    def serve_stage():
        state["out"] = ivfpq_refined_query_index(
            spark,
            serving,
            _emb().filter(F.col("vec_id") < _RT["n_queries"]),
            "vec_id",
            "embedding",
            k=_RT["k"],
            nprobe=_RT["nprobe"],
            shortlist=_RT["shortlist"],
            m=m,
            dim=dim,
        )

    return [
        ("ingest", ingest_stage),
        ("upsert", upsert_stage),
        ("tombstone", tombstone_stage),
        ("compact", compact_stage),
        ("serve", serve_stage),
    ], state


def _ensure_refined_upserted(spark, sf_dir: str) -> str:
    """Serving path of the post-upsert trained index, built lazily
    (driver order independence — the drift gate must not depend on the
    upsert entry having run first in the same session)."""
    import os

    from .registry import _session_tag

    root = f"/tmp/wds_rups_{_session_tag(spark, sf_dir)}"
    if not os.path.exists(f"{root}/serving/vectors"):
        stages, _state = _refined_upsert_stages(spark, sf_dir)
        for _name, fn in stages[:-1]:  # through compact; serve is a read
            fn()
    return f"{root}/serving"


def _refined_upsert_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    return f"""
    WITH RECURSIVE {_ivfpq_refined_ctes(live_where=_LIVE_WHERE)}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(rank AS BIGINT) AS rank, adc, refine_micro
    FROM refined ORDER BY query_id, rank
    """


@register("ext_simsearch_index_refined_upsert", _refined_upsert_oracle())
def q_ext_simsearch_index_refined_upsert(spark, sf_dir):
    """UPSERT + DELETE on the TRAINED serving-config IVF-PQ index
    (VERDICT r11 #2): the epoch-supersedence + tombstone + compaction
    pattern certified on the r9 md5-sampled index
    (``ext_simsearch_index_upsert``), ported onto
    ``ivfpq_refined_build_index``'s layout — which means the upsert
    must maintain BOTH cid-partitioned stores: the long-form PQ codes
    (ADC stage) and the int8 full-vector store (refine stage).  Runs
    the five ``_refined_upsert_stages`` verbatim (bench.py times each):
    stale-encoded epoch 0, true re-encode epoch 1, tombstone epoch 2,
    supersede + compact into the pruned serving layout, then top-3
    served through ``ivfpq_refined_query_index`` — static partition
    pruning intact on both scans after the rewrite.

    The oracle is the serving-config SQL replay
    (``_ivfpq_refined_ctes``) with the INDEXED corpus restricted to
    exactly the live rows: training stays full-corpus (codebooks train
    offline; ingest verbs never retrain) and the query set stays
    unrestricted (queries are external vectors).  A stale code or a
    stale int8 vector leaking through supersedence, a deleted id
    surfacing, or a compaction that breaks either store's layout
    changes an adc/refine score and fails the hash.  At 100 TB: an
    upsert epoch appends m+1 small ints + dim int8s per CHANGED vector
    only; deletes append one tombstone row; supersede-at-read is one
    map-side-combinable aggregate; compaction moves each LIVE vector
    once."""
    stages, state = _refined_upsert_stages(spark, sf_dir)
    d = dict(stages)
    # the three epoch writes are independent (distinct epoch dirs, all
    # reading only embeddings + the offline codebooks): prep once
    # (scratch rmtree + codebook load — must not race the overlapped
    # writes), then overlap them so the tombstone/upsert tasks
    # back-fill the full-ingest tail (guide §2.6; the md5 twin
    # q_ext_simsearch_index_upsert has the same shape).  bench.py
    # still times the stages sequentially via _refined_upsert_stages.
    from .io import overlap_jobs

    state["prep"]()
    overlap_jobs(d["ingest"], d["upsert"], d["tombstone"])
    d["compact"]()
    d["serve"]()
    return state["out"]


# =====================================================================
# B. Retrain-drift gate — the fifth lifecycle verb (VERDICT #5)
# =====================================================================


def _index_drift_oracle():
    from .registry_ext import _COSINE_SQL
    from .registry_r11 import _RT, _ivfpq_refined_ctes

    cos = _COSINE_SQL.format(a="eq.embedding", b="ec.embedding")
    return f"""
    WITH RECURSIVE {_ivfpq_refined_ctes(live_where=_LIVE_WHERE)},
    appr AS (SELECT query_id, match_id FROM refined),
    exact AS (
      SELECT query_id, match_id FROM (
        SELECT eq.vec_id AS query_id, ec.vec_id AS match_id,
               row_number() OVER (PARTITION BY eq.vec_id
                 ORDER BY {cos} DESC, ec.vec_id) AS rank
        FROM embeddings eq CROSS JOIN embeddings ec
        WHERE eq.vec_id < {_RT["n_queries"]} AND eq.vec_id <> ec.vec_id
          AND NOT (ec.vec_id % 11 = 3))
      WHERE rank <= {_RT["k"]}),
    hits AS (
      -- equi-join, not INTERSECT (DuckDB rejects set-op CTE bodies
      -- inside a WITH RECURSIVE list); both sides are rank-limited
      -- distinct, so this IS the semi join
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
    SELECT n_queries, n_truth, n_hits, recall_micro,
           CAST(CASE WHEN recall_micro < {_DRIFT_MIN_RECALL_MICRO}
                     THEN 1 ELSE 0 END AS BIGINT) AS retrain_needed
    FROM agg
    """


@register("ext_eval_index_drift", _index_drift_oracle())
def q_ext_eval_index_drift(spark, sf_dir):
    """Retrain-drift gate — the FIFTH index lifecycle verb (VERDICT
    r11 #5): after upserts mutate the corpus under offline-trained
    codebooks, recompute the hash-pinned recall@3 of the POST-UPSERT
    index (served through the compacted layout) against exact
    brute-force cosine over the LIVE corpus, and publish a
    retrain-needed boolean at the pinned 0.80 threshold.  Both sides
    restate in SQL, so the measured post-upsert recall AND the gate
    decision are hash-verified: codebook drift that degrades recall
    past the threshold flips ``retrain_needed`` and the driver sees
    it.  Scale shape: the exact side broadcasts the tiny query set
    over one corpus scan; the approximate side touches only probed
    partitions — the gate costs one evaluation pass, never a
    retrain."""
    from .ext.simsearch import cosine_topk, ivfpq_refined_query_index
    from .registry_r11 import _RT

    serving = _ensure_refined_upserted(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    live = emb.filter(~(F.col("vec_id") % 11 == 3))
    q5 = emb.filter(F.col("vec_id") < _RT["n_queries"])
    exact = (
        cosine_topk(live, q5, "vec_id", "embedding", k=_RT["k"])
        .select("query_id", "match_id")
        .persist()
    )
    appr = ivfpq_refined_query_index(
        spark,
        serving,
        q5,
        "vec_id",
        "embedding",
        k=_RT["k"],
        nprobe=_RT["nprobe"],
        shortlist=_RT["shortlist"],
        m=_RT["m"],
        dim=_RT["dim"],
    ).select("query_id", "match_id")
    try:
        n_truth = exact.count()
        n_q = exact.select("query_id").distinct().count()
        n_hits = exact.join(
            appr, ["query_id", "match_id"], "left_semi"
        ).count()
    finally:
        exact.unpersist()
    recall_micro = n_hits * 1_000_000 // max(n_truth, 1)
    rows = [
        (
            int(n_q),
            int(n_truth),
            int(n_hits),
            int(recall_micro),
            int(recall_micro < _DRIFT_MIN_RECALL_MICRO),
        )
    ]
    return local_frame(
        spark,
        rows,
        "n_queries long, n_truth long, n_hits long, recall_micro long,"
        " retrain_needed long",
    )


# =====================================================================
# C. ETCCDI precipitation extremes (VERDICT #6): Rx1day / Rx5day / CDD
# =====================================================================


def _wx_daily_pr_ctes() -> str:
    """DuckDB CTE chain: the wx twin record reduced to the exact
    integer daily-precipitation series with a 0-based day index —
    shared by the three precipitation-extreme oracles."""
    from .registry_ext import wx_twin_sql

    return f"""wx AS ({wx_twin_sql("duckdb")}),
    dailyp AS (
      SELECT location_id, CAST(ts AS DATE) AS d,
             CAST(sum(precipitation) AS BIGINT) AS pr
      FROM wx GROUP BY location_id, CAST(ts AS DATE)),
    daily AS (
      SELECT location_id, d,
             CAST(date_diff('day', DATE '2024-01-01', d) AS BIGINT)
               AS day_idx,
             pr
      FROM dailyp)"""


def _wx_daily_pr(spark):
    """Spark twin of ``_wx_daily_pr_ctes``: hourly precipitation is an
    integer-valued DOUBLE by twin construction, so the daily sum is
    exact and order-independent; ``datediff`` on DATEs counts date
    boundaries on both engines."""
    from .registry_ext import wx_twin_sql
    from .session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark"))
    return (
        wx.groupBy("location_id", F.col("ts").cast("date").alias("d"))
        .agg(F.sum("precipitation").cast("long").alias("pr"))
        .withColumn(
            "day_idx",
            F.datediff(
                F.col("d"), F.lit("2024-01-01").cast("date")
            ).cast("long"),
        )
    )


@register(
    "agg_extreme_rx1day",
    f"""
    WITH {_wx_daily_pr_ctes()},
    wk AS (SELECT location_id, day_idx // 7 AS week, day_idx, pr
           FROM daily),
    r AS (SELECT location_id, week, pr, day_idx,
                 row_number() OVER (PARTITION BY location_id, week
                   ORDER BY pr DESC, day_idx) AS rn,
                 count(*) OVER (PARTITION BY location_id, week) AS n_days
          FROM wk)
    SELECT CAST(location_id AS BIGINT) AS location_id,
           CAST(week AS BIGINT) AS week,
           CAST(pr AS BIGINT) AS rx1day_mm,
           CAST(day_idx AS BIGINT) AS max_day,
           CAST(n_days AS BIGINT) AS n_days
    FROM r WHERE rn = 1 ORDER BY location_id, week
    """,
)
def q_agg_extreme_rx1day(spark, sf_dir):
    """ETCCDI Rx1day — highest 1-day precipitation total per
    location × 7-day block (the monthly index re-keyed to the 21-day
    twin record; VERDICT r11 #6): exact integer daily sums, the block
    maximum published as an ARGMAX row (value + the earliest day it
    occurs, under the total order (pr DESC, day_idx) — selection,
    never interpolation).  One shuffle on (location, day) for the
    daily rollup, one on (location, week) for the rank window —
    calendar blocks are uniform, no skew."""
    from pyspark.sql import Window

    daily = _wx_daily_pr(spark)
    wk = daily.withColumn("week", F.expr("day_idx DIV 7"))
    w = Window.partitionBy("location_id", "week")
    r = wk.select(
        "location_id",
        "week",
        "pr",
        "day_idx",
        F.row_number()
        .over(w.orderBy(F.col("pr").desc(), F.col("day_idx")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_days"),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            F.col("location_id").cast("long").alias("location_id"),
            F.col("week").cast("long").alias("week"),
            F.col("pr").cast("long").alias("rx1day_mm"),
            F.col("day_idx").cast("long").alias("max_day"),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("location_id", "week")
    )


@register(
    "agg_extreme_rx5day",
    f"""
    WITH {_wx_daily_pr_ctes()},
    r5 AS (SELECT location_id, day_idx,
                  CAST(sum(pr) OVER (PARTITION BY location_id
                       ORDER BY day_idx
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS p5
           FROM daily),
    wk AS (SELECT location_id, day_idx // 7 AS week, day_idx, p5
           FROM r5),
    r AS (SELECT location_id, week, p5, day_idx,
                 row_number() OVER (PARTITION BY location_id, week
                   ORDER BY p5 DESC, day_idx) AS rn,
                 count(*) OVER (PARTITION BY location_id, week) AS n_days
          FROM wk)
    SELECT CAST(location_id AS BIGINT) AS location_id,
           CAST(week AS BIGINT) AS week,
           CAST(p5 AS BIGINT) AS rx5day_mm,
           CAST(day_idx AS BIGINT) AS end_day,
           CAST(n_days AS BIGINT) AS n_days
    FROM r WHERE rn = 1 ORDER BY location_id, week
    """,
)
def q_agg_extreme_rx5day(spark, sf_dir):
    """ETCCDI Rx5day — highest consecutive-5-day precipitation total
    per location × 7-day block: the 5-day window is a ROWS BETWEEN 4
    PRECEDING frame over the gap-free daily series (the
    ``win_sliding_minmax`` frame discipline — rows == range on a
    dense day index), crossing block boundaries exactly as the ETCCDI
    definition crosses month starts; the block max is attributed to
    the window's END day, published as an argmax row.  All integer —
    bit-stable under any partitioning."""
    from pyspark.sql import Window

    daily = _wx_daily_pr(spark)
    w5 = (
        Window.partitionBy("location_id")
        .orderBy("day_idx")
        .rowsBetween(-4, 0)
    )
    r5 = daily.select(
        "location_id",
        "day_idx",
        F.sum("pr").over(w5).cast("long").alias("p5"),
    )
    wk = r5.withColumn("week", F.expr("day_idx DIV 7"))
    w = Window.partitionBy("location_id", "week")
    r = wk.select(
        "location_id",
        "week",
        "p5",
        "day_idx",
        F.row_number()
        .over(w.orderBy(F.col("p5").desc(), F.col("day_idx")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_days"),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            F.col("location_id").cast("long").alias("location_id"),
            F.col("week").cast("long").alias("week"),
            F.col("p5").cast("long").alias("rx5day_mm"),
            F.col("day_idx").cast("long").alias("end_day"),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("location_id", "week")
    )


def _cdd_oracle():
    from .registry_ext import wx_twin_sql

    return f"""
    WITH wx AS ({wx_twin_sql("duckdb")}),
    hr AS (SELECT location_id,
                  CAST(date_diff('second',
                       TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
                    // 3600 AS hour_idx,
                  precipitation AS pr
           FROM wx),
    dry AS (SELECT location_id, hour_idx FROM hr WHERE pr < 1),
    isl AS (SELECT location_id, hour_idx,
                   hour_idx - row_number() OVER (PARTITION BY location_id
                     ORDER BY hour_idx) AS grp
            FROM dry),
    runs AS (SELECT location_id, grp,
                    CAST(count(*) AS BIGINT) AS run_len,
                    CAST(min(hour_idx) AS BIGINT) AS start_hour
             FROM isl GROUP BY location_id, grp),
    top AS (SELECT location_id, run_len, start_hour,
                   row_number() OVER (PARTITION BY location_id
                     ORDER BY run_len DESC, start_hour) AS rn,
                   CAST(sum(run_len) OVER (PARTITION BY location_id)
                     AS BIGINT) AS n_dry_hours
            FROM runs)
    SELECT CAST(location_id AS BIGINT) AS location_id,
           run_len AS cdd_hours, start_hour, n_dry_hours
    FROM top WHERE rn = 1 ORDER BY location_id
    """


@register("agg_extreme_cdd", _cdd_oracle())
def q_agg_extreme_cdd(spark, sf_dir):
    """ETCCDI CDD — longest consecutive dry spell per location, at
    the HOURLY granularity the twin record supports (the twin rains
    on ~20% of hours, so nearly every DAY is wet and daily CDD is
    vacuous — the hourly re-keying keeps the index meaningful while
    exercising the same gap-islands machinery; VERDICT r11 #6 /
    ``agg_spell_lengths`` discipline): dry hour = precipitation <
    1 mm; island key = hour_idx − row_number over the dry hours (the
    hour index spelled as integer epoch-second subtraction + DIV on
    both engines — the CLAUDE.md duration rule, never
    date_diff('hour') vs timestampdiff); one count per island, the
    argmax run published with its start hour and the location's total
    dry-hour count.  One window pass + one hash aggregate, all
    integer."""
    from pyspark.sql import Window

    from .registry_ext import wx_twin_sql
    from .session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark"))
    hr = wx.select(
        "location_id",
        F.expr(
            "(unix_timestamp(ts) - unix_timestamp("
            "TIMESTAMP '2024-01-01 00:00:00')) DIV 3600"
        ).alias("hour_idx"),
        F.col("precipitation").alias("pr"),
    )
    dry = hr.filter(F.col("pr") < 1).select("location_id", "hour_idx")
    isl = dry.withColumn(
        "grp",
        F.col("hour_idx")
        - F.row_number().over(
            Window.partitionBy("location_id").orderBy("hour_idx")
        ),
    )
    runs = isl.groupBy("location_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("hour_idx").cast("long").alias("start_hour"),
    )
    wloc = Window.partitionBy("location_id")
    top = runs.select(
        "location_id",
        "run_len",
        "start_hour",
        F.row_number()
        .over(wloc.orderBy(F.col("run_len").desc(), F.col("start_hour")))
        .alias("rn"),
        F.sum("run_len").over(wloc).cast("long").alias("n_dry_hours"),
    )
    return (
        top.filter(F.col("rn") == 1)
        .select(
            F.col("location_id").cast("long").alias("location_id"),
            F.col("run_len").alias("cdd_hours"),
            "start_hour",
            "n_dry_hours",
        )
        .orderBy("location_id")
    )


# =====================================================================
# D. RETRAIN — the sixth lifecycle verb: the action the drift gate
#    triggers (rebuild codebooks + encode from the LIVE corpus)
# =====================================================================


def _retrain_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    return f"""
    WITH RECURSIVE live AS (
      SELECT vec_id, embedding FROM embeddings WHERE {_LIVE_WHERE}),
    {_ivfpq_refined_ctes(src="live")}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(rank AS BIGINT) AS rank, adc, refine_micro
    FROM refined ORDER BY query_id, rank
    """


@register("ext_simsearch_index_retrain", _retrain_oracle())
def q_ext_simsearch_index_retrain(spark, sf_dir):
    """RETRAIN — the SIXTH index lifecycle verb, the action
    ``ext_eval_index_drift`` triggers: after enough upserts/deletes
    the offline codebooks drift from the corpus distribution, so the
    index rebuilds a NEW GENERATION from the LIVE corpus — codebooks
    retrained, every live vector re-encoded, fresh pruned layout —
    while the old generation keeps serving until the swap (here: a
    separate generation directory).  The oracle re-derives the ENTIRE
    replay — both KMeans recursions, encode, probe, ADC, refine —
    from the live-filtered corpus CTE, so a retrain that accidentally
    trains on dead rows (or keeps stale codebooks) changes the
    codebooks and fails the hash.  Queries come from the live corpus
    (the post-delete world).  At 100 TB retrain is the one
    corpus-sized verb — 1+m control-plane fits + one encode pass —
    which is exactly why the drift GATE exists: pay it only when the
    measured recall demands it."""
    import shutil

    from .ext.simsearch import (
        ivfpq_refined_build_index,
        ivfpq_refined_query_index,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT

    _clean_stale_scratch("/tmp/wds_rtrn_*")
    root = f"/tmp/wds_rtrn_{_session_tag(spark, sf_dir)}/gen1"
    shutil.rmtree(root, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    live = emb.filter(~(F.col("vec_id") % 11 == 3))
    ivfpq_refined_build_index(
        live, root, "vec_id", "embedding",
        n_clusters=_RT["n_clusters"], ksub=_RT["ksub"], m=_RT["m"],
        n_iter=_RT["n_iter"], dim=_RT["dim"],
    )
    return ivfpq_refined_query_index(
        spark,
        root,
        live.filter(F.col("vec_id") < _RT["n_queries"]),
        "vec_id",
        "embedding",
        k=_RT["k"],
        nprobe=_RT["nprobe"],
        shortlist=_RT["shortlist"],
        m=_RT["m"],
        dim=_RT["dim"],
    )


# =====================================================================
# E. ETCCDI wet-day family: R10mm / R20mm / PRCPTOT / SDII (one pass)
# =====================================================================


@register(
    "agg_extreme_wetdays",
    f"""
    WITH {_wx_daily_pr_ctes()},
    wk AS (SELECT location_id, day_idx // 7 AS week, pr FROM daily)
    SELECT CAST(location_id AS BIGINT) AS location_id,
           CAST(week AS BIGINT) AS week,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN pr >= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS wet_days,
           CAST(sum(CASE WHEN pr >= 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS r100mm,
           CAST(sum(CASE WHEN pr >= 200 THEN 1 ELSE 0 END) AS BIGINT)
             AS r200mm,
           CAST(sum(CASE WHEN pr >= 1 THEN pr ELSE 0 END) AS BIGINT)
             AS prcptot,
           CAST(CASE WHEN sum(CASE WHEN pr >= 1 THEN 1 ELSE 0 END) > 0
                     THEN sum(CASE WHEN pr >= 1 THEN pr ELSE 0 END)
                          * 1000000
                          // sum(CASE WHEN pr >= 1 THEN 1 ELSE 0 END)
                     ELSE 0 END AS BIGINT) AS sdii_micro
    FROM wk GROUP BY location_id, week ORDER BY location_id, week
    """,
)
def q_agg_extreme_wetdays(spark, sf_dir):
    """ETCCDI wet-day family in ONE corpus pass — R10mm/R20mm-style
    heavy-precipitation day counts (thresholds 100/200 on the twin's
    rainier scale), PRCPTOT (total wet-day precipitation) and SDII
    (simple daily intensity index = PRCPTOT / wet days, published
    floor-micro — non-negative, so DIV == floor on both engines): all
    cross-multiplied integer conditionals inside one
    map-side-combining hash aggregate per (location, 7-day block) —
    the C4/Gopher-gate discipline applied to climate indices."""
    daily = _wx_daily_pr(spark)
    wk = daily.withColumn("week", F.expr("day_idx DIV 7"))
    wet = F.when(F.col("pr") >= 1, 1).otherwise(0)
    wet_pr = F.when(F.col("pr") >= 1, F.col("pr")).otherwise(0)
    return (
        wk.groupBy(
            F.col("location_id").cast("long").alias("location_id"),
            F.col("week").cast("long").alias("week"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(wet).cast("long").alias("wet_days"),
            F.sum(F.when(F.col("pr") >= 100, 1).otherwise(0))
            .cast("long")
            .alias("r100mm"),
            F.sum(F.when(F.col("pr") >= 200, 1).otherwise(0))
            .cast("long")
            .alias("r200mm"),
            F.sum(wet_pr).cast("long").alias("prcptot"),
            F.when(
                F.sum(wet) > 0,
                F.expr(
                    "sum(CASE WHEN pr >= 1 THEN pr ELSE 0 END)"
                    " * CAST(1000000 AS BIGINT)"
                    " DIV sum(CASE WHEN pr >= 1 THEN 1 ELSE 0 END)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("sdii_micro"),
        )
        .orderBy("location_id", "week")
    )


# =====================================================================
# F. ETCCDI WSDI-family warm-spell index (percentile + gap-islands)
# =====================================================================


def _wsdi_oracle():
    from .registry_ext import wx_twin_sql

    return f"""
    WITH wx AS ({wx_twin_sql("duckdb")}),
    tx AS (SELECT location_id, CAST(ts AS DATE) AS d,
                  CAST(max(temperature_2m) AS BIGINT) AS tx
           FROM wx WHERE temperature_2m IS NOT NULL
           GROUP BY location_id, CAST(ts AS DATE)),
    txi AS (SELECT location_id,
                   CAST(date_diff('day', DATE '2024-01-01', d) AS BIGINT)
                     AS day_idx,
                   tx
            FROM tx),
    r AS (SELECT location_id, day_idx, tx,
                 row_number() OVER (PARTITION BY location_id
                                    ORDER BY tx, day_idx) AS rn,
                 count(*) OVER (PARTITION BY location_id) AS n
          FROM txi),
    thr AS (SELECT location_id, tx AS p75_tx
            FROM r WHERE rn = (3 * n + 3) // 4),
    hot AS (SELECT t.location_id, t.day_idx
            FROM txi t JOIN thr ON t.location_id = thr.location_id
            WHERE t.tx > thr.p75_tx),
    isl AS (SELECT location_id, day_idx,
                   day_idx - row_number() OVER (PARTITION BY location_id
                     ORDER BY day_idx) AS grp
            FROM hot),
    runs AS (SELECT location_id, grp, CAST(count(*) AS BIGINT) AS run_len
             FROM isl GROUP BY location_id, grp),
    spells AS (SELECT location_id, run_len FROM runs WHERE run_len >= 2)
    SELECT CAST(thr.location_id AS BIGINT) AS location_id,
           CAST(thr.p75_tx AS BIGINT) AS p75_tx,
           CAST(coalesce(sum(s.run_len), 0) AS BIGINT) AS wsdi_days,
           CAST(count(s.run_len) AS BIGINT) AS n_spells,
           CAST(coalesce(max(s.run_len), 0) AS BIGINT) AS longest_spell
    FROM thr LEFT JOIN spells s ON s.location_id = thr.location_id
    GROUP BY thr.location_id, thr.p75_tx ORDER BY location_id
    """


@register("agg_extreme_wsdi", _wsdi_oracle())
def q_agg_extreme_wsdi(spark, sf_dir):
    """ETCCDI WSDI-family warm-spell duration index — the composition
    of the two certified machineries: the percentile-exceedance
    threshold (exact rank SELECTION at (3n+3) DIV 4 under total order
    (tx, day_idx) — p75 and min spell length 2 re-key the p90/6-day
    definition to the 21-day twin record, where p90 spells are
    vacuous by construction) and the gap-islands spell finder over
    the exceedance days.  Published per location: total warm-spell
    days, spell count, longest spell, and the threshold itself.
    Locations without a qualifying spell still publish a zero row
    (left join from the threshold dim).  One window shuffle + one
    hash aggregate + a broadcast threshold join, all integer."""
    from pyspark.sql import Window

    from .registry_ext import wx_twin_sql
    from .session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark"))
    tx = (
        wx.filter(F.col("temperature_2m").isNotNull())
        .groupBy("location_id", F.col("ts").cast("date").alias("d"))
        .agg(F.max("temperature_2m").cast("long").alias("tx"))
        .withColumn(
            "day_idx",
            F.datediff(
                F.col("d"), F.lit("2024-01-01").cast("date")
            ).cast("long"),
        )
    )
    wloc = Window.partitionBy("location_id")
    r = tx.select(
        "location_id",
        "day_idx",
        "tx",
        F.row_number().over(wloc.orderBy("tx", "day_idx")).alias("rn"),
        F.count(F.lit(1)).over(wloc).alias("n"),
    )
    thr = r.filter(F.expr("rn = (3 * n + 3) DIV 4")).select(
        "location_id", F.col("tx").alias("p75_tx")
    )
    hot = (
        tx.join(F.broadcast(thr), "location_id")
        .filter(F.col("tx") > F.col("p75_tx"))
        .select("location_id", "day_idx")
    )
    isl = hot.withColumn(
        "grp",
        F.col("day_idx")
        - F.row_number().over(wloc.orderBy("day_idx")),
    )
    runs = isl.groupBy("location_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    spells = runs.filter(F.col("run_len") >= 2).select(
        "location_id", "run_len"
    )
    # both sides are per-location summaries (|locs| rows at any record
    # length) — broadcast the spell side so the zero-preserving left
    # join never sort-merges
    return (
        thr.join(F.broadcast(spells), "location_id", "left")
        .groupBy(
            F.col("location_id").cast("long").alias("location_id"),
            F.col("p75_tx").cast("long").alias("p75_tx"),
        )
        .agg(
            F.coalesce(F.sum("run_len"), F.lit(0))
            .cast("long")
            .alias("wsdi_days"),
            F.count("run_len").cast("long").alias("n_spells"),
            F.coalesce(F.max("run_len"), F.lit(0))
            .cast("long")
            .alias("longest_spell"),
        )
        .orderBy("location_id")
    )


# =====================================================================
# G. Length-bucketed batching — the padding-efficiency planner every
#    training loader runs before collation
# =====================================================================

#: engine-identical whitespace class (Java \s includes \x0B, RE2 does
#: not — ADVICE r11 #1 rule, explicit on both sides)
_WS = "[ \\t\\n\\r\\f\\x0B]+"
_WS_SQL = "[ \\t\\n\\r\\f\\x0B]+"


@register(
    "ext_pack_length_buckets",
    f"""
    WITH tok AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(text),
                                                   '{_WS_SQL}'),
                             x -> x <> '')) AS n_tok
      FROM documents),
    b AS (
      SELECT doc_id, n_tok,
             greatest(16, CASE WHEN n_tok <= 1 THEN 1
                               ELSE (CAST(1 AS BIGINT)) << length(bin(n_tok - 1))
                          END) AS bucket_len
      FROM tok WHERE n_tok > 0),
    g AS (
      SELECT bucket_len,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST((count(*) + 7) // 8 AS BIGINT) AS n_batches,
             CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
             CAST(sum(bucket_len - n_tok) AS BIGINT) AS pad_tokens
      FROM b GROUP BY bucket_len)
    SELECT CAST(bucket_len AS BIGINT) AS bucket_len, n_docs, n_batches,
           sum_tokens, pad_tokens,
           CAST(n_batches * 8 * bucket_len AS BIGINT) AS capacity,
           CAST(sum_tokens * 1000000 // (n_batches * 8 * bucket_len)
                AS BIGINT) AS efficiency_micro
    FROM g ORDER BY bucket_len
    """,
)
def q_ext_pack_length_buckets(spark, sf_dir):
    """LENGTH-BUCKETED batching plan — the padding-efficiency pass a
    training loader runs before collation (dynamic batching: group
    sequences into power-of-two length buckets so a batch pads to the
    bucket length, not the global max): token counts under the
    engine-identical whitespace class, bucket = max(16, 2^ceil(log2 n))
    spelled WITHOUT libm as 1 << bitlength(n−1) (``bin`` + ``length``
    on both engines — exact integers, the round-9 libm rule), batches
    of 8 per bucket, and per bucket the doc/batch/token counts,
    padding mass, slot capacity and floor-micro packing efficiency.
    One corpus pass + one map-side-combining hash aggregate on ~10
    bucket keys — trivially 100 TB-safe."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), _WS), lambda t: t != ""
            )
        ).alias("n_tok"),
    )
    b = tok.filter(F.col("n_tok") > 0).withColumn(
        "bucket_len",
        F.greatest(
            F.lit(16).cast("long"),
            F.when(F.col("n_tok") <= 1, F.lit(1).cast("long")).otherwise(
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "length(bin(n_tok - 1)))")
            ),
        ),
    )
    g = b.groupBy("bucket_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("CAST((count(*) + 7) DIV 8 AS BIGINT)").alias("n_batches"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
        F.sum(F.col("bucket_len") - F.col("n_tok"))
        .cast("long")
        .alias("pad_tokens"),
    )
    return g.select(
        F.col("bucket_len").cast("long").alias("bucket_len"),
        "n_docs",
        "n_batches",
        "sum_tokens",
        "pad_tokens",
        (F.col("n_batches") * 8 * F.col("bucket_len"))
        .cast("long")
        .alias("capacity"),
        F.expr(
            "CAST(sum_tokens * CAST(1000000 AS BIGINT)"
            " DIV (n_batches * 8 * bucket_len) AS BIGINT)"
        ).alias("efficiency_micro"),
    ).orderBy("bucket_len")


# =====================================================================
# I. Matryoshka truncated-dimension recall (MRL-style eval)
# =====================================================================


def _matryoshka_oracle():
    from .registry_ext import _COSINE_SQL

    parts = []
    for d in (16, 32, 64):
        cos = _COSINE_SQL.format(
            a=f"eq.embedding[1:{d}]", b=f"ec.embedding[1:{d}]"
        )
        parts.append(f"""
    t{d} AS (
      SELECT query_id, match_id FROM (
        SELECT eq.vec_id AS query_id, ec.vec_id AS match_id,
               row_number() OVER (PARTITION BY eq.vec_id
                 ORDER BY {cos} DESC, ec.vec_id) AS rank
        FROM embeddings eq CROSS JOIN embeddings ec
        WHERE eq.vec_id < 5 AND eq.vec_id <> ec.vec_id)
      WHERE rank <= 3),
    h{d} AS (
      SELECT e.query_id, e.match_id
      FROM t64 e JOIN t{d} a
        ON a.query_id = e.query_id AND a.match_id = e.match_id)""")
    rows = " UNION ALL ".join(
        f"""SELECT CAST({d} AS BIGINT) AS trunc_dim,
           CAST((SELECT count(*) FROM t64) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM h{d}) AS BIGINT) AS n_hits,
           CAST((SELECT count(*) FROM h{d}) * 1000000
                // greatest((SELECT count(*) FROM t64), 1) AS BIGINT)
             AS recall_micro"""
        for d in (16, 32, 64)
    )
    return f"WITH {','.join(parts)}\n    {rows} ORDER BY trunc_dim"


@register("ext_eval_matryoshka", _matryoshka_oracle())
def q_ext_eval_matryoshka(spark, sf_dir):
    """MATRYOSHKA (MRL-style) truncated-dimension recall — the eval a
    team runs before shipping truncatable embeddings: rank by exact
    cosine on the FIRST d dims (d = 16/32/64) and score recall@3
    against the full-dim exact top-3, per truncation.  Dim slicing is
    a zero-copy array prefix on both engines and the certified
    ``cosine_topk`` ranking (fixed fold order, ties by vec_id) runs
    unchanged on the sliced column, so every recall value is
    hash-pinned.  Scale shape: ONE broadcast-query corpus pass
    computing all three truncations' cosines and ranks (3 window
    sorts over one exchange, one aggregate) — at 100 TB the same
    eval runs on a hash sample, same plan."""
    from pyspark.sql import Window

    from .ext.simsearch import _dot, _norm

    dims = (16, 32, 64)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        *[F.slice("embedding", 1, d).alias(f"q{d}") for d in dims],
    )
    q = q.select(
        "query_id",
        *[F.col(f"q{d}") for d in dims],
        *[_norm(F.col(f"q{d}")).alias(f"qn{d}") for d in dims],
    )
    c = emb.select(
        F.col("vec_id").alias("match_id"),
        *[F.slice("embedding", 1, d).alias(f"c{d}") for d in dims],
    )
    c = c.select(
        "match_id",
        *[F.col(f"c{d}") for d in dims],
        *[_norm(F.col(f"c{d}")).alias(f"cn{d}") for d in dims],
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
    )
    for d in dims:
        # the certified cosine_topk expression verbatim, per slice
        pairs = pairs.withColumn(
            f"cos{d}",
            _dot(F.col(f"q{d}"), F.col(f"c{d}"))
            / (F.col(f"qn{d}") * F.col(f"cn{d}")),
        )
    w = Window.partitionBy("query_id")
    for d in dims:
        pairs = pairs.withColumn(
            f"r{d}",
            F.row_number().over(
                w.orderBy(F.col(f"cos{d}").desc(), F.col("match_id"))
            ),
        )
    got = pairs.agg(
        F.sum(F.when(F.col("r64") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("n_truth"),
        *[
            F.sum(
                F.when((F.col(f"r{d}") <= 3) & (F.col("r64") <= 3), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias(f"h{d}")
            for d in dims
        ],
    ).first()
    n_truth = int(got["n_truth"])
    rows = [
        (d, n_truth, int(got[f"h{d}"]),
         int(got[f"h{d}"] * 1_000_000 // max(n_truth, 1)))
        for d in dims
    ]
    return local_frame(
        spark,
        rows,
        "trunc_dim long, n_truth long, n_hits long, recall_micro long",
    ).orderBy("trunc_dim")


# =====================================================================
# J. Streaming trained-index ingest (foreachBatch encode-on-arrival
#    against the OFFLINE trained codebooks)
# =====================================================================


def _stream_refined_oracle():
    from .registry_r11 import _ivfpq_refined_ctes

    return f"""
    WITH RECURSIVE {_ivfpq_refined_ctes()},
    csum AS (SELECT match_id, CAST(sum(code) AS BIGINT) AS cs
             FROM codes GROUP BY match_id)
    SELECT CAST(l.cid AS BIGINT) AS cid,
           CAST(count(*) AS BIGINT) AS n_codes,
           CAST(sum(l.match_id) AS BIGINT) AS match_sum,
           CAST(sum(c.cs) AS BIGINT) AS code_sum
    FROM lists l JOIN csum c ON c.match_id = l.match_id
    GROUP BY l.cid ORDER BY cid
    """


@register("stream_refined_index", _stream_refined_oracle())
def q_stream_refined_index(spark, sf_dir):
    """STREAMING ingest for the TRAINED serving-config index — the
    r10 ``stream_simsearch_index`` story upgraded to the realistic
    codebooks: vectors keep arriving, codebooks train OFFLINE (once),
    so each micro-batch encodes against the loaded static codebooks
    (``ivfpq_refined_encode_epoch`` — the same certified Arrow
    kernel) and appends a replay-idempotent ``epoch=N`` partition of
    WIDE per-vector records.  The streamed store's per-list manifest
    (vector count, id checksum, PQ-code checksum per coarse list)
    must equal the batch encode BIT-FOR-BIT — encoding is per-row
    against fixed codebooks, so the union over ANY batching is the
    batch result; the oracle re-derives every coarse assignment and
    every one of the m codes through the serving-config SQL replay.
    Per-batch cost |new|·(n_clusters + m·ksub) broadcast work; the
    stored index is never rescanned."""
    import os
    import shutil

    from .ext.simsearch import (
        ivfpq_refined_encode_epoch,
        load_refined_codebooks,
    )
    from .registry import _clean_stale_scratch, _session_tag
    from .registry_r11 import _RT, _ensure_refined_index

    idx = _ensure_refined_index(spark, sf_dir)
    cb = load_refined_codebooks(spark, idx, _RT["m"])
    _clean_stale_scratch("/tmp/wds_sridx_*")
    root = f"/tmp/wds_sridx_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")

    # stage the corpus as two arrival files (vec_id halves)
    mid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
    now = 1_700_000_000
    for i, part in enumerate(
        [emb.filter(F.col("vec_id") <= mid), emb.filter(F.col("vec_id") > mid)]
    ):
        sub = os.path.join(root, "in", f"f{i}")
        part.select("vec_id", "embedding").coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (now + i * 3600, now + i * 3600))

    store = f"{root}/store"

    def handle(batch_df, epoch_id):
        ivfpq_refined_encode_epoch(
            batch_df, cb[0], cb[1], _RT["m"], _RT["dim"]
        ).write.mode("overwrite").parquet(f"{store}/epoch={int(epoch_id)}")

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
    back = spark.read.parquet(store)
    return (
        back.withColumn("cid", F.col("cid").cast("long"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_codes"),
            F.sum("match_id").cast("long").alias("match_sum"),
            F.sum(
                F.aggregate(
                    "codes",
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                )
            )
            .cast("long")
            .alias("code_sum"),
        )
        .orderBy("cid")
    )


# =====================================================================
# K. ETCCDI DTR — diurnal temperature range
# =====================================================================


def _dtr_oracle():
    from .registry_ext import wx_twin_sql

    return f"""
    WITH wx AS ({wx_twin_sql("duckdb")}),
    d AS (SELECT location_id, CAST(ts AS DATE) AS dd,
                 CAST(max(temperature_2m) AS BIGINT)
                   - CAST(min(temperature_2m) AS BIGINT) AS rng
          FROM wx WHERE temperature_2m IS NOT NULL
          GROUP BY location_id, CAST(ts AS DATE)),
    di AS (SELECT location_id,
                  CAST(date_diff('day', DATE '2024-01-01', dd) AS BIGINT)
                    AS day_idx,
                  rng
           FROM d),
    wk AS (SELECT location_id, day_idx // 7 AS week, day_idx, rng
           FROM di),
    r AS (SELECT location_id, week, rng, day_idx,
                 row_number() OVER (PARTITION BY location_id, week
                   ORDER BY rng DESC, day_idx) AS rn,
                 count(*) OVER (PARTITION BY location_id, week) AS n_days,
                 sum(rng) OVER (PARTITION BY location_id, week) AS s
          FROM wk)
    SELECT CAST(location_id AS BIGINT) AS location_id,
           CAST(week AS BIGINT) AS week,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(s * 1000000 // n_days AS BIGINT) AS dtr_mean_micro,
           CAST(rng AS BIGINT) AS dtr_max,
           CAST(day_idx AS BIGINT) AS max_day
    FROM r WHERE rn = 1 ORDER BY location_id, week
    """


@register("agg_extreme_dtr", _dtr_oracle())
def q_agg_extreme_dtr(spark, sf_dir):
    """ETCCDI DTR — diurnal temperature range per location × 7-day
    block: daily max−min temperature (exact integers on the twin),
    the block MEAN published floor-micro (the range is non-negative,
    so DIV == floor on both engines) and the block-max range as an
    argmax row under the total order (rng DESC, day_idx).  One daily
    rollup + one block window — the Rx1day shape on a derived
    measure."""
    from pyspark.sql import Window

    from .registry_ext import wx_twin_sql
    from .session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark"))
    d = (
        wx.filter(F.col("temperature_2m").isNotNull())
        .groupBy("location_id", F.col("ts").cast("date").alias("dd"))
        .agg(
            (
                F.max("temperature_2m").cast("long")
                - F.min("temperature_2m").cast("long")
            ).alias("rng")
        )
        .withColumn(
            "day_idx",
            F.datediff(
                F.col("dd"), F.lit("2024-01-01").cast("date")
            ).cast("long"),
        )
        .withColumn("week", F.expr("day_idx DIV 7"))
    )
    w = Window.partitionBy("location_id", "week")
    r = d.select(
        "location_id",
        "week",
        "rng",
        "day_idx",
        F.row_number()
        .over(w.orderBy(F.col("rng").desc(), F.col("day_idx")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("rng").over(w).alias("s"),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            F.col("location_id").cast("long").alias("location_id"),
            F.col("week").cast("long").alias("week"),
            F.col("n_days").cast("long").alias("n_days"),
            F.expr("CAST(s * CAST(1000000 AS BIGINT) DIV n_days AS BIGINT)")
            .alias("dtr_mean_micro"),
            F.col("rng").cast("long").alias("dtr_max"),
            F.col("day_idx").cast("long").alias("max_day"),
        )
        .orderBy("location_id", "week")
    )


