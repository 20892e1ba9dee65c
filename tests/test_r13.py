"""Round-13 behavioral pins: the generation-swap pointer mechanics,
the planted deleted-list hole, the streaming drift→retrain gate flip,
and the 3-year calendar TX90p config (hash equivalence itself is
covered by tests/test_correctness.py like every registry entry)."""

import os

from pyspark.sql import functions as F

from weather_data_ingestion_service_spark.io import load_table
from weather_data_ingestion_service_spark.registry import queries

QS = queries()


def test_generation_manifest_pointer_mechanics(spark, tmp_path):
    """The manifest is append-only state with a max_by(state_epoch)
    resolution: a flip is one append of new state rows, the pointer
    lands on the highest ACTIVE generation, and a retired generation
    is visible as such (GC's input)."""
    from weather_data_ingestion_service_spark.ext.simsearch import (
        index_generation_active,
        index_generation_append,
        index_generation_states,
    )

    mf = str(tmp_path / "manifest")
    index_generation_append(spark, mf, [(0, "/g0", 0, 1)])
    assert index_generation_active(spark, mf) == (0, "/g0")
    # the flip: gen1 goes live, gen0 retires — ONE append
    index_generation_append(spark, mf, [(1, "/g1", 1, 1), (0, "/g0", 1, 0)])
    assert index_generation_active(spark, mf) == (1, "/g1")
    states = {
        int(r["generation"]): (str(r["path"]), int(r["active"]))
        for r in index_generation_states(spark, mf).collect()
    }
    assert states == {0: ("/g0", 0), 1: ("/g1", 1)}
    # a later un-retire wins over the older retire (latest state_epoch)
    index_generation_append(spark, mf, [(0, "/g0", 2, 1)])
    states = {
        int(r["generation"]): int(r["active"])
        for r in index_generation_states(spark, mf).collect()
    }
    assert states[0] == 1
    # ...but the pointer still prefers the HIGHEST active generation
    assert index_generation_active(spark, mf) == (1, "/g1")


def test_swap_gc_reclaims_gen0_and_gen1_keeps_pruning(spark, sf_dir):
    """After the swap entry runs: generation 0's directory is gone
    (GC'd once retired), generation 1 serves through the pointer, and
    a query planned against it still statically prunes BOTH
    cid-partitioned scans — the flip must not cost the pruned
    layout."""
    import re

    from weather_data_ingestion_service_spark.ext.simsearch import (
        index_generation_active,
        ivfpq_refined_query_index,
    )
    from weather_data_ingestion_service_spark.plans import formatted_plan
    from weather_data_ingestion_service_spark.registry import _session_tag
    from weather_data_ingestion_service_spark.registry_r11 import _RT

    out = QS["ext_simsearch_index_swap"](spark, sf_dir)
    gens = sorted(
        {int(r["generation"]) for r in out.select("generation").collect()}
    )
    assert gens == [0, 1]

    root = f"/tmp/wds_swap_{_session_tag(spark, sf_dir)}"
    assert not os.path.exists(f"{root}/gen0"), "retired gen0 not GC'd"
    gen, path = index_generation_active(spark, root + "/manifest")
    assert gen == 1 and path == f"{root}/gen1"

    emb = load_table(spark, sf_dir, "embeddings")
    df = ivfpq_refined_query_index(
        spark, path, emb.filter(F.col("vec_id") < 5), "vec_id",
        "embedding", k=3, nprobe=_RT["nprobe"],
        shortlist=_RT["shortlist"], m=_RT["m"], eager=False,
    )
    plan = formatted_plan(df)
    spark.catalog.clearCache()
    pfs = re.findall(r"PartitionFilters: \[([^\]]*cid[^\]]*)\]", plan)
    assert len(pfs) >= 2, plan[-3000:]


def test_list_hole_is_planted_and_survivable(spark, sf_dir):
    """The planted case is real: query 0's exact top-1 neighbor's
    whole coarse list is tombstoned — so the true top hit is
    unreachable — yet the serve path returns k results per query from
    the surviving lists, none of them hole members, and the empty
    list's partition is GONE from the compacted store (scanned as
    zero rows, not an error)."""
    from weather_data_ingestion_service_spark.ext.simsearch import (
        cosine_topk,
    )
    from weather_data_ingestion_service_spark.registry import _session_tag
    from weather_data_ingestion_service_spark.registry_r11 import (
        _RT,
        _ensure_refined_index,
    )

    out = QS["ext_simsearch_index_list_hole"](spark, sf_dir).collect()
    per_query = {}
    for r in out:
        per_query.setdefault(int(r["query_id"]), []).append(
            int(r["match_id"])
        )
    assert all(len(v) == _RT["k"] for v in per_query.values()), per_query

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _ensure_refined_index(spark, sf_dir)
    vecs = spark.read.parquet(idx + "/vectors")
    top1 = int(
        cosine_topk(
            emb, emb.filter(F.col("vec_id") == 0), "vec_id",
            "embedding", k=1,
        ).first()["match_id"]
    )
    cid0 = int(
        vecs.filter(F.col("match_id") == top1).select("cid").first()["cid"]
    )
    hole = {
        int(r["match_id"])
        for r in vecs.filter(F.col("cid") == cid0).collect()
    }
    # the planted evidence: the true top hit lived in the hole...
    assert top1 in hole
    # ...and is unreachable now — no returned match is a hole member
    returned = {m for ms in per_query.values() for m in ms}
    assert not (returned & hole), returned & hole
    assert top1 not in per_query[0]

    # the empty list is gone from disk in BOTH compacted stores
    serving = f"/tmp/wds_hole_{_session_tag(spark, sf_dir)}/serving"
    for store in ("codes", "vectors"):
        parts = {
            d for d in os.listdir(f"{serving}/{store}")
            if d.startswith("cid=")
        }
        assert f"cid={cid0}" not in parts, (store, cid0)


def test_stream_drift_retrain_gate_flips_then_recovers(spark, sf_dir):
    """The composed entry's two gate rows tell the story: the planted
    half-loss gates RED (recall far below the 0.80 threshold), the
    retrain from the catalog corpus gates GREEN (recall at/above
    it)."""
    rows = {
        int(r["stage"]): r
        for r in QS["stream_drift_retrain"](spark, sf_dir).collect()
    }
    assert int(rows[0]["retrain_needed"]) == 1
    assert int(rows[1]["retrain_needed"]) == 0
    assert int(rows[0]["recall_micro"]) < int(rows[1]["recall_micro"])
    assert int(rows[1]["recall_micro"]) >= 800_000


def test_tx90p_year_calendar_config(spark, sf_dir):
    """The 3-year record supports the true calendar config: every
    location × month of 2024-2026 present (leap February included),
    interior calendar days pool exactly 15 base values (±2-day window
    × 3 years), and the exceedance fraction is a real selection (not
    the degenerate single-window max ⇒ some exceedances exist, but
    far from all days)."""
    out = QS["agg_extreme_tx90p_year"](spark, sf_dir).collect()
    assert len(out) == 5 * 36
    feb24 = [r for r in out if int(r["yr"]) == 2024 and int(r["mth"]) == 2]
    assert all(int(r["n_days"]) == 29 for r in feb24)
    total_exceed = sum(int(r["n_exceed"]) for r in out)
    total_days = sum(int(r["n_days"]) for r in out)
    assert total_days == 5 * (366 + 365 + 364)
    # p90 exceedance rate should be loosely near 10%, never 0 or >30%
    assert 0 < total_exceed < total_days * 3 // 10

    # interior days pool 15 base values; the year edges clamp
    from weather_data_ingestion_service_spark.registry_r13 import (
        _TX_YEAR_DAYS,
    )
    from weather_data_ingestion_service_spark.registry_ext import (
        wx_twin_sql,
    )
    from weather_data_ingestion_service_spark.session import configure

    configure(spark)
    wx = spark.sql(wx_twin_sql("spark", days=_TX_YEAR_DAYS))
    di = (
        wx.groupBy("location_id", F.col("ts").cast("date").alias("dd"))
        .agg(F.max("temperature_2m").cast("long").alias("tx"))
        .withColumn("doy", F.dayofyear("dd").cast("long"))
    )
    counts = (
        di.select(
            "location_id",
            F.explode(
                F.sequence(F.col("doy") - 2, F.col("doy") + 2)
            ).alias("tdoy"),
        )
        .groupBy("location_id", "tdoy")
        .count()
        .filter((F.col("tdoy") >= 10) & (F.col("tdoy") <= 350))
        .select(F.min("count").alias("lo"), F.max("count").alias("hi"))
        .first()
    )
    assert (int(counts["lo"]), int(counts["hi"])) == (15, 15)


def test_gsl_year_spell_semantics(spark, sf_dir):
    """GSL invariants on the 3-year record: one row per location ×
    year; GSL is 0 exactly when no ≥6-day warm spell exists; a
    no-end season runs to year end (year_days + 1 − start); otherwise
    end ≥ July is the run START of a ≥6-day cold run and gsl =
    max(0, end − start)."""
    rows = QS["agg_extreme_gsl_year"](spark, sf_dir).collect()
    assert len(rows) == 5 * 3
    for r in rows:
        start, end = int(r["start_doy"]), int(r["end_doy"])
        gsl, ydays = int(r["gsl_days"]), int(r["year_days"])
        assert ydays in (364, 365, 366)
        if start == 0:
            assert gsl == 0
        elif end == 0:
            assert gsl == ydays + 1 - start
        else:
            assert gsl == max(0, end - start)
            # July 1 is doy 182 (non-leap) / 183 (leap): the end
            # trigger's run starts at midyear or later
            assert end >= 182


def test_rollback_restores_gen0_and_gcs_faulted_gen(spark, sf_dir):
    """After the rollback entry: phase 2 rows equal phase 0 rows
    bit-for-bit (the pointer restored the old generation), the
    FAULTED generation 1 directory is GC'd while generation 0
    survives, and the pointer reads generation 0."""
    from weather_data_ingestion_service_spark.ext.simsearch import (
        index_generation_active,
    )
    from weather_data_ingestion_service_spark.registry import _session_tag

    out = QS["ext_simsearch_index_rollback"](spark, sf_dir).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(int(r["phase"]), []).append(
            (int(r["query_id"]), int(r["match_id"]), int(r["rank"]),
             int(r["adc"]), int(r["refine_micro"]))
        )
    assert sorted(by_phase[0]) == sorted(by_phase[2])
    assert sorted(by_phase[0]) != sorted(by_phase[1])

    root = f"/tmp/wds_rollb_{_session_tag(spark, sf_dir)}"
    assert os.path.exists(f"{root}/gen0")
    assert not os.path.exists(f"{root}/gen1"), "faulted gen1 not GC'd"
    assert index_generation_active(spark, root + "/manifest") == (
        0, f"{root}/gen0",
    )


def test_delta_compact_rewrites_only_touched_lists(spark, sf_dir):
    """After the delta entry: untouched lists' parquet files in the
    new serving store are HARDLINKS of the previous store's files
    (same inode — never rewritten), the codebook tables are hardlinks
    too, touched lists are freshly written, the deleted ids are gone
    and every upserted id sits in exactly one list."""
    import glob

    from weather_data_ingestion_service_spark.registry import _session_tag
    from weather_data_ingestion_service_spark.registry_r13 import (
        _DELTA_DELETE,
        _DELTA_UPSERT,
    )

    QS["ext_simsearch_index_compact_delta"](spark, sf_dir).collect()
    root = f"/tmp/wds_dcmp_{_session_tag(spark, sf_dir)}"
    prev, new = f"{root}/serving1", f"{root}/serving2"

    def inodes(base):
        return {
            os.path.relpath(p, base): os.stat(p).st_ino
            for p in glob.glob(f"{base}/**/*.parquet", recursive=True)
        }

    pi, ni = inodes(prev), inodes(new)
    linked = {p for p in ni if p in pi and ni[p] == pi[p]}
    rewritten = set(ni) - linked
    # codebooks always link; at least one list must link and at least
    # one must be rewritten (the change stream is sparse by design)
    assert any(p.startswith("coarse/") for p in linked)
    assert any(p.startswith("books/") for p in linked)
    assert any(p.startswith("vectors/cid=") for p in linked)
    assert any(p.startswith("vectors/cid=") for p in rewritten)

    v = spark.read.parquet(new + "/vectors")
    dead = _DELTA_DELETE.replace("vec_id", "match_id")
    assert v.filter(F.expr(dead)).count() == 0
    dup = (
        v.groupBy("match_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    assert _DELTA_UPSERT  # imported for parity with the entry's story


def test_vacuum_is_hardlink_safe(spark, sf_dir):
    """Vacuuming the PREVIOUS serving store and the folded-in epoch
    dirs after a delta compaction must not disturb the new store:
    untouched lists live there as hardlinks, and dropping the old
    name only decrements the refcount.  The post-vacuum serve is
    byte-identical to the pre-vacuum serve."""
    from weather_data_ingestion_service_spark.ext.simsearch import (
        index_vacuum,
        ivfpq_refined_query_index,
    )
    from weather_data_ingestion_service_spark.registry import _session_tag
    from weather_data_ingestion_service_spark.registry_r11 import _RT

    QS["ext_simsearch_index_compact_delta"](spark, sf_dir).collect()
    root = f"/tmp/wds_dcmp_{_session_tag(spark, sf_dir)}"
    emb = load_table(spark, sf_dir, "embeddings")

    def serve():
        return sorted(
            (int(r["query_id"]), int(r["match_id"]), int(r["rank"]),
             int(r["adc"]), int(r["refine_micro"]))
            for r in ivfpq_refined_query_index(
                spark, f"{root}/serving2",
                emb.filter(F.col("vec_id") < _RT["n_queries"]),
                "vec_id", "embedding", k=_RT["k"],
                nprobe=_RT["nprobe"], shortlist=_RT["shortlist"],
                m=_RT["m"], dim=_RT["dim"],
            ).collect()
        )

    before = serve()
    n = index_vacuum(
        [f"{root}/serving1", f"{root}/ingest0", f"{root}/delta"]
    )
    assert n == 3
    assert not os.path.exists(f"{root}/serving1")
    assert serve() == before
