"""Round-14 behavioral pins: the hot-list compaction salt knob
(VERDICT r13 #4 / BASELINE round-13 probe 1).  Hash equivalence of
every registry entry is covered by tests/test_correctness.py; these
pins cover the knob's two contracts — file-count splitting for hot
lists only, and bit-identical store contents either way."""

import glob
import os

from pyspark.sql import functions as F


def _parquet_files(store: str, cid) -> list:
    return glob.glob(os.path.join(store, f"cid={cid}", "*.parquet"))


def _rows(spark, store: str) -> list:
    return sorted(
        map(tuple, spark.read.parquet(store).collect())
    )


def test_hot_list_salt_knob_splits_files_and_preserves_rows(
    spark, tmp_path
):
    """The 128k hot-partition shape from BASELINE round-13 probe 1:
    one list holds ~25k rows (the 'new content cluster' drift), the
    rest spread uniformly.  With the knob off (default) every list
    writes exactly one file (the round-12 fanout rule).  With a
    threshold below the hot list's size, ONLY the hot list splits
    into multiple files (≤ salt_k — its write parallelizes instead
    of running as one straggler task) while every cold list keeps
    exactly one file, and both stores read back bit-identical."""
    from weather_data_ingestion_service_spark.ext.simsearch import (
        ivfpq_refined_compact_epochs,
    )

    n, hot_rows, n_lists = 128_000, 25_000, 64
    live = (
        spark.range(n)
        .select(
            F.col("id").alias("match_id"),
            F.when(F.col("id") < hot_rows, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(n_lists - 1)) + 1)
            .alias("cid"),
            F.array(
                (F.col("id") % 7).cast("int"), (F.col("id") % 5).cast("int")
            ).alias("codes"),
            F.array(F.col("id") % 256, F.col("id") % 64).alias("q"),
            F.lit(1.0).alias("scale"),
        )
        .select("match_id", "codes", "q", "scale", "cid")
    )
    # immutable codebook sidecars the compaction hardlinks over
    idx = str(tmp_path / "idx")
    for tbl in ("coarse", "books"):
        spark.range(1).coalesce(1).write.parquet(f"{idx}/{tbl}")

    plain = str(tmp_path / "serving_plain")
    salted = str(tmp_path / "serving_salted")
    ivfpq_refined_compact_epochs(spark, idx, live, plain)
    ivfpq_refined_compact_epochs(
        spark, idx, live, salted, salt_rows=10_000, salt_k=8
    )

    for store in ("codes", "vectors"):
        # knob off: one file per list, hot or not (round-12 rule)
        assert len(_parquet_files(f"{plain}/{store}", 0)) == 1
        assert len(_parquet_files(f"{plain}/{store}", 1)) == 1
        # knob on: the hot list (25k > 10k) splits, bounded by salt_k
        hot_files = len(_parquet_files(f"{salted}/{store}", 0))
        assert 2 <= hot_files <= 8, hot_files
        # every cold list still writes exactly one file
        for cid in (1, 2, 63):
            assert len(_parquet_files(f"{salted}/{store}", cid)) == 1
        # parity: layout is the ONLY thing the knob may change
        assert _rows(spark, f"{plain}/{store}") == _rows(
            spark, f"{salted}/{store}"
        )


def test_salt_knob_env_default_off_and_threshold_not_met(
    spark, monkeypatch
):
    """Default (no env, no arg) and a not-exceeded threshold both
    plan the plain repartition("cid") — a single cid-hash shuffle
    key, no salt expression (the local bench stays comparable)."""
    from weather_data_ingestion_service_spark.ext.simsearch import (
        _salted_cid_repartition,
    )

    df = spark.range(100).select(
        F.col("id").alias("match_id"),
        F.pmod(F.col("id"), F.lit(4)).alias("cid"),
    )
    # ADVICE r14 #2: guarantee the default rather than asserting the
    # ambient environment (a host that legitimately sets the
    # production knob must not fail this pin)
    monkeypatch.delenv("WDS_LIST_SALT_ROWS", raising=False)
    for out in (
        _salted_cid_repartition(df),
        _salted_cid_repartition(df, salt_rows=1_000_000),
    ):
        plan = out._jdf.queryExecution().toString()
        assert "xxhash64" not in plan
