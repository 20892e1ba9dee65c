"""Hand-computed unit cases for the round-2 operator batch:
interval coalescing, histogram, exact-integer sigma outliers,
weighted sampling, sequence packing."""

import pytest
from pyspark.sql import functions as F


def test_coalesce_intervals_merges_touching_and_overlapping(spark):
    from weather_data_ingestion_service_spark.operators.windows import (
        coalesce_intervals,
    )

    df = spark.createDataFrame(
        [
            # key a: [1,5] [3,7] overlap -> [1,7]; [8,9] separate;
            #        [9,10] touches (start == prev end) -> merged
            ("a", 1, 5),
            ("a", 3, 7),
            ("a", 8, 9),
            ("a", 9, 10),
            # key b: contained interval [2,3] inside [1,10]
            ("b", 1, 10),
            ("b", 2, 3),
        ],
        "k string, s int, e int",
    )
    out = coalesce_intervals(df, ["k"], "s", "e")
    rows = {(r.k, r.s, r.e): r.n_merged for r in out.collect()}
    assert rows == {("a", 1, 7): 2, ("a", 8, 10): 2, ("b", 1, 10): 2}


def test_coalesce_intervals_single_row_groups(spark):
    from weather_data_ingestion_service_spark.operators.windows import (
        coalesce_intervals,
    )

    df = spark.createDataFrame([("x", 4, 6)], "k string, s int, e int")
    assert coalesce_intervals(df, ["k"], "s", "e").collect()[0].asDict() == {
        "k": "x", "s": 4, "e": 6, "n_merged": 1
    }


def test_value_histogram_bins_and_negatives(spark):
    from weather_data_ingestion_service_spark.operators.aggregates import (
        value_histogram,
    )

    df = spark.createDataFrame(
        [(0.0,), (0.49,), (0.5,), (0.99,), (-0.25,), (None,)],
        "v double",
    )
    out = value_histogram(df, "v", scale=2)
    got = {r.bin: (r.n_rows, r.bin_lo) for r in out.collect()}
    # floor(v*2): 0.0,0.49 -> 0; 0.5,0.99 -> 1; -0.25 -> -1; null -> null
    assert got[0] == (2, 0.0)
    assert got[1] == (2, 0.5)
    assert got[-1] == (1, -0.5)
    assert got[None] == (1, None)


def test_value_histogram_rejects_non_power_of_two(spark):
    from weather_data_ingestion_service_spark.operators.aggregates import (
        value_histogram,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(AssertionError):
        value_histogram(df, "v", scale=3)


def test_sigma_outliers_flags_only_the_spike(spark):
    from weather_data_ingestion_service_spark.operators.aggregates import (
        sigma_outliers,
    )

    # 20 values at 1.00 and one at 100.00: the spike is the only row
    # beyond 3 sigma; the cluster rows are well inside.
    rows = [(i, "g", 1.0) for i in range(20)] + [(99, "g", 100.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = sigma_outliers(df, ["g"], "v", n_sigma=3, id_cols=["id"])
    assert [r.id for r in out.collect()] == [99]


def test_sigma_outliers_zero_variance_group_is_silent(spark):
    from weather_data_ingestion_service_spark.operators.aggregates import (
        sigma_outliers,
    )

    df = spark.createDataFrame(
        [(1, "g", 2.5), (2, "g", 2.5), (3, "g", 2.5)],
        "id long, g string, v double",
    )
    assert sigma_outliers(df, ["g"], "v", n_sigma=3, id_cols=["id"]).count() == 0


def test_weighted_sample_favors_heavy_rows(spark):
    from weather_data_ingestion_service_spark.ext.sampling import (
        weighted_sample_topk,
    )

    # 200 light rows (weight 1) + 200 heavy rows (weight 50): the
    # sample should be dominated by heavy rows (expected ~98%).
    rows = [(i, 1) for i in range(200)] + [(i + 1000, 50) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    picked = weighted_sample_topk(df, "id", "w", k=40).collect()
    assert len(picked) == 40
    heavy = sum(1 for r in picked if r.id >= 1000)
    assert heavy >= 35
    # deterministic: same input -> same sample
    again = weighted_sample_topk(df, "id", "w", k=40).collect()
    assert [r.id for r in picked] == [r.id for r in again]


def test_pack_sequences_offsets_are_contiguous_per_shard(spark):
    from weather_data_ingestion_service_spark.ext.packing import pack_sequences

    rows = [(i, 100 + (i * 37) % 400) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, toks long")
    out = pack_sequences(df, "id", "toks", budget=512, n_shards=4).collect()
    assert len(out) == 300
    # reconstruct each shard's stream: bins must tile the stream
    # exactly — every doc's global offset equals the running sum of
    # token counts in stream order, and bin_id/bin_offset re-derive
    # from it.
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    import hashlib

    assert set(by_shard) == {0, 1, 2, 3}
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: (hashlib.md5(str(r.id).encode()).hexdigest(), r.id))
        offset = 0
        for r in docs:
            assert r.bin_id == offset // 512
            assert r.bin_offset == offset % 512
            assert r.straddles == ((offset + r.toks - 1) // 512 > r.bin_id)
            offset += r.toks


def test_pack_sequences_bin_capacity_never_exceeded_by_nonstraddlers(spark):
    from weather_data_ingestion_service_spark.ext.packing import pack_sequences

    rows = [(i, 10 + i % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, toks long")
    for r in pack_sequences(df, "id", "toks", budget=256, n_shards=2).collect():
        if not r.straddles:
            assert r.bin_offset + r.toks <= 256


def test_pack_bestfit_budget_exactly_once_deterministic(spark):
    from weather_data_ingestion_service_spark.ext.packing import pack_bestfit

    rows = [(i, 10 + (i * 53) % 300) for i in range(250)]  # some > budget
    df = spark.createDataFrame(rows, "id long, toks long")
    out = pack_bestfit(df, "id", "toks", budget=256, n_shards=4).collect()
    # every doc exactly once
    assert sorted(r.id for r in out) == list(range(250))
    # per-(shard, bin) totals: within budget unless a single oversized doc
    from collections import defaultdict

    bins = defaultdict(list)
    for r in out:
        bins[(r.shard, r.bin_id)].append(r)
    for members in bins.values():
        total = sum(r.n_tokens for r in members)
        if total > 256:
            assert len(members) == 1 and members[0].oversized
    # deterministic for any partitioning
    again = pack_bestfit(
        df.repartition(7), "id", "toks", budget=256, n_shards=4
    ).collect()
    assert sorted((r.id, r.shard, r.bin_id) for r in out) == sorted(
        (r.id, r.shard, r.bin_id) for r in again
    )


def test_scd2_compress_collapses_runs_and_stamps_intervals(spark):
    from weather_data_ingestion_service_spark.operators.windows import (
        scd2_compress,
    )

    df = spark.createDataFrame(
        [
            # user u: A A B B A  -> intervals A[1,3) B[3,5) A[5,null)
            ("u", 1, "A"), ("u", 2, "A"), ("u", 3, "B"),
            ("u", 4, "B"), ("u", 5, "A"),
            # user v: null -> X is a change; X -> null is a change
            ("v", 1, None), ("v", 2, "X"), ("v", 3, None),
        ],
        "k string, t int, v string",
    )
    out = scd2_compress(df, ["k"], "t", "v").collect()
    got = {(r.k, r.valid_from): (r.v, r.valid_to) for r in out}
    assert got == {
        ("u", 1): ("A", 3), ("u", 3): ("B", 5), ("u", 5): ("A", None),
        ("v", 1): (None, 2), ("v", 2): ("X", 3), ("v", 3): (None, None),
    }


def test_epoch_shuffle_is_deterministic_and_epoch_dependent(spark):
    from weather_data_ingestion_service_spark.ext.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    e1 = [(r.shard, r.shuffle_rank, r.id)
          for r in epoch_shuffle(df, "id", epoch=1).collect()]
    e1b = [(r.shard, r.shuffle_rank, r.id)
           for r in epoch_shuffle(df, "id", epoch=1).collect()]
    e2 = [(r.shard, r.shuffle_rank, r.id)
          for r in epoch_shuffle(df, "id", epoch=2).collect()]
    assert sorted(e1) == sorted(e1b)          # reproducible
    assert sorted(e1) != sorted(e2)           # epochs reshuffle
    # ranks tile 1..count within each shard
    by_shard = {}
    for s, r, _ in e1:
        by_shard.setdefault(s, []).append(r)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_gini_impurity_known_values(spark):
    from weather_data_ingestion_service_spark.operators.aggregates import (
        gini_impurity,
    )

    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"),  # 50/50
         ("g2", "a"), ("g2", "a"), ("g2", "a")],              # pure
        "g string, c string",
    )
    out = {r.g: (r.n_rows, r.gini)
           for r in gini_impurity(df, ["g"], "c", ["a", "b"]).collect()}
    assert out["g1"] == (4, 0.5)
    assert out["g2"] == (3, 0.0)


def test_pca_project_matches_numpy_and_is_orthonormal(spark, sf_dir):
    """Distributed partials must reproduce single-node PCA: projection
    equals (X - mean) @ top-k eigenvectors (up to sign, which the
    convention pins), components orthonormal, variance descending."""
    import numpy as np

    from weather_data_ingestion_service_spark.ext.simsearch import pca_project
    from weather_data_ingestion_service_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.orderBy("vec_id").collect()
    X = np.asarray([r.embedding for r in rows], dtype=np.float64)
    got = {
        r.vec_id: np.asarray(r.pca)
        for r in pca_project(emb, "vec_id", "embedding", k=4).collect()
    }
    P = np.stack([got[r.vec_id] for r in rows])

    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    W = vecs[:, order]
    flip = np.sign(W[np.abs(W).argmax(axis=0), np.arange(4)])
    want = (X - mu) @ (W * flip)
    assert np.allclose(P, want, atol=1e-8)
    # projected variance is descending
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))


def test_approx_quantile_within_rank_error_of_exact(spark, sf_dir):
    """GK sketch rank error is bounded by 1/accuracy; at accuracy=1000
    on the fixture the approximate p50/p90 must sit within a small
    rank window of the exact order statistic."""
    from pyspark.sql import functions as F

    from weather_data_ingestion_service_spark import registry
    from weather_data_ingestion_service_spark.io import load_table

    approx = {
        r.event_type: r
        for r in registry.queries()["agg_approx_quantile"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    for etype, row in approx.items():
        vals = sorted(
            x.value for x in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        for p, got in ((0.5, row.p50_approx), (0.9, row.p90_approx)):
            # value must lie within +-1% of n around the exact rank
            lo = vals[max(0, int(n * (p - 0.01)) - 1)]
            hi = vals[min(n - 1, int(n * (p + 0.01)))]
            assert lo <= got <= hi, (etype, p, got, lo, hi)
