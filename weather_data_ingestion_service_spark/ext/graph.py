"""Graph analytics over similarity/duplicate graphs: degree
statistics and an integer-state PageRank.

Graphs here are edge DataFrames (id_a, id_b) produced by the dedup /
k-NN operators; the analytics follow the same iterative-Spark rules as
``dedup.dedup_clusters`` (per-round persist, lineage checkpoints, one
scalar job per round at most, never a driver-side edge list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: driver-PageRank ceiling, same rationale as dedup._DRIVER_CC_MAX_PAIRS:
#: 2M (long, long) pairs ≈ 32 MB — below it, ten per-round Spark jobs
#: cost more in scheduling than the whole integer iteration does in
#: CPU, and the integer state makes the two paths bit-identical.
_DRIVER_PR_MAX_PAIRS = 2_000_000


def degree_stats(pairs: DataFrame) -> DataFrame:
    """Per-node degree over an undirected pair list (id_a, id_b) —
    the basic graph health check (duplicate-family sizes, near-dup
    hubs).  Edges are CANONICALIZED first (least/greatest + distinct),
    so a list containing both (a,b) and (b,a), duplicates, or a
    directed k-NN output (``knn_graph``'s (id, neighbor) rows) all
    yield the same undirected degree."""
    canon = pairs.select(
        F.least("id_a", "id_b").alias("lo"),
        F.greatest("id_a", "id_b").alias("hi"),
    ).distinct()
    ends = canon.select(
        F.explode(F.array(F.col("lo"), F.col("hi"))).alias("id")
    )
    return ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))


def pagerank_int(
    pairs: DataFrame,
    n_iter: int = 10,
    damping_micro: int = 850_000,
    unit: int = 1_000_000_000,
    driver_max_pairs: int = _DRIVER_PR_MAX_PAIRS,
) -> DataFrame:
    """PageRank with EXACT INTEGER state: ranks are maintained in
    ``unit``-ths (default 1e-9 units) and every update is integer
    arithmetic — ``next = (1-d)·unit/N + d·Σ floor(rank(u)/deg(u))``
    with the damping factor in micro-units.  Integer sums are
    associative, so the result is a PURE FUNCTION of (graph, n_iter):
    identical across partitionings, cluster sizes and engines — the
    property float PageRank loses to summation order.  (Truncation
    leaks ≤ deg(u) units per node per round — bounded, deterministic,
    and irrelevant at 1e-9 resolution.)

    Scale shape: edges are exploded to both directions once,
    pre-partitioned on ``src`` and persisted; each round is ONE join +
    hash-agg on (long, long) rows with no driver collect; lineage is
    checkpointed every 4 rounds.  Isolated nodes don't exist in a pair
    graph (every node has ≥1 edge), and every node has out-degree ≥1,
    so no dangling mass arises; the truncation leak is NOT
    redistributed — total mass decays by the (bounded) leak, which is
    the deterministic trade.

    Size-adaptive (same strategy as ``dedup.dedup_clusters``): the
    pair table is persisted and measured; at or under
    ``driver_max_pairs`` the iteration runs on the driver over the
    collected edge list — EXACT integer arithmetic makes the driver
    and distributed paths bit-identical, so the switch is invisible in
    the result — and only above it does the per-round join loop run.

    Non-integral id types (string keys) are remapped through a dense
    integer index in id order and mapped back on output — a bare
    ``cast("long")`` would NULL them out and corrupt the edge set
    (ADVICE r5; same rule as ``dedup.dedup_clusters``).
    """
    from .dedup import _integral_dtypes

    if not _integral_dtypes(pairs, "id_a", "id_b"):
        from .sampling import dense_index_by_key

        ids = (
            pairs.select(F.col("id_a").alias("__orig"))
            .union(pairs.select(F.col("id_b").alias("__orig")))
            .distinct()
        )
        idx = dense_index_by_key(ids, "__orig", "__ix")
        int_pairs = (
            pairs.join(
                idx.select(
                    F.col("__orig").alias("id_a"), F.col("__ix").alias("__ix_a")
                ),
                "id_a",
            )
            .join(
                idx.select(
                    F.col("__orig").alias("id_b"), F.col("__ix").alias("__ix_b")
                ),
                "id_b",
            )
            .select(
                F.col("__ix_a").alias("id_a"), F.col("__ix_b").alias("id_b")
            )
        )
        out = pagerank_int(
            int_pairs, n_iter, damping_micro, unit, driver_max_pairs
        )
        return out.join(
            idx.select(F.col("__ix").alias("id"), "__orig"), "id"
        ).select(F.col("__orig").alias("id"), "rank_nano")
    pair_tbl = pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    ).persist()
    n_pairs = pair_tbl.count()
    if n_pairs <= driver_max_pairs:
        adj: dict[int, set] = {}
        for a, b in pair_tbl.collect():
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        pair_tbl.unpersist()
        spark = pairs.sparkSession
        n_nodes = len(adj)
        if n_nodes == 0:
            from ..io import local_frame

            return local_frame(spark, [], "id long, rank_nano long")
        teleport = (unit - damping_micro * unit // 1_000_000) // n_nodes
        deg = {u: len(vs) for u, vs in adj.items()}
        rank = {u: unit // n_nodes for u in adj}
        for _ in range(n_iter):
            contrib = {u: rank[u] // deg[u] for u in adj}
            rank = {
                v: teleport
                + sum(contrib[u] for u in adj[v]) * damping_micro // 1_000_000
                for v in adj
            }
        from ..io import local_frame

        return local_frame(
            spark, sorted(rank.items()), "id long, rank_nano long"
        )
    edges = (
        pair_tbl.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .repartition("src")
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = edges.join(deg, "src").persist()
    out_edges.count()
    edges.unpersist()
    pair_tbl.unpersist()

    # node set and initial ranks derive from the CACHED out_edges —
    # deriving them from `deg` would re-execute the whole upstream
    # pair pipeline (candidate join and all) once per materialization
    nodes = out_edges.select(F.col("src").alias("id")).distinct().persist()
    n_nodes = nodes.count()
    teleport = (unit - damping_micro * unit // 1_000_000) // max(n_nodes, 1)

    ranks = nodes.select(
        "id",
        F.lit(unit // max(n_nodes, 1)).cast("long").alias("rank"),
    ).persist()
    ranks.count()
    nodes.unpersist()
    for it in range(n_iter):
        contrib = (
            out_edges.join(ranks, out_edges.src == ranks.id)
            .select(
                F.col("dst").alias("id"),
                F.expr("CAST(rank DIV deg AS BIGINT)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast("long").alias("in_sum"))
        )
        new_ranks = contrib.select(
            "id",
            (
                F.lit(teleport)
                + F.expr(f"CAST(in_sum * {damping_micro} DIV 1000000 AS BIGINT)")
            )
            .cast("long")
            .alias("rank"),
        )
        if it % 4 == 3:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    out_edges.unpersist()
    return ranks.select("id", F.col("rank").alias("rank_nano"))
