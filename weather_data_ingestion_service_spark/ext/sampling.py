"""Deterministic sampling / splitting for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent —
rerunning on a repartitioned table yields a different sample, which is
poison for reproducible training sets.  Everything here keys the
decision on a **content hash of the row id** (md5 of its decimal
string), so membership is a pure function of the row: stable across
runs, partitionings, engines, and cluster sizes, and cheap (one hash
per row, no shuffle for the Bernoulli forms).

The reference has no sampling surface; these are mandated
training-pipeline extensions (BASELINE.json north star) in the same
spirit as its "readily usable in downstream ML pipelines" framing
(reference README.md:18).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _id_hash(id_col: str) -> F.Column:
    """Lowercase hex md5 of the id's decimal string — identical bytes
    in any engine (DuckDB: ``md5(CAST(id AS VARCHAR))``)."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def hash_sample(df: DataFrame, id_col: str, threshold_hex: str) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose id-hash sorts
    below ``threshold_hex`` (e.g. ``"1a"`` ≈ 26/256 ≈ 10.2%).

    Narrow (no shuffle): the filter pipelines into the scan, so at
    100 TB it is a single pass that prunes before anything wide runs.
    """
    return df.filter(_id_hash(id_col) < F.lit(threshold_hex))


def hash_split(
    df: DataFrame,
    id_col: str,
    bounds_hex: Sequence[tuple[str, str]] = (("train", "cc"), ("val", "e6")),
    last_label: str = "test",
) -> DataFrame:
    """Deterministic train/val/test assignment by id-hash range:
    hash < bounds[0] → first label, < bounds[1] → second, … else
    ``last_label``.  Defaults ≈ 80/10/10.  Narrow, reproducible — a
    document keeps its split forever, even as the corpus grows (the
    property that prevents train/test leakage across dataset versions).
    """
    h = _id_hash(id_col)
    expr = F.lit(last_label)
    for label, bound in reversed(list(bounds_hex)):
        expr = F.when(h < F.lit(bound), F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_topk(
    df: DataFrame, strata_col: str, id_col: str, k: int
) -> DataFrame:
    """Exactly-k-per-stratum sample: rank rows within each stratum by
    id-hash (a deterministic uniform order) and keep the first ``k``.

    One shuffle on the stratum key.  Skew posture: strata counts are
    typically few and bounded (languages, sources); the per-stratum
    sort is a top-k heap under ``row_number`` + filter, not a full
    sort, once AQE sees the limit-like filter.
    """
    w = Window.partitionBy(strata_col).orderBy(_id_hash(id_col), id_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _id_hash_int(id_col: str) -> F.Column:
    """First 15 hex digits of the id-hash as a BIGINT (60 uniform
    bits) — DuckDB: ``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)``."""
    return F.conv(F.substring(_id_hash(id_col), 1, 15), 16, 10).cast("long")


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col, k: int
) -> DataFrame:
    """Deterministic weight-biased sample: each row gets priority
    ``hash_int / weight`` and the global ``k`` lowest priorities win —
    doubling a row's weight halves its priority, so heavy rows are
    proportionally favored, yet membership stays a pure function of
    (id, weight): stable across runs, partitionings and engines.

    Priority is one IEEE double division on identical inputs
    (bit-identical cross-engine); the global top-k compiles to
    TakeOrderedAndProject — per-partition heaps, only ``k`` rows per
    partition move to the driver-side merge, no full sort at 100 TB.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pri = (_id_hash_int(id_col) / w).alias("priority")
    return df.withColumn("priority", pri).orderBy("priority", id_col).limit(k)


def balanced_sample(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Domain-balanced downsample: every group keeps exactly
    min-group-size rows, chosen by the deterministic id-hash order —
    the "equalize the mixture" step of multi-source training-data
    pipelines (no domain dominates the batch stream), reproducible
    across runs and engines.

    Cost shape: one tiny hash-agg for group sizes (rows = |groups|,
    reduced to a single min and broadcast back — no driver collect),
    plus one window on the group key.  Skew posture matches
    ``stratified_topk``: group count is small and bounded (sources,
    languages), and the per-group ordering prunes to a streaming
    row_number, not a sort of the corpus.
    """
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    floor_df = sizes.agg(F.min("__cnt").alias("__m"))
    w = Window.partitionBy(group_col).orderBy(_id_hash(id_col), id_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(floor_df))
        .filter(F.col("rn") <= F.col("__m"))
        .drop("__m")
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int, n_shards: int = 8
) -> DataFrame:
    """Deterministic training-order for one epoch: every row gets a
    position in a pseudo-random permutation keyed ONLY on
    ``(id, epoch)`` — rerunning the epoch anywhere reproduces the
    exact order, and each epoch is an independent reshuffle (the
    property data loaders need for resumable multi-epoch training).

    The permutation is shard-major: rows hash into ``n_shards``
    streams and rank within their stream, so no single task ever sorts
    the whole corpus; a loader consumes shards in id order for the
    global order ``(shard, shuffle_rank)``.  One shuffle on the shard
    key; ranking is one ordered window pass per shard.
    """
    h = F.md5(
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"), F.lit(str(epoch))
        ).cast("binary")
    )
    shard = (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % n_shards
    ).alias("shard")
    out = df.withColumn("_eh", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("_eh", id_col)
    return (
        out.withColumn("shuffle_rank", F.row_number().over(w).cast("long"))
        .drop("_eh")
    )


def _id_hash_u52(id_col: str) -> F.Column:
    """First 13 hex digits of the id-hash as a BIGINT: 52 uniform bits,
    chosen because 2^52 < 2^53 — the value round-trips EXACTLY through
    an IEEE double, so a ``hash < rate * 2^52`` comparison cannot
    diverge between engines that compare int-vs-float via a double
    cast (DuckDB: ``CAST('0x' || substr(md5(...), 1, 13) AS BIGINT)``)."""
    return F.conv(F.substring(_id_hash(id_col), 1, 13), 16, 10).cast("long")


def shard_assign(df: DataFrame, id_col: str, n_shards: int = 16) -> DataFrame:
    """Deterministic output sharding: every row lands in shard
    ``id_hash52 % n_shards`` — the writer-side partitioning of a
    training corpus into fixed output files/webdataset tars.

    A pure function of the id (stable across runs/engines/cluster
    sizes, unlike ``spark.write``'s task-dependent file split), narrow
    (no shuffle — at 100 TB follow with
    ``repartition(n_shards, "shard")`` only when the sink needs
    physical co-location).  Modulo on 52 uniform bits: shard-size skew
    from the bias is < 2^-40.
    """
    return df.withColumn(
        "shard", (_id_hash_u52(id_col) % n_shards).cast("long")
    )


def interleave_sources(
    df: DataFrame, source_col: str, id_col: str
) -> DataFrame:
    """Deterministic multi-source interleaving: global training-stream
    position ``mix_pos`` such that consuming rows in ``mix_pos`` order
    round-robins across sources (position ``(rank_in_source - 1) *
    n_sources + source_index - 1``) with a deterministic id-hash order
    inside each source — the "mix the domains evenly" step of a
    multi-corpus loader, reproducible anywhere.

    Cost shape: one window on the source key (per-source streaming
    row_number), a distinct over sources (tiny — domains, not rows)
    ranked on the driver-sized side and broadcast back, and a
    broadcast of the single-row source count.  No corpus-wide sort:
    the loader ORDER BY mix_pos is the consumer's concern (or a
    ``shard_assign`` + per-shard order at scale).
    """
    w_src = Window.partitionBy(source_col).orderBy(_id_hash(id_col), id_col)
    # tiny dim: deterministic 1-based source index (|sources| rows —
    # the unpartitioned window is fine because only domains flow in)
    src_dim = (
        df.select(source_col).distinct()
        .withColumn(
            "__src_idx",
            F.row_number().over(Window.orderBy(source_col)).cast("long"),
        )
    )
    n_src = src_dim.agg(F.count(F.lit(1)).alias("__n_src"))
    ranked = df.withColumn("__rn", F.row_number().over(w_src).cast("long"))
    return (
        ranked.join(F.broadcast(src_dim), source_col)
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "mix_pos",
            (F.col("__rn") - 1) * F.col("__n_src") + F.col("__src_idx") - 1,
        )
        .drop("__rn", "__src_idx", "__n_src")
    )


def temperature_sample(
    df: DataFrame, group_col: str, id_col: str
) -> DataFrame:
    """Temperature-based mixture resampling at α = 0.5 — the standard
    rebalancing for skewed multi-domain / multilingual corpora (mT5 /
    XLM-R style): post-sample domain counts are ∝ n_d^α, boosting tail
    domains' share without equalizing outright.

    Per-domain keep rate ``r_d = sqrt(n_min / n_d)`` (≤ 1, = 1 for the
    smallest domain); membership is the deterministic id-hash Bernoulli
    ``hash52 < r_d * 2^52``.  α is fixed at 0.5 because that exponent
    is ``sqrt`` — correctly rounded in IEEE 754, so both engines
    compute the identical threshold double (a general ``pow(x, α)`` has
    no such guarantee); the 2^52 scale is a power of two (exact) and
    52-bit hashes fit a double exactly.  Membership is a pure function
    of (id, domain counts): stable across runs, partitionings, engines.

    Cost shape: one tiny hash-agg for domain sizes (broadcast back),
    then a narrow filter — no shuffle of the corpus.
    """
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_d"))
    floor_df = sizes.agg(F.min("__n_d").alias("__n_min"))
    rate = F.sqrt(F.col("__n_min").cast("double") / F.col("__n_d"))
    return (
        df.join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(floor_df))
        .filter(_id_hash_u52(id_col) < rate * F.lit(4503599627370496.0))
        .drop("__n_d", "__n_min")
    )


def capped_duplicates(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
    cap: int = 2,
) -> DataFrame:
    """Frequency-capped duplicate downsampling — the soft-dedup
    between 'keep everything' and 'keep one': at most ``cap`` copies
    of each exact content survive, chosen deterministically by id-hash
    order (so membership is reproducible and partitioning-independent,
    like every sampler here).  Adds ``copy_rank`` (1-based) and
    ``n_copies``; one window over the content partition, no self-join.

    The Gopher/C4 rationale: a document duplicated 10 000× would
    otherwise claim 10 000× the training-mix weight; capping bounds
    that without deleting the duplication signal entirely."""
    w = Window.partitionBy(*content_cols).orderBy(_id_hash(id_col), F.col(id_col))
    r = df.withColumn(
        "copy_rank", F.row_number().over(w).cast("int")
    ).withColumn(
        "n_copies",
        F.count(F.lit(1)).over(Window.partitionBy(*content_cols)).cast("long"),
    )
    return r.filter(F.col("copy_rank") <= cap)


def dense_index_by_key(
    df: DataFrame, key_col: str, out_col: str = "idx", n_partitions: int | None = None
) -> DataFrame:
    """Dense 0-based index in global ``key_col`` order — the
    distributed zipWithIndex: range-partition on the key, sort within
    partitions, collect ONE row per partition (its count — bounded by
    the partition count, never the data), then a second cached pass
    adds ``partition offset + local position``.

    This is the scale path for "rank every row by key": a global
    ``row_number()`` window moves the entire dataset through a single
    partition, which is exactly the plan that dies first at 100 TB.
    The partitioned frame is persisted so both passes see the SAME
    physical partitioning (a re-executed RangePartitioner could
    re-sample different bounds).

    Output indices are identical to
    ``row_number().over(Window.orderBy(key)) - 1`` for unique keys
    (equivalence pinned by pytest).

    The partitioned frame is frozen with ``localCheckpoint(eager=True)``
    rather than ``persist()``: correctness REQUIRES that both passes see
    the same physical partitioning (a re-executed RangePartitioner could
    re-sample different bounds), and a checkpoint can never be evicted
    or recomputed the way a cache entry can; it also lives outside the
    cache manager, so it can't be substituted into later matching plans
    or pinned past the caller's lifetime — blocks free on GC (ADVICE
    r5 cache-accumulation fix).  On a real cluster a lost executor loses
    its local-checkpoint blocks; a job-critical pipeline would point
    ``spark.checkpoint.dir`` at durable storage and use ``checkpoint()``
    for this barrier instead.
    """
    import pandas as pd

    from pyspark import TaskContext

    spark = df.sparkSession
    n_parts = n_partitions or max(df.rdd.getNumPartitions(), 2)
    part = (
        df.repartitionByRange(n_parts, F.col(key_col))
        .sortWithinPartitions(key_col)
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["n"]
        for r in part.groupBy(
            F.spark_partition_id().alias("pid")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def add_index(batches):
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.RangeIndex(base + seen, base + seen + len(pdf)).astype("int64")
            seen += len(pdf)
            yield pdf

    return part.mapInPandas(add_index, out_schema)


def preference_pairs(
    scored: DataFrame,
    group_cols: Sequence[str],
    score_col: str = "score",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Chosen/rejected preference-pair mining: within each group, pair
    the i-th best row with the i-th worst (i <= k), guarded by
    2i <= n so the sides never alias.  MIRRORED deterministic
    tie-breaks (score DESC, id ASC vs score ASC, id DESC) make the
    worst-ranking the exact reverse of the best-ranking — the pairing
    is a pure total-order fold, identical on any engine.  ONE
    row_number window (rank-from-bottom is derived, not re-sorted:
    under the mirrored strict total order the worst-ranking is exactly
    the reverse of the best-ranking, so rw = n + 1 - rb) plus a
    self-join keyed by (group, rank) touching <= k rows per side per
    group."""
    g = Window.partitionBy(*group_cols)
    r = scored.select(
        *group_cols, id_col, score_col,
        F.row_number()
        .over(g.orderBy(F.col(score_col).desc(), F.col(id_col).asc()))
        .alias("rb"),
        F.count(F.lit(1)).over(g).alias("n"),
    )
    b = r.filter((F.col("rb") <= k) & (2 * F.col("rb") <= F.col("n"))).select(
        *group_cols, "rb",
        F.col(id_col).alias("chosen_id"),
        F.col(score_col).alias("score_b"),
    )
    w_ = r.select(
        *[F.col(c).alias(f"{c}_w") for c in group_cols],
        (F.col("n") + 1 - F.col("rb")).alias("rw"),
        F.col(id_col).alias("rejected_id"),
        F.col(score_col).alias("score_w"),
    )
    cond = F.col("rb") == F.col("rw")
    for c in group_cols:
        cond = cond & (F.col(c) == F.col(f"{c}_w"))
    return (
        b.join(w_, cond)
        .select(
            *group_cols,
            F.col("rb").cast("long").alias("pair_rank"),
            "chosen_id", "rejected_id",
            (F.col("score_b") - F.col("score_w")).cast("long").alias("score_gap"),
        )
        .orderBy(*group_cols, "pair_rank")
    )
