"""Round-10 registry additions.

Headline item (VERDICT r9 #2): the IVF-PQ index LIFECYCLE — build
once, query many.  The green round-9 registry shape re-encodes the
corpus inside every query (encoding-dominated: BASELINE.md round-9
note (2) measured ~12.7 s of encode at 128k vectors on both paths);
a real 100 TB user materializes codes + codebook once and serves
queries from the persisted index.  Two entries split exactly there:
``ext_simsearch_index_build`` persists the index (codes PARTITIONED
BY coarse list id — the inverted-list file layout) and hash-verifies
WHAT WAS WRITTEN via a per-list manifest read back from parquet;
``ext_simsearch_index_query`` answers top-k from the persisted index
with no corpus scan, a statically partition-pruned codes read, and
the same fixed-order ADC chain (oracle: the round-9 IVF-PQ SQL
verbatim — the lifecycle split must not change a single score).

Cross-engine compare rules are documented at the top of registry.py —
exact integer arithmetic, no float folds, deterministic tie-breaks,
scalar output columns only.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .io import load_table
from .registry import (
    _clean_stale_scratch,
    _register_new_this_round,
    _session_tag,
    register,
)

# =====================================================================
# A. IVF-PQ index lifecycle: build once / query many (VERDICT r9 #2)
# =====================================================================


def _ivfpq_index_path(spark, sf_dir: str) -> str:
    """Session-unique index location (registry.py shared recipe):
    concurrent sessions at the same SF must not race each other's
    overwrite-then-read; dead sessions' copies are age-swept."""
    _clean_stale_scratch("/tmp/wds_ivfpq_idx_*")
    return f"/tmp/wds_ivfpq_idx_{_session_tag(spark, sf_dir)}"


def _ensure_ivfpq_index(spark, sf_dir: str) -> str:
    """Lazy build: the query entry must not depend on the build entry
    having run first (the driver checks a rotating window, in any
    order) — but when it HAS run, the query amortizes the encode."""
    path = _ivfpq_index_path(spark, sf_dir)
    if not os.path.exists(os.path.join(path, "codes", "_SUCCESS")):
        from .ext.simsearch import ivfpq_build_index

        emb = load_table(spark, sf_dir, "embeddings")
        ivfpq_build_index(emb, path)
    return path


def _ivfpq_index_manifest_oracle(m=8, sub=8, n_cent=16):
    from .registry_ext import _COSINE_SQL

    cos_assign = _COSINE_SQL.format(a="e.embedding", b="c.ce")
    l2 = f"""list_sum(list_transform(
               list_zip(e.embedding[(rs.s * {sub} + 1):(rs.s * {sub} + {sub})],
                        c.ce[(rs.s * {sub} + 1):(rs.s * {sub} + {sub})]),
               p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_cent}),
    assign AS (
      SELECT match_id, cid FROM (
        SELECT e.vec_id AS match_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_assign} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c)
      WHERE rn = 1),
    bestc AS (
      SELECT match_id, s, ccid FROM (
        SELECT e.vec_id AS match_id, rs.s, c.cid AS ccid,
               row_number() OVER (PARTITION BY e.vec_id, rs.s
                 ORDER BY {l2} ASC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cent c CROSS JOIN range(0, {m}) rs(s))
      WHERE rn = 1),
    csum AS (
      SELECT match_id, sum(ccid) AS code_sum FROM bestc GROUP BY match_id)
    SELECT a.cid,
           CAST(count(*) AS BIGINT) AS n_codes,
           CAST(sum(a.match_id) AS BIGINT) AS match_sum,
           CAST(sum(cs.code_sum) AS BIGINT) AS code_sum
    FROM assign a JOIN csum cs USING (match_id)
    GROUP BY a.cid ORDER BY a.cid
    """


@register("ext_simsearch_index_build", _ivfpq_index_manifest_oracle())
def q_ext_simsearch_index_build(spark, sf_dir):
    """BUILD half of the IVF-PQ index lifecycle: one corpus pass
    encodes integer codes (coarse list id + m per-subspace codebook
    ids — the ~4-byte/vector form, vs the slice-carrying inline
    aggregate), written PARTITIONED BY the coarse id so a probed query
    prunes its scan to nprobe list directories at the parquet layer.
    The published result is the per-list index MANIFEST — row count,
    member-id sum, code-id sum — read BACK from the persisted files
    (the sink_partitioned_scan / obs_manifest pattern: the oracle
    verifies what landed on disk, not what the plan intended), and the
    DuckDB oracle re-derives every code from the embeddings table
    under the same (cos DESC, −cid) / (l2 ASC, cid ASC) total orders.
    At 100 TB the build is one broadcast-codebook pass + a partitioned
    write; nothing corpus-sized shuffles except the write itself."""
    from .ext.simsearch import ivfpq_build_index

    path = _ivfpq_index_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    ivfpq_build_index(emb, path)
    back = spark.read.parquet(path + "/codes")
    code_sum = F.col("c0")
    for s in range(1, 8):
        code_sum = code_sum + F.col(f"c{s}")
    return (
        back.withColumn("cid", F.col("cid").cast("long"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_codes"),
            F.sum("match_id").cast("long").alias("match_sum"),
            F.sum(code_sum).cast("long").alias("code_sum"),
        )
        .orderBy("cid")
    )


def _ivfpq_query_oracle():
    from .registry_r9 import _ivfpq_md5_oracle

    # the round-9 inline IVF-PQ SQL VERBATIM: the lifecycle split
    # (persisted codes + literal-map decode) must not change a score
    return _ivfpq_md5_oracle()


@register("ext_simsearch_index_query", _ivfpq_query_oracle())
def q_ext_simsearch_index_query(spark, sf_dir):
    """QUERY half of the IVF-PQ index lifecycle: top-3 from the
    PERSISTED index — no corpus scan, no re-encode.  The codebook
    (16 rows) loads and broadcasts for the probe stage; the probed
    list ids (|Q|·nprobe ints) become a static partition filter on the
    codes scan (plan-visible PartitionFilters — tests/test_plans.py
    pins it); codes decode through driver-built literal lookup maps
    cid → centroid slice, so the fixed-order ADC chain is
    bit-identical to the inline twin and the oracle is the round-9
    IVF-PQ SQL verbatim.  Built lazily if absent (driver order
    independence); after ``ext_simsearch_index_build`` has run — as in
    bench.py, where it precedes this entry — the encode is fully
    amortized and this row shows the true per-query serving cost."""
    from .ext.simsearch import ivfpq_query_index

    path = _ensure_ivfpq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivfpq_query_index(
        spark,
        path,
        emb.filter(F.col("vec_id") < 5),
        "vec_id",
        "embedding",
        k=3,
        nprobe=4,
        m=8,
    )
    return out.withColumn("adc", F.round("adc", 3))


_register_new_this_round(
    "ext_simsearch_index_build",
    "ext_simsearch_index_query",
)
