"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale posture: exact dedup is one hash aggregation (map-side
combinable).  Near-dup never compares all pairs — every variant
generates candidates by equality on some derived key (shingle, LSH
band bucket, SimHash band) so the quadratic blowup is limited to
within-bucket pairs; the exact/verification predicate then prunes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


def dedup_exact(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """Exact duplicate removal keyed on ``keys``; keeps the lowest id
    (deterministic, unlike ``dropDuplicates`` whose survivor is
    partition-order dependent) and reports the multiplicity.

    One hash aggregation — at 100 TB the shuffle carries only the
    (key-hash → min id, count) pairs after partial aggregation.
    """
    return df.groupBy(*keys).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def word_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Add ``shingles``: distinct word n-grams of the text.

    Pure built-ins (split / sequence / transform / slice) — stays in
    whole-stage codegen, no Python.
    """
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return df.withColumn("shingles", F.array_distinct(sh))


def hashed_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Add ``sh``: distinct int64 hashes of the word n-grams of the text,
    built by *hash composition* — each token is xxhash64'd once, then a
    shingle hash is ``xxhash64(h_i, h_{i+1}, …, h_{i+n-1})`` over the
    token hashes.  Equivalent as a set to hashing the joined n-gram
    string (both injective up to 2^-64 collisions) but ~6× faster:
    no per-position array slice / string concat, and ``array_distinct``
    runs on primitive longs instead of strings.

    ``try_element_at`` (not ``element_at``) so documents shorter than
    ``n`` tokens yield one shingle over the available tokens instead of
    an ANSI out-of-bounds error — xxhash64 skips null inputs, matching
    the string path's single truncated shingle.
    """
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    th = F.transform(tokens, lambda t: F.xxhash64(t))
    df = df.withColumn("_th", th)
    idx = F.sequence(F.lit(1), F.greatest(F.size("_th") - (n - 1), F.lit(1)))
    sh = F.transform(
        idx,
        lambda i: F.xxhash64(
            *[F.try_element_at(F.col("_th"), i + k) for k in range(n)]
        ),
    )
    return df.withColumn("sh", F.array_distinct(sh)).drop("_th")


#: vocabulary-broadcast ceiling for the rank join's document-frequency
#: table: 8M (shingle, count) rows ≈ 128 MB of packed int64 pairs —
#: well under Spark's 8 GB broadcast-table hard limit and a few percent
#: of a typical executor heap once deserialized per executor.  Past it,
#: per-executor copies stop being cheaper than one shuffled join.
_VOCAB_BROADCAST_MAX_ROWS = 8_000_000


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs over word n-gram shingle sets,
    with **prefix filtering** (Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07) for candidate generation.

    A pair with ``J ≥ t`` must share a shingle within each side's
    *prefix* — the first ``|X| - ⌈t·|X|⌉ + 1`` shingles under a global
    rarest-first order — so the self-join runs over prefixes of the
    globally rarest shingles instead of all shingles.  That removes
    the quadratic blow-up of hot shingles (with a shared small
    vocabulary, a plain shared-shingle join degenerates to all-pairs;
    hot shingles almost never appear in a prefix).  Candidates are
    then verified exactly with ``array_intersect`` on the full
    (distinct) shingle arrays — output identical to the naive join.

    Two scale decisions beyond the prefix filter: (a) shingles are
    hashed to int64 (``xxhash64``) immediately — frequency counting,
    ranking, the self-join and the verify arrays all move 8-byte longs
    instead of ~20-byte strings (the 2^-64 collision probability is
    far below any operational concern); (b) the shingle table feeds
    four plan branches, so it is persisted — without it Spark
    recomputes tokenization+shingling per branch, which dominated
    wall-clock 3:1 in profiling.
    """
    sh = (
        hashed_shingles(df.select(id_col, text_col), text_col, n)
        .select(id_col, "sh")
        .persist()
    )
    ex = sh.select(
        id_col, F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    # broadcast_vocab: the document-frequency table is (distinct-shingle
    # → count), compact int64 pairs; broadcasting it turns the rank join
    # into a map-side hash join, removing a full exchange of the exploded
    # shingle table (2× measured).  Right while the vocabulary fits on
    # one node (Heaps'-law sublinear growth).  Default None = AUTO:
    # persist freq (the rank join reads it from cache, so the sizing
    # count just front-loads work the plan does anyway) and broadcast
    # only while the vocabulary stays under _VOCAB_BROADCAST_MAX_ROWS —
    # at 100 TB corpus scale the measured count, not a caller guess,
    # picks the shuffled fallback.
    if broadcast_vocab is None:
        freq = freq.persist()
        broadcast_vocab = freq.count() <= _VOCAB_BROADCAST_MAX_ROWS
    if broadcast_vocab:
        freq = F.broadcast(freq)
    # rarest-first global order; tie-break on the shingle hash
    w = Window.partitionBy(id_col).orderBy("df_", "shingle")
    ranked = ex.join(freq, "shingle").withColumn("pos", F.row_number().over(w))
    prefix_len = F.col("n_sh") - F.ceil(F.col("n_sh") * threshold) + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        id_col, "n_sh", "pos", "shingle"
    )

    a = prefix.select(
        F.col(id_col).alias("id_a"),
        F.col("n_sh").alias("n_a"),
        F.col("pos").alias("p_a"),
        "shingle",
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"),
        F.col("n_sh").alias("n_b"),
        F.col("pos").alias("p_b"),
        "shingle",
    )
    # two pre-verify prunes (Bayardo et al. / ppjoin, Xiao et al.
    # "Efficient Similarity Joins for Near Duplicate Detection"):
    # - size filter: J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|);
    # - positional filter: a match at prefix positions (p_a, p_b) caps
    #   the achievable overlap at min(n_a-p_a, n_b-p_b) + 1, which must
    #   reach the overlap equivalent of the Jaccard threshold,
    #   ⌈t/(1+t)·(n_a+n_b)⌉.  Filtering per-match is exact: a true pair
    #   always survives through its earliest common prefix shingle
    #   (the loosest bound), and dropDuplicates keeps any survivor.
    #   Measured 2.5× candidate reduction at sf0.1.
    min_overlap = F.ceil(
        (F.col("n_a") + F.col("n_b")) * (threshold / (1.0 + threshold))
    )
    ubound = (
        F.least(F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")) + 1
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("n_a", "n_b")
                >= F.greatest("n_a", "n_b") * threshold
            )
            & (ubound >= min_overlap)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # suffix filtering before the full-array verify (Xiao et al.,
    # "Efficient Similarity Joins for Near Duplicate Detection" §4.3,
    # depth-1, recast set-wise): attach only the FIRST HALF of each
    # side's value-sorted shingle array plus its boundary value, and
    # bound the achievable overlap exactly —
    #   every common element BELOW c = min(cut_a, cut_b) lies inside
    #   both halves (v < cut_x ⇒ v ranks below h_x in x), and the
    #   common elements AT/ABOVE c number at most n_x − h_x + 1 on the
    #   min-cut side x — so
    #   overlap ≤ |H_a ∩ H_b| + (n_x − h_x) + 1.
    # Candidates whose bound misses the Jaccard-equivalent overlap
    # ⌈t/(1+t)·(n_a+n_b)⌉ are pruned BEFORE the full arrays are
    # attached: the pruned-candidate shuffle moves half the bytes and
    # the survivors (measured 140,916 → ~1k at sf0.1, t=0.5) attach
    # full arrays at truth-set size.  The bound never prunes a true
    # pair (it upper-bounds the overlap), so the output is identical.
    ss = F.array_sort("sh")
    half_len = F.expr("(size(sh) + 1) DIV 2")
    halves = sh.select(
        F.col(id_col).alias("_hid"),
        F.size("sh").alias("_hn"),
        F.slice(ss, 1, half_len).alias("_hh"),
    ).select(
        "_hid", "_hn", "_hh", F.element_at("_hh", -1).alias("_hcut")
    )
    half_a = halves.select(
        F.col("_hid").alias("id_a"),
        F.col("_hn").alias("hn_a"),
        F.col("_hh").alias("hh_a"),
        F.col("_hcut").alias("cut_a"),
    )
    half_b = halves.select(
        F.col("_hid").alias("id_b"),
        F.col("_hn").alias("hn_b"),
        F.col("_hh").alias("hh_b"),
        F.col("_hcut").alias("cut_b"),
    )
    tail = (
        F.when(
            F.col("cut_a") <= F.col("cut_b"),
            F.col("hn_a") - F.size("hh_a"),
        ).otherwise(F.col("hn_b") - F.size("hh_b"))
        + 1
    )
    min_overlap2 = F.ceil(
        (F.col("hn_a") + F.col("hn_b")) * (threshold / (1.0 + threshold))
    )
    survivors = (
        cand.join(half_a, "id_a")
        .join(half_b, "id_b")
        .filter(
            F.size(F.array_intersect("hh_a", "hh_b")) + tail
            >= min_overlap2
        )
        .select("id_a", "id_b")
    )
    arr_a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    arr_b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        survivors.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidate pairs with MinHash-
    estimated Jaccard.

    shingle → per-shingle universal hashes (``xxhash64(shingle, seed)``)
    → per-doc min per seed (one hash-agg) → band signature = hash of
    ``rows_per_band`` consecutive minhashes → docs sharing any band
    bucket become candidates → estimate J as fraction of equal
    minhashes.  All built-ins; the only shuffles are the minhash
    aggregation and the band-bucket join, both on compact keys.
    Estimated Jaccard (not exact): pair with ``ngram_jaccard_pairs``
    semantics for a verification pass when exactness matters.
    """
    rows_per_band = num_hashes // bands
    # hash-composed int64 shingles (see hashed_shingles) — the
    # universal-hash family is derived by re-hashing the 8-byte shingle
    # hash per seed, far cheaper than re-hashing a ~20-byte string
    # num_hashes times.  The shingle table is persisted BEFORE the
    # explode: Generate re-evaluates its child expression per emitted
    # row, so exploding the uncached higher-order shingle expression
    # multiplies the tokenize+hash cost by the per-doc shingle count
    # (measured 9.9 s vs 0.5 s for the same arrays at sf0.1)
    sh_tbl = (
        hashed_shingles(df.select(id_col, text_col), text_col, n)
        .select(id_col, "sh")
        .persist()
    )
    sh = sh_tbl.select(id_col, F.explode("sh").alias("sh64"))
    hashed = sh.select(
        id_col,
        *[
            F.xxhash64(F.col("sh64"), F.lit(seed)).alias(f"h{seed}")
            for seed in range(num_hashes)
        ],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"h{seed}").alias(f"m{seed}") for seed in range(num_hashes)]
    )
    # persist the signature table: it feeds BOTH sides of the band
    # self-join plus the estimate join-back — without the cache the
    # whole shingle-explode + num_hashes×xxhash64 + groupBy pipeline
    # recomputes three times (measured 12.6 s → 4.1 s at sf0.1).  Size
    # is |corpus| × num_hashes longs — tiny next to the corpus.
    sig = (
        sig.withColumn(
            "sig", F.array(*[F.col(f"m{s}") for s in range(num_hashes)])
        )
        .select(id_col, "sig")
        .persist()
    )

    band_cols = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sig.withColumn("band", F.explode(band_cols))

    # band join and candidate dedup over NARROW (band, id) rows — the
    # two 32-long signature arrays would otherwise ride through the
    # join shuffle and the dropDuplicates exchange; they are joined
    # back once per deduped candidate instead
    a = banded.select(F.col(id_col).alias("id_a"), "band")
    b_ = banded.select(F.col(id_col).alias("id_b"), "band")
    cand = (
        a.join(b_, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .join(sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(num_hashes)
    )
    return (
        cand.withColumn("jaccard_est", est.cast("double"))
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def minhash_lsh_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold_micro: int = 400_000,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, fully md5-derived — the
    ORACLE-RESTATABLE twin of ``minhash_lsh_pairs`` (which rides on
    xxhash64, a function DuckDB lacks).

    Per-seed universal hash = first 13 hex digits of
    ``md5(f"{seed}:{gram}")`` as int64 (the repo's portable-hash
    convention); grams are DISTINCT word ``n``-grams (set semantics);
    a band key is the literal comma-joined 4-tuple of consecutive
    minima (no second-level hash — the tuple itself is the exact
    bucket id, restating trivially in SQL); the estimate is published
    in integer micro-units (``n_equal * 1e6 DIV num_hashes``), never a
    float ratio.  Same shuffle shape as the fast path: one gram-keyed
    aggregation + one band-bucket self-join, both on compact keys.
    Docs shorter than ``n`` tokens yield no gram and never pair —
    mirrored by the oracle's empty ``range``.
    """
    sig = md5_minhash_signatures(df, id_col, text_col, n, num_hashes).persist()
    banded = md5_minhash_bands(sig, id_col, num_hashes, bands)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "key")
    b_ = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    cand = (
        a.join(b_, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return md5_minhash_estimate(
        cand, sig, id_col, num_hashes, threshold_micro
    )


def md5_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig) MinHash signatures with md5-derived universal hashes
    over DISTINCT word n-grams — the oracle-restatable signature
    builder shared by the batch pairs op and the streaming
    incremental-dedup job (signatures are per-document, so they can be
    computed once at ingest and stored as state)."""
    tok = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    grams = (
        tok.select(
            F.col(id_col),
            F.concat_ws(
                " ",
                "tok",
                *[F.lead("tok", k).over(w) for k in range(1, n)],
            ).alias("gram"),
            F.lead("tok", n - 1).over(w).alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .dropDuplicates([id_col, "gram"])
    )

    def _h(seed):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{seed}:"), F.col("gram")).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")

    return (
        grams.groupBy(id_col)
        .agg(*[F.min(_h(s)).alias(f"m{s}") for s in range(num_hashes)])
        .withColumn(
            "sig", F.array(*[F.col(f"m{s}") for s in range(num_hashes)])
        )
        .select(id_col, "sig")
    )


def md5_minhash_bands(
    sig: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(id, band, key) LSH band rows: key = the literal comma-joined
    tuple of consecutive minima (the exact bucket id — no second-level
    hash to restate)."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast(
                            "string"
                        )
                        for r in range(rows_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def md5_minhash_estimate(
    cand: DataFrame,
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    threshold_micro: int = 400_000,
) -> DataFrame:
    """Join signatures back onto (id_a, id_b) candidates and keep
    pairs whose estimated Jaccard (integer micro-units) clears the
    threshold."""
    cand = cand.join(
        sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")),
        "id_a",
    ).join(
        sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")),
        "id_b",
    )
    n_equal = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        cand.withColumn("n_equal", n_equal.cast("int"))
        .withColumn(
            "jaccard_est_micro",
            F.expr(f"CAST(n_equal AS BIGINT) * 1000000 DIV {num_hashes}"),
        )
        .filter(F.col("jaccard_est_micro") >= threshold_micro)
        .select("id_a", "id_b", "n_equal", "jaccard_est_micro")
    )


#: driver-CC ceiling: collect the near-dup pair list to the driver and
#: run union-find while it stays under 2M (id_a, id_b) rows ≈ 32 MB of
#: longs — the "touched by a duplicate" edge set is normally a sliver
#: of the corpus, and for graphs this size a per-round Spark job costs
#: more in scheduling than the whole union-find does in CPU.  Past the
#: ceiling the distributed min-label loop below takes over, so the
#: driver never materializes an unbounded edge list.
_DRIVER_CC_MAX_PAIRS = 2_000_000

#: dtypes a bare cast("long") preserves exactly; anything else (string
#: keys, UUIDs, decimals) must go through the dense-index remap
_INTEGRAL_DTYPES = frozenset({"tinyint", "smallint", "int", "bigint"})


def _integral_dtypes(df: DataFrame, *cols: str) -> bool:
    types = dict(df.dtypes)
    return all(types[c] in _INTEGRAL_DTYPES for c in cols)


def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iter: int = 20,
    driver_cc_max_pairs: int = _DRIVER_CC_MAX_PAIRS,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a
    near-dup pair graph, each node labeled with the minimum id
    reachable from it (the cluster representative a pipeline keeps).

    Size-adaptive strategy, decided from the MEASURED pair count (the
    pair table is persisted either way — candidate generation is the
    expensive plan upstream, and both strategies would otherwise
    recompute it):

    - ``≤ driver_cc_max_pairs``: collect the (long, long) pair list and
      run path-compressing union-find on the driver — exact, one job,
      no per-round scheduling — then broadcast the label map back.
      ``max_iter`` does not apply (union-find is fully converged).
    - larger graphs: distributed min-label propagation — every round
      each node takes the min of its own label and its neighbors'
      labels; converges in O(graph diameter) rounds.  Near-dup graphs
      are overwhelmingly tiny stars (a document and its variants), so
      the expected round count is 2-3; ``max_iter`` bounds pathological
      chains.  Each round is one shuffled join + hash-agg on compact
      (long, long) rows; labels are persisted per round and lineage is
      cut with ``localCheckpoint`` every few rounds so the plan doesn't
      grow unboundedly (the classic iterative-Spark failure mode).  At
      extreme skew (one giant component) switch to large-star/
      small-star (Kiveris et al., "Connected Components in MapReduce"),
      which halves round count; not needed for dedup-shaped graphs.

    Both strategies run on (long, long) state.  NON-INTEGRAL id types
    (string doc keys, UUIDs) are first mapped through a dense integer
    index in id order (``dense_index_by_key``) and mapped back at the
    end — a bare ``cast("long")`` would turn such ids into NULL and
    silently corrupt the edge set (ADVICE r5).  The index is monotone
    in the id, so "minimum reachable id" survives the round trip
    exactly.  Pair endpoints must come from ``nodes`` (the documented
    contract); an endpoint missing there has no index and its edge is
    dropped by the inner remap join.
    """
    if not _integral_dtypes(pairs, "id_a", "id_b") or not _integral_dtypes(
        nodes, id_col
    ):
        from .sampling import dense_index_by_key

        ids = nodes.select(F.col(id_col).alias("__orig")).distinct()
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
        int_nodes = idx.select(F.col("__ix").alias("id"))
        out = dedup_clusters(
            int_nodes, int_pairs, "id", max_iter, driver_cc_max_pairs
        )
        return (
            out.join(idx.select(F.col("__ix").alias("id"), "__orig"), "id")
            .join(
                idx.select(
                    F.col("__ix").alias("cluster_id"),
                    F.col("__orig").alias("__cluster_orig"),
                ),
                "cluster_id",
            )
            .select(
                F.col("__orig").alias(id_col),
                F.col("__cluster_orig").alias("cluster_id"),
            )
        )
    pair_edges = pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    ).persist()
    n_pairs = pair_edges.count()
    all_nodes = nodes.select(F.col(id_col).alias("id"))
    if n_pairs <= driver_cc_max_pairs:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in pair_edges.collect():
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            # smaller id becomes the root, so every component's root IS
            # its minimum id — the same label the propagation loop finds
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
        spark = nodes.sparkSession
        label_rows = [(x, find(x)) for x in parent]
        pair_edges.unpersist()
        if not label_rows:
            return all_nodes.select(
                F.col("id").alias(id_col), F.col("id").alias("cluster_id")
            )
        from ..io import local_frame

        labels = F.broadcast(
            local_frame(spark, label_rows, "id long, lab long")
        )
        return all_nodes.join(labels, "id", "left").select(
            F.col("id").alias(id_col),
            F.coalesce("lab", "id").alias("cluster_id"),
        )
    # both edge directions PLUS a self-loop per endpoint, all from ONE
    # scan of the persisted pair table (explode, not a self-union — the
    # union's branches would each recompute the candidate-pair plan,
    # which is the expensive part of the query).  Self-loops make each
    # round a single join + hash-agg: min over neighbors *including
    # self* replaces the join-then-left-join-update two-step.
    # ``distinct`` compacts the redundant self-loop copies once up
    # front (edges feed every round).
    edges = (
        pair_edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_a").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_b").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # pre-partition the cached edge table on the join key: every
        # propagation round joins edges.src == labels.id, and labels
        # come out of groupBy(dst) hash-partitioned compatibly — so
        # with edges cached on hash(src) the per-round join reshuffles
        # NOTHING; only the groupBy(dst) exchange remains.  One extra
        # exchange at build time buys one fewer per iteration.
        .repartition("src")
        .persist()
    )
    # iterate ONLY over edge endpoints: a node with no near-dup edge
    # keeps its own id forever, and in a dedup graph that is almost
    # every node — the loop's tables shrink from |corpus| to
    # |touched-by-a-duplicate|.  Isolated nodes rejoin at the end.
    labels = (
        edges.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("id"), F.col("src").alias("lab"))
        .persist()
    )
    # convergence via the label-sum: labels only ever decrease, so the
    # sum strictly drops each round until the fixpoint — one scalar
    # aggregate per round (also materializing the persist) instead of
    # a labels-vs-labels join + count job.
    dec_sum = F.sum(F.col("lab").cast("decimal(38,0)"))
    prev_sum = labels.agg(dec_sum).collect()[0][0]
    pair_edges.unpersist()  # edges cache is materialized past this point
    for it in range(max_iter):
        new_labels = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("lab").alias("lab"))
            .select(F.col("dst").alias("id"), "lab")
        )
        if it % 4 == 3:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        new_sum = new_labels.agg(dec_sum).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    # labels is cached, so sizing it for the join-back strategy is
    # free; a near-dup label table is tiny next to the corpus, so
    # broadcast unless the graph is genuinely huge.  5M (long, long)
    # rows ≈ 80 MB serialized — comfortably inside Spark's broadcast
    # limits and a small slice of executor memory; a label table past
    # that means a duplicate-saturated corpus, where shuffling the
    # join-back on id is the honest plan.
    if labels.count() <= 5_000_000:
        labels = F.broadcast(labels)
    return (
        all_nodes.join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("lab", "id").alias("cluster_id"),
        )
    )


@pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-based token hashes —
    stable across runs/JVMs; Arrow-vectorized batches).

    Token md5s and their ±1 bit vectors are memoized per batch and the
    bit accumulation is a numpy sum — natural-language vocabularies
    repeat heavily, so the md5 cost amortizes to once per distinct
    token instead of once per occurrence."""
    import numpy as np

    bit_cache: dict[str, "np.ndarray"] = {}

    def token_bits(tok: str) -> "np.ndarray":
        bits = bit_cache.get(tok)
        if bits is None:
            h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
            bits = np.fromiter(
                ((1 if (h >> i) & 1 else -1) for i in range(64)),
                dtype=np.int64,
                count=64,
            )
            bit_cache[tok] = bits
        return bits

    def one(text: str) -> int:
        if not text:
            return 0
        toks = text.lower().split()
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            acc += token_bits(tok)
        v = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        # two's-complement into signed int64 for LongType
        return v - (1 << 64) if v >= (1 << 63) else v

    return texts.map(one)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    allow_candidate_subset: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, banded into
    ``bands`` equal-width chunks for candidate generation, exact
    Hamming distance as the verifier.

    Recall is guaranteed only for ``max_hamming <= bands - 1`` (a pair
    differing in at most bands-1 bits cannot differ in every band, so
    it must agree on >= 1 band and becomes a candidate).  Beyond that
    the banded join returns a candidate SUBSET — qualifying pairs can
    be silently missed — so the combination raises unless the caller
    opts in with ``allow_candidate_subset=True`` (useful as a recall/
    cost knob when a miss rate is acceptable; note more bands means
    narrower bands and exponentially larger candidate buckets).

    The fingerprint is the only Python step (vectorized pandas_udf);
    banding, join and popcount run JVM-side.
    """
    if max_hamming > bands - 1 and not allow_candidate_subset:
        raise ValueError(
            f"banded SimHash guarantees recall only for max_hamming <= "
            f"bands - 1 (got max_hamming={max_hamming}, bands={bands}); "
            f"use bands >= {max_hamming + 1} or pass "
            f"allow_candidate_subset=True to accept missed pairs"
        )
    width = 64 // bands
    fp = df.select(id_col, _simhash64(F.col(text_col)).alias("fp"))
    band_exprs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_no"),
                F.shiftrightunsigned("fp", b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = fp.withColumn("b", F.explode(band_exprs)).select(
        id_col, "fp", F.col("b.band_no").alias("band_no"), F.col("b.band_val").alias("band_val")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a"), "band_no", "band_val"
    )
    b_ = banded.select(
        F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b"), "band_no", "band_val"
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b_, ["band_no", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_keep_representatives(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """The end product of near-dup dedup: the surviving ids — one
    representative (the min id) per duplicate cluster, singletons kept.
    Thin filter over ``dedup_clusters``; at 100 TB join this id set
    back to the corpus with a broadcast/semi join to materialize the
    deduplicated dataset."""
    clusters = dedup_clusters(nodes, pairs, id_col, max_iter)
    return clusters.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)


def url_canonicalize(url_col) -> "F.Column":
    """Canonical form of a URL for URL-keyed dedup: lowercase, strip
    fragment, tracking (``utm_*``) query params, ``www.`` host prefix,
    the https default port, and trailing slashes.

    Every step is a literal/anchored regexp with no backreferences —
    the subset where Java (Spark) and RE2-style (DuckDB) dialects
    agree byte-for-byte, so the same canonical key is derivable in the
    oracle.  Pure projection: narrow, pipelines into the scan.
    """
    c = F.lower(url_col if not isinstance(url_col, str) else F.col(url_col))
    c = F.regexp_replace(c, r"#.*$", "")            # fragment
    c = F.regexp_replace(c, r"&utm_[^&#]*", "")     # tracking params
    c = F.regexp_replace(c, r"https://www\.", "https://")
    c = F.regexp_replace(c, r":443/", "/")          # https default port
    c = F.regexp_replace(c, r"/\?", "?")            # slash before query
    c = F.regexp_replace(c, r"/$", "")              # trailing slash
    return c


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-keyed exact dedup after canonicalization: one row per
    canonical URL with the duplicate count and the minimum-id survivor
    (same keep rule as ``dedup_exact``).  One map-side-combinable
    hash-agg on the canonical key."""
    return (
        df.select(
            url_canonicalize(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide repeated-LINE detection — the line-level dedup
    signal of C4/RefinedWeb-style cleaning: lines recurring across
    many documents (navigation chrome, cookie banners, copyright
    footers) are boilerplate to strip, while within-document repeats
    alone are not.

    Explode lines → one hash-agg keyed by line text with two counts
    (distinct docs via a two-level agg, total occurrences); lines are
    near-unique outside true boilerplate so the groups stay tiny, and
    both aggregations combine map-side.  Emits ``(line, n_docs,
    n_total)`` for lines seen in ≥ ``min_docs`` documents.
    """
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select("__doc", F.trim(F.col("raw")).alias("line")).filter(
        F.col("line") != ""
    )
    per_doc = lines.groupBy("line", "__doc").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        per_doc.groupBy("line")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("n_total"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Exact duplicated-substring spans per document (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): every
    word ``k``-gram that occurs more than once in the corpus (within
    or across documents) marks its ``k`` token positions as
    duplicated; overlapping/adjacent marked windows coalesce into
    maximal spans.  Published per doc: token count, span count,
    duplicated-token count, and the duplicated fraction in exact
    integer micro-units — the signal a pipeline thresholds to drop or
    trim boilerplate-heavy documents.

    Scale shape: positional k-grams use the same hash-composed int64
    scheme as ``hashed_shingles`` (join key is 8 bytes, never the
    string); the hot-gram table is one map-side-combinable count; the
    span merge is a per-document sort (gap-islands with equal-length
    intervals: a new island starts iff the gap between consecutive
    start positions exceeds ``k``).  Both the token-hash table and the
    positional-gram table sit behind ``persist`` barriers — exploding
    an uncached nested higher-order array re-evaluates the inner
    expression per element (see CLAUDE.md).
    """
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    th = F.transform(tokens, lambda t: F.xxhash64(t))
    tok_tbl = df.select(
        F.col(id_col).alias("__id"), th.alias("__th")
    ).persist()
    # empty gram array for docs shorter than k tokens — Spark's
    # sequence(1, 0) would DESCEND, not produce an empty range
    idx = F.sequence(F.lit(1), F.size("__th") - (k - 1))
    grams = F.when(
        F.size("__th") >= k,
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.try_element_at(F.col("__th"), i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    gram_tbl = (
        tok_tbl.select("__id", F.size("__th").alias("__n"), grams.alias("__g"))
        .persist()
    )
    pos = gram_tbl.select(
        "__id", "__n", F.posexplode("__g").alias("__p", "__gram")
    )
    hot = (
        pos.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__gram")
    )
    marked = pos.join(hot, "__gram").select("__id", "__n", "__p")
    w = Window.partitionBy("__id").orderBy("__p")
    islands = (
        marked.withColumn(
            "__brk",
            F.when(
                F.col("__p") - F.lag("__p").over(w) <= k, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("__isl", F.sum("__brk").over(w))
    )
    spans = islands.groupBy("__id", "__n", "__isl").agg(
        (F.max("__p") - F.min("__p") + k).alias("__len")
    )
    per_doc = spans.groupBy("__id", "__n").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum("__len").cast("long").alias("dup_tokens"),
    )
    out = (
        tok_tbl.select("__id", F.size("__th").alias("__n"))
        .join(per_doc, ["__id", "__n"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000 DIV greatest(__n, 1) AS BIGINT)"
            ).alias("dup_frac_micro"),
        )
    )
    return out


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """The removal half of ``duplicate_spans`` (Lee et al. actually
    DELETE the duplicated substrings from the training copy): tokens
    covered by any corpus-duplicated k-gram span are dropped and the
    survivors re-joined with single spaces.  Published per doc:
    cleaned text, surviving token count, removed token count — the
    dedup transform a pipeline applies between span detection and
    packing.

    Same plan skeleton as ``duplicate_spans`` (persisted positional
    grams, hot-gram count); removal is a left anti-style filter of the
    exploded token stream against the marked position set, then a
    sorted re-aggregation per doc — the shuffle carries (doc, pos,
    token-hash) triples, never full texts.
    """
    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    tok_tbl = df.select(
        F.col(id_col).alias("__id"), tokens.alias("__w")
    ).persist()
    th = F.transform(F.col("__w"), lambda t: F.xxhash64(t))
    idx = F.sequence(F.lit(1), F.size("__w") - (k - 1))
    gram_src = tok_tbl.select("__id", "__w", th.alias("__th"))
    grams = F.when(
        F.size("__th") >= k,
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.try_element_at(F.col("__th"), i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    gram_tbl = gram_src.select("__id", grams.alias("__g")).persist()
    pos = gram_tbl.select("__id", F.posexplode("__g").alias("__p", "__gram"))
    hot = (
        pos.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__gram")
    )
    # expand each hot gram start position to its k covered token slots
    covered = (
        pos.join(hot, "__gram")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__p"), F.col("__p") + (k - 1))
            ).alias("__t"),
        )
        .distinct()
    )
    toks = tok_tbl.select("__id", F.posexplode("__w").alias("__t", "__tok"))
    kept = toks.join(covered, ["__id", "__t"], "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("__t", "__tok"))), lambda s: s["__tok"])
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return (
        tok_tbl.select("__id", F.size("__w").cast("long").alias("n_tokens"))
        .join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.col("n_tokens"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    t_num: int = 9,
    t_den: int = 10,
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """DIRECTED containment near-dup pairs: emit (id_a → id_b) when
    ``|A∩B| / |A| >= t_num/t_den`` over word n-gram shingle sets — the
    asymmetric signal symmetric Jaccard cannot give: a short document
    embedded verbatim inside a much longer one has containment ~1 but
    Jaccard ~|A|/|B|, far below any dedup threshold.  (The
    boilerplate/mirror-page case Lee et al.'s span dedup attacks at
    substring level, here at set level.)

    Candidate generation is the asymmetric prefix filter: if
    ``|A∩B| >= t·|A|`` then B must share a shingle with A's first
    ``|A| - ceil(t·|A|) + 1`` shingles under the global rarest-first
    order (missing all of them caps the overlap at ``ceil(t·|A|)-1``);
    so only the CONTAINED side is prefixed while the container side
    joins with its full posting list.  Rarest-first ordering keeps the
    join keys rare, so the posting lists hit per key stay short.  The
    threshold itself is a rational (t_num/t_den) and every comparison
    is an integer cross-multiplication — no float thresholds anywhere
    (``containment_micro = inter·10⁶ DIV |A|`` published exactly).

    Scale: one exchange of the exploded posting table on the shingle
    hash (int64); at 100 TB a bloom/semi prefilter of the postings by
    the prefix-shingle set drops the exchange to the rare-shingle
    slice — the join is already keyed to make that a drop-in.
    """
    sh = (
        hashed_shingles(df.select(id_col, text_col), text_col, n)
        .select(id_col, "sh")
        .persist()
    )
    ex = sh.select(
        id_col, F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    if broadcast_vocab is None:
        freq = freq.persist()
        broadcast_vocab = freq.count() <= _VOCAB_BROADCAST_MAX_ROWS
    if broadcast_vocab:
        freq = F.broadcast(freq)
    w = Window.partitionBy(id_col).orderBy("df_", "shingle")
    ranked = ex.join(freq, "shingle").withColumn("pos", F.row_number().over(w))
    # integer ceil division: ceil(t·n) = (n·t_num + t_den − 1) DIV t_den
    prefix_len = F.col("n_sh") - F.expr(
        f"(n_sh * {t_num} + {t_den - 1}) DIV {t_den}"
    ) + 1
    probe = ranked.filter(F.col("pos") <= prefix_len).select(
        F.col(id_col).alias("id_a"), "shingle"
    )
    post = ex.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        probe.join(post, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    arr_a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    arr_b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("sh_a").cast("long").alias("n_a"),
            F.size(F.array_intersect("sh_a", "sh_b"))
            .cast("long")
            .alias("inter"),
        )
        .filter(F.col("inter") * t_den >= t_num * F.col("n_a"))
        .select(
            "id_a",
            "id_b",
            "n_a",
            "inter",
            F.expr("inter * 1000000 DIV n_a").alias("containment_micro"),
        )
    )
