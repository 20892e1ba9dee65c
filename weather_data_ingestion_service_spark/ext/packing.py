"""Sequence packing: lay documents into fixed token-budget training
bins (GPT-style concat-and-chunk).

Pretraining consumes fixed-length sequences; feeding one short document
per sequence wastes most of the context window.  The standard remedy
concatenates the corpus into one token stream and slices it at budget
boundaries — a document then lives at a deterministic stream offset and
belongs to bin ``offset // budget`` (possibly straddling into the
next bin, which trainers handle with attention-mask resets).

Scale posture: a single global running sum would serialize the corpus
through one task, so the stream is sharded — documents are first
routed to ``(group, shard)`` streams by an id-hash bucket (pure
function of the row: stable across runs/engines/cluster sizes), and
the running offset is per-stream.  One shuffle on the stream key; the
window's running sum is a single ordered pass per stream.  Shard count
scales with corpus size (each stream's rows must fit one task
comfortably); bins never cross shards, so downstream loaders read
shards independently — exactly how a 1000-executor job wants it.

The reference has no packing surface; this is a mandated
training-pipeline extension in the spirit of its downstream-ML framing
(reference README.md:18).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import _id_hash


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    group_cols: Sequence[str] = (),
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, stream offset, bin) under
    concat-and-chunk packing with ``budget`` tokens per bin.

    Documents are ordered within a stream by id-hash (deterministic,
    uniform — avoids pathological runs of same-length docs that id
    order could produce).  Emits:

    - ``shard``       — id-hash bucket (0..n_shards-1)
    - ``bin_id``      — ``stream_offset // budget`` within the shard
    - ``bin_offset``  — position of the doc's first token in its bin
    - ``straddles``   — true when the doc crosses a bin boundary

    All arithmetic is integer → hash-stable cross-engine.
    """
    # first two hex digits of the id hash → 0..255 → modulo shards;
    # DuckDB: CAST('0x' || substr(md5(...), 1, 2) AS BIGINT) % n
    shard = (
        F.conv(F.substring(_id_hash(id_col), 1, 2), 16, 10).cast("long")
        % n_shards
    ).alias("shard")
    out = df.withColumn("shard", shard)
    keys = [*group_cols, "shard"]
    w = Window.partitionBy(*keys).orderBy(_id_hash(id_col), F.col(id_col))
    offset = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    tok = F.col(token_col).cast("long")
    # `div` is exact integer division (float `/`+floor would drift past
    # 2^53 — stream offsets at 100 TB exceed that)
    return (
        out.withColumn("_offset", offset)
        .withColumn("_end", F.col("_offset") + tok - F.lit(1))
        .withColumn("bin_id", F.expr(f"_offset div {int(budget)}"))
        .withColumn("bin_offset", F.col("_offset") % budget)
        .withColumn(
            "straddles",
            F.expr(f"_end div {int(budget)}") > F.col("bin_id"),
        )
        .drop("_offset", "_end")
    )


def pack_bestfit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Best-fit-decreasing packing WITHOUT document straddling: each
    document lands wholly in one bin (instruction-tuning / SFT packing,
    where examples must not be split), bins filled by the classic BFD
    heuristic — sort by length descending, place each doc in the
    fullest bin that still fits, open a new bin otherwise.  A doc
    longer than ``budget`` gets a bin of its own (the loader's
    truncation problem, flagged by ``oversized``).

    Bin packing is inherently sequential, so this is the honest
    ``applyInPandas`` case (SURVEY.md §2.J udf_scalar_pattern): the
    sequential loop runs per (shard) group over Arrow batches, never
    over the whole corpus — shards are id-hash streams exactly like
    ``pack_sequences``, so the packing is deterministic for any
    partitioning and any cluster size, and each task packs a bounded
    slice.  In-loop cost is O(docs × open-bins) per shard; raise
    ``n_shards`` so a shard's documents fit one task.

    Emits one row per document: ``(id, n_tokens, shard, bin_id,
    oversized)`` with bins numbered densely per shard in creation
    order.
    """
    import pandas as pd

    shard = (
        F.conv(F.substring(_id_hash(id_col), 1, 2), 16, 10).cast("long")
        % n_shards
    ).alias("shard")
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        shard,
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # NULL ids/token counts arrive as NaN: int() would raise a
        # bare ValueError mid-loop and NaN sorts unpredictably —
        # fail the shard with the contract spelled out instead
        if pdf["id"].isna().any() or pdf["n_tokens"].isna().any():
            raise ValueError(
                "pack_bestfit requires non-null id/token-count rows; "
                "filter or impute upstream (deterministic packing is "
                "undefined for unknown lengths)"
            )
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []
        assign: list[int] = []
        for tok in pdf["n_tokens"]:
            best, best_rem = -1, None
            for i, rem in enumerate(remaining):
                if rem >= tok and (best_rem is None or rem < best_rem):
                    best, best_rem = i, rem
            if best < 0:
                remaining.append(max(budget - int(tok), 0))
                assign.append(len(remaining) - 1)
            else:
                remaining[best] -= int(tok)
                assign.append(best)
        pdf["bin_id"] = pd.Series(assign, dtype="int64")
        pdf["oversized"] = pdf["n_tokens"] > budget
        return pdf

    return src.groupBy("shard").applyInPandas(
        pack, "id long, n_tokens long, shard long, bin_id long, oversized boolean"
    )


def pack_segments(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Materialize the PER-BIN segment map of ``pack_sequences``: for
    every (shard, bin) the ordered document segments it contains —
    ``doc_ids``, in-bin ``seg_starts``, per-document ``pos_starts``
    (the position-id offset of the segment's first token WITHIN its
    document: 0 when the doc starts here, the carried offset when it
    straddled in) and ``seg_lens``.  This is exactly the metadata a
    trainer needs to build block-diagonal attention masks and
    document-reset position ids — the detail that stops packed
    neighbors from attending across document boundaries.

    One row per (doc, bin) SEGMENT — a doc spanning k bins fans out
    to k rows, bounded by ceil(len/budget) + 1 per doc — with
    ``seg_idx`` ranking segments within their bin by the unique in-bin
    start (scalar columns only: the driver's canonicalizer rejects
    array cells, so the map ships relationally, not as per-bin
    arrays).  Integer arithmetic end to end.
    """
    packed = pack_sequences(df, id_col, token_col, budget, n_shards=n_shards)
    tok = F.col(token_col).cast("long")
    ofs = (F.col("bin_id") * budget + F.col("bin_offset")).cast("long")
    seg = (
        packed.filter(tok > 0)
        .withColumn("_ofs", ofs)
        .withColumn("_endbin", F.expr(f"(_ofs + {token_col} - 1) div {int(budget)}"))
        .select(
            id_col,
            "shard",
            "_ofs",
            tok.alias("_tok"),
            F.explode(F.sequence(F.col("bin_id"), F.col("_endbin"))).alias("b"),
        )
    )
    x = seg.select(
        F.col("shard").cast("long").alias("shard"),
        F.col("b").cast("long").alias("bin_id"),
        F.col(id_col),
        F.greatest(F.col("_ofs") - F.col("b") * budget, F.lit(0))
        .cast("long")
        .alias("seg_start"),
        F.greatest(F.col("b") * budget - F.col("_ofs"), F.lit(0))
        .cast("long")
        .alias("pos_start"),
        (
            F.least(F.col("_ofs") + F.col("_tok"), (F.col("b") + 1) * budget)
            - F.greatest(F.col("_ofs"), F.col("b") * budget)
        )
        .cast("long")
        .alias("seg_len"),
    )
    w = Window.partitionBy("shard", "bin_id").orderBy("seg_start")
    return x.select(
        "shard",
        "bin_id",
        F.row_number().over(w).cast("long").alias("seg_idx"),
        id_col,
        "seg_start",
        "pos_start",
        "seg_len",
    )
