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
