"""WebDataset-style tar-shard source/sink for multimodal corpora.

Large multimodal training sets ship as directories of tar shards whose
members share a key per sample (``000123.jpg`` + ``000123.txt`` +
``000123.json`` …).  Spark has no tar format; ``tarfile`` is stdlib,
so both directions are REAL plumbing (no stubbed codec — the stub
boundary stays at image/audio DECODE in ext/multimodal):

- **read**: ``spark.read.format("webdataset").load(dir)`` — one
  InputPartition per shard, members streamed as
  ``(shard, key, member, payload binary, n_bytes)`` rows; N shards
  scan with N-way parallelism and payload bytes never touch the
  driver.
- **write**: :func:`write_webdataset` — rows are hash-routed to a
  shard (``ext/sampling.shard_assign`` semantics), each task writes
  its own ``shard-NNNNN.tar`` via ``foreachPartition`` — the standard
  executor-side sharded-sink shape; nothing corpus-sized on the
  driver.

The reference has no multimodal surface; this is the mandated
extension's I/O layer (BASELINE.json), the container format FAISS/WDS
loaders consume downstream.
"""

from __future__ import annotations

import glob
import io
import os
import tarfile

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA_DDL = (
    "shard string, key string, member string, payload binary, n_bytes bigint"
)


class WebDatasetSource(DataSource):
    """format('webdataset') — options: ``path`` (dir or glob of .tar)."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> "WebDatasetReader":
        return WebDatasetReader(self.options)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("webdataset requires a path")

    def partitions(self):
        pattern = (
            self.path
            if any(ch in self.path for ch in "*?[")
            else os.path.join(self.path, "*.tar")
        )
        files = sorted(glob.glob(pattern))
        return [_ShardPartition(f) for f in files]

    def read(self, partition: _ShardPartition):
        shard = os.path.basename(partition.path)
        with tarfile.open(partition.path, "r") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                fh = tf.extractfile(member)
                payload = fh.read() if fh is not None else b""
                # webdataset key = member name up to the first dot
                # ("000123.cls.txt" -> "000123")
                base = os.path.basename(member.name)
                key = base.split(".", 1)[0]
                yield (shard, key, member.name, payload, len(payload))


def write_webdataset(
    df: DataFrame,
    key_col: str,
    member_col: str,
    payload_col: str,
    out_dir: str,
    n_shards: int = 4,
) -> None:
    """Executor-side sharded tar sink: rows hash-route to
    ``n_shards`` streams (same deterministic id-hash bucketing as
    ``ext/sampling.shard_assign``) and each task tars the shard(s)
    routed to it — the writer half of the WebDataset layout.  Bytes
    flow scan → executor → local tar; the driver only makes the
    directory.

    ``repartition(n, "shard")`` hash-partitions the shard VALUE, so
    distinct shard ids can land in one task; each task therefore
    groups its (shard-sorted) rows by shard id and writes one tar PER
    SHARD VALUE, named ``shard-{shard:05d}.tar`` — exactly one tar per
    non-empty shard, and the filename always matches the
    ``shard_assign`` route regardless of how Spark placed partitions.
    """
    from ..ext.sampling import _id_hash_u52

    os.makedirs(out_dir, exist_ok=True)
    routed = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(member_col).cast("string").alias("member"),
            F.col(payload_col).cast("binary").alias("payload"),
            (_id_hash_u52(key_col) % n_shards).cast("int").alias("shard"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "key", "member")
    )

    def write_partition(rows):
        buf, tf, cur, n = None, None, None, 0

        def flush():
            if tf is None or n == 0:
                return
            tf.close()
            with open(
                os.path.join(out_dir, f"shard-{cur:05d}.tar"), "wb"
            ) as out:
                out.write(buf.getvalue())

        for r in rows:
            if r.shard != cur:
                flush()
                cur, n = r.shard, 0
                buf = io.BytesIO()
                tf = tarfile.open(fileobj=buf, mode="w")
            data = bytes(r.payload) if r.payload is not None else b""
            info = tarfile.TarInfo(name=f"{r.key}.{r.member}")
            info.size = len(data)
            info.mtime = 0  # deterministic archives
            tf.addfile(info, io.BytesIO(data))
            n += 1
        flush()

    routed.foreachPartition(write_partition)


def register_webdataset_source(spark) -> None:
    """Idempotently register format('webdataset')."""
    spark.dataSource.register(WebDatasetSource)
