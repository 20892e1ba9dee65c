"""Streaming corpus curation: the batch gate→dedup→admit pipeline
(``ext_pipeline_e2e``) restated for a document FEED — each micro-batch
is quality-gated, content-hashed, deduplicated against everything
already admitted (cross-batch), and appended exactly once.

The dedup "state" is the admitted corpus itself (its content-hash
column), not executor memory: restart re-reads the target, so the
no-duplicate invariant survives failures without a state store, and
the admitted store is directly queryable parquet.  At 100 TB the
anti-join probe side is one bucketed hash index scan per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..ext.text import quality_gate_flags


def curation_sink(
    stream_df: DataFrame,
    target_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``foreachBatch`` curation sink.  Per micro-batch:

    1. quality gate (``quality_gate_flags`` — narrow, zero-exchange);
    2. content-hash survivors (md5 of the text bytes);
    3. within-batch first-occurrence per hash (lowest id wins —
       deterministic regardless of partitioning);
    4. anti-join against the ALREADY-ADMITTED store's hashes
       (cross-batch dedup; existence checked through the Hadoop
       FileSystem so the first batch doesn't need the dir);
    5. write the admitted rows to ``{target}/batch=<epoch>`` with
       per-epoch OVERWRITE — a retried epoch rewrites its own
       subdirectory instead of double-appending, so the sink is
       idempotent under foreachBatch's at-least-once contract.

    Returns the started StreamingQuery.
    """

    def admit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        gated = quality_gate_flags(batch_df, text_col).filter(F.col("keep"))
        hashed = gated.select(
            id_col,
            text_col,
            F.md5(F.col(text_col).cast("binary")).alias("content_hash"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("content_hash").orderBy(id_col)
        firsts = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        target_path = jvm.org.apache.hadoop.fs.Path(target_dir)
        fs = target_path.getFileSystem(hconf)

        def has_committed_files(path) -> bool:
            # a crash during the very first epoch can leave the target
            # dir containing only _temporary scaffolding; bare
            # fs.exists would then send us into a parquet read that
            # throws "unable to infer schema" forever.  Only a COMMITTED
            # data file (non-hidden, non-underscore) counts as an
            # existing store; a transient read failure on a store that
            # HAS data still propagates (never silently skip dedup —
            # the merge-sink lesson).
            stack = [path]
            while stack:
                for st in fs.listStatus(stack.pop()):
                    name = st.getPath().getName()
                    if name.startswith("_") or name.startswith("."):
                        continue
                    if st.isDirectory():
                        stack.append(st.getPath())
                    else:
                        return True
            return False

        if fs.exists(target_path) and has_committed_files(target_path):
            # exclude THIS epoch's own partition from the seen set: a
            # retried/replayed epoch must not anti-join against its own
            # previous output (it would then overwrite its subdir with
            # an empty frame and silently lose the admitted rows) —
            # excluding it makes the rewrite reproduce the identical
            # rows instead
            seen = (
                spark.read.parquet(target_dir)
                .filter(F.col("batch") != int(epoch_id))
                .select("content_hash")
            )
            fresh = firsts.join(seen, "content_hash", "left_anti")
        else:
            fresh = firsts
        fresh.write.mode("overwrite").parquet(
            f"{target_dir.rstrip('/')}/batch={int(epoch_id)}"
        )

    return (
        stream_df.writeStream.foreachBatch(admit_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
