#!/usr/bin/env python
"""Supplementary plan capture for the round-15 encode-path changes.

The encode optimizations live in INTERMEDIATE frames of lifecycle
entries (the epoch-encode write inputs), which the entry-returned
plans don't show.  This captures the encode frames directly:

  python plans/r15/capture_encode_plans.py <suffix> <outdir>

writes
  <outdir>/ext_simsearch_index_build__encode_<suffix>.txt
      (ivfpq_encode_codes over the embeddings corpus — the md5-codebook
       encode every index_build/upsert/compact/stream ingest runs)
  <outdir>/ext_simsearch_index_refined_upsert__ingest_<suffix>.txt
      (ivfpq_refined_encode_epoch over the corpus — the trained-index
       epoch-record encode every refined upsert/retrain/stream runs)
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dump(df, path: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)")


def main() -> None:
    suffix, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from weather_data_ingestion_service_spark.session import get_spark
    from weather_data_ingestion_service_spark.io import load_table
    from weather_data_ingestion_service_spark.ext.simsearch import (
        _md5_codebook,
        ivfpq_encode_codes,
        ivfpq_refined_encode_epoch,
    )
    from weather_data_ingestion_service_spark.registry_r11 import (
        _RT,
        _ensure_refined_index,
    )
    from weather_data_ingestion_service_spark.ext.simsearch import (
        load_refined_codebooks,
    )

    spark = get_spark(app_name="wds-plan-capture-encode")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")

    from weather_data_ingestion_service_spark.io import local_frame

    cent = _md5_codebook(emb, "vec_id", "embedding", 16)
    cent_local = local_frame(spark, cent.collect(), cent.schema)
    _dump(
        ivfpq_encode_codes(emb, "vec_id", "embedding", cent=cent_local),
        os.path.join(
            outdir, f"ext_simsearch_index_build__encode_{suffix}.txt"
        ),
    )

    idx = _ensure_refined_index(spark, SF_DIR)
    cb = load_refined_codebooks(spark, idx, _RT["m"])
    _dump(
        ivfpq_refined_encode_epoch(
            emb, cb[0], cb[1], _RT["m"], _RT["dim"]
        ),
        os.path.join(
            outdir,
            f"ext_simsearch_index_refined_upsert__ingest_{suffix}.txt",
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
