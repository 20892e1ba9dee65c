"""Multimodal column handling: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is a
``binary`` column (or a pointer to object storage when > a few MB),
metadata travels in sibling typed columns, and decode/feature-extract
runs as Arrow-batched ``mapInPandas`` so the raw bytes never round-trip
through Python row-at-a-time.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image_features`` stubs the decode behind an import-try with a
deterministic fake — the Spark-side plumbing (schema, batching,
partition shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def attach_binary_payload(
    df: DataFrame, src_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes
    of a string column — the stand-in for image/audio bytes) plus the
    typed metadata columns every multimodal table carries."""
    return df.withColumn(payload_col, F.encode(F.col(src_col), "UTF-8")).withColumn(
        "payload_bytes", F.octet_length(F.col(payload_col))
    ).withColumn("payload_md5", F.md5(F.col(payload_col)))


#: output schema of the (stubbed) image feature extractor
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _decode_real(payload: bytes) -> tuple[int, int, int, float]:
    """Real decode path — requires an image codec library."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install pillow to enable real decode"
        ) from exc
    raise NotImplementedError("real decode wired when codec present")


def _decode_fake(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: derives plausible dimensions and a
    mean-luma from the payload bytes so the pipeline is testable."""
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n // 7) % 512)
    luma = (sum(payload[:64]) / max(min(n, 64), 1)) / 255.0
    return width, height, 3, luma


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_codec: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — each batch is a pandas DataFrame of (id, bytes);
    output rows follow ``IMAGE_FEATURES_SCHEMA``.

    This is the multimodal operator shape: payload stays binary end to
    end, Python sees whole Arrow batches, and the decode itself is
    swappable (fake ↔ real codec) without touching the plan."""

    decode = _decode_real if use_real_codec else _decode_fake

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )
