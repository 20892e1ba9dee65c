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


#: output schema of the (stubbed) video frame sampler
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_nth: int = 4,
    fps: int = 30,
    use_real_codec: bool = False,
) -> DataFrame:
    """Video frame sampling: one binary payload row fans out to k frame
    rows (frame index, presentation timestamp, frame bytes) — the
    mapInPandas shape where the output cardinality differs from the
    input's, which a scalar pandas_udf cannot express.

    Stub codec (real path gated behind ffmpeg availability): the
    payload is treated as a short clip whose frame count and bytes are
    deterministic functions of the payload, so batching/fan-out/schema
    are all real and testable.  At 100 TB the fan-out multiplies rows
    BEFORE any shuffle — sample (``every_nth``) at decode time, never
    materialize all frames and filter after.
    """
    if use_real_codec:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "video codec not available in this environment; "
            "install ffmpeg/av to enable real frame extraction"
        )
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_no": [], "frame_ts_ms": [],
                "frame_payload": [], "frame_md5": [],
            }
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = 1 + (len(payload) % 32)
                for fno in range(0, n_frames, every_nth):
                    fb = bytes(payload[fno::max(n_frames, 1)])[:64]
                    out["doc_id"].append(i)
                    out["frame_no"].append(fno)
                    out["frame_ts_ms"].append(fno * 1000 // fps)
                    out["frame_payload"].append(fb)
                    out["frame_md5"].append(hashlib.md5(fb).hexdigest())
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(extract, FRAME_SCHEMA)


#: output schema of the (stubbed) image resizer
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_bytes", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 224,
    target_h: int = 224,
    use_real_codec: bool = False,
) -> DataFrame:
    """Image resize to a fixed training resolution: 1:1 row transform
    over binary payloads, payload stays binary end to end.

    Stub codec: the "resized" payload is a deterministic stride-sample
    of the source bytes proportional to the target pixel count, so
    payload size really shrinks and downstream operators see realistic
    binary churn.  Real path gated behind PIL availability.
    """
    if use_real_codec:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install pillow to enable real resize"
        )
    target_bytes = max(target_w * target_h // 1024, 16)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf[payload_col]:
                stride = max(len(p) // target_bytes, 1)
                payloads.append(bytes(p[::stride])[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": target_w,
                    "height": target_h,
                    "payload": payloads,
                    "payload_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZED_SCHEMA)
