"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
heavy decode/extract steps run as Arrow-batched ``mapInPandas`` passes so
each task streams batches without materializing a partition. The actual
codecs (PIL/ffmpeg/etc.) are NOT in this container, so the decode kernel is
a clearly marked deterministic stand-in (`_fake_decode`) behind the same
batch interface — the Spark-side contract (schema, batch shape,
partitioning) is real and tested; swap the kernel for a real decoder in a
codec-equipped image.

Scale notes: binary columns inflate row size. Two guards: (1) the decode
kernel processes and YIELDS fixed-size slices (``batch_rows``) inside the
generator, so peak Python memory is bounded by slice size regardless of
how large the incoming Arrow batch is; (2) for the input side, lower
``spark.sql.execution.arrow.maxRecordsPerBatch`` session-wide when payloads
are large (it is a session conf read at execution time — get_spark defaults
it to 10,000, sized for text rows). Feature extraction emits fixed-width
arrays (columnar-friendly) rather than per-row Python objects.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def _fake_decode(payload: pd.Series, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: byte-histogram features.

    STUB — replace with PIL/torchaudio/ffmpeg in a codec-equipped runtime.
    Raises NotImplementedError for kinds a real decoder would reject.
    """
    out = np.zeros((len(payload), dim), dtype=np.float32)
    for i, buf in enumerate(payload):
        arr = np.frombuffer(buf, dtype=np.uint8)
        if len(arr):
            hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
            out[i] = hist / len(arr)
    return out


def extract_features(
    media: DataFrame, feature_dim: int = 16, batch_rows: int = 256
) -> DataFrame:
    """binary payload -> fixed-width feature vector + content hash.

    content_hash and n_bytes are computed JVM-side (``F.md5`` / ``F.length``
    over the binary column — codegen, no Python) BEFORE the Arrow pass; the
    pandas kernel only does the one thing Spark can't: decode. (The stub
    decoder's per-row loop is inherent to any real codec.) The kernel
    decodes and yields ``batch_rows``-sized slices so peak Python-side
    memory stays bounded even when the incoming Arrow batch is large.
    """
    prepped = media.select(
        "media_id",
        "kind",
        "payload",
        F.md5("payload").alias("content_hash"),
        F.length("payload").cast("long").alias("n_bytes"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sl = pdf.iloc[lo:lo + batch_rows]
                feats = _fake_decode(sl["payload"], feature_dim)
                yield pd.DataFrame(
                    {
                        "media_id": sl["media_id"].to_numpy(),
                        "kind": sl["kind"].to_numpy(),
                        "n_bytes": sl["n_bytes"].to_numpy(),
                        "content_hash": sl["content_hash"].to_numpy(),
                        "features": list(feats),
                    }
                )

    return prepped.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_resize(
    payload: pd.Series, target_w: int, target_h: int
) -> list[bytes]:
    """Deterministic stand-in for a real image resampler: nearest-neighbor
    subsample of the payload BYTES to exactly target_w*target_h bytes.

    STUB — replace with PIL/opencv in a codec-equipped runtime. The
    surrounding plumbing (schema-preserving output, metadata rewrite,
    bounded batch slices) is the real contract.
    """
    n_out = target_w * target_h
    out = []
    for buf in payload:
        arr = np.frombuffer(buf, dtype=np.uint8)
        if len(arr) == 0:
            out.append(bytes(n_out))
            continue
        idx = (np.arange(n_out, dtype=np.int64) * len(arr)) // n_out
        out.append(arr[idx].tobytes())
    return out


def resize_images(
    media: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    batch_rows: int = 256,
) -> DataFrame:
    """Resize every IMAGE row to (target_w, target_h), passing the payload
    through the (stubbed) resample kernel and rewriting the metadata;
    non-image rows are filtered (resize is an image op — run video
    through ``frame_sample`` first). Output keeps ``MEDIA_SCHEMA``, so
    resizes compose with ``extract_features`` and further passes. The
    kernel yields ``batch_rows``-sized slices — bounded Python memory at
    any Arrow batch size, the same discipline as ``extract_features``.
    """
    if target_w <= 0 or target_h <= 0:
        raise ValueError(
            f"resize_images: target must be positive, got {target_w}x{target_h}"
        )
    images = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sl = pdf.iloc[lo:lo + batch_rows].copy()
                sl["payload"] = _fake_resize(sl["payload"], target_w, target_h)
                sl["width"] = np.int32(target_w)
                sl["height"] = np.int32(target_h)
                yield sl

    return images.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame offset.

    The frame *positions* come from metadata (JVM-side sequence — no decode
    needed); actual pixel extraction is the stubbed decode kernel's job.
    """
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_offset_ms"),
    )


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(42)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "width": 64 if kind == "image" else None,
                "height": 64 if kind == "image" else None,
                "duration_ms": 5000 if kind in ("audio", "video") else None,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["width"] = pdf["width"].astype("Int32")
    pdf["height"] = pdf["height"].astype("Int32")
    pdf["duration_ms"] = pdf["duration_ms"].astype("Int32")
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
