"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested. The codec step is STUBBED: this
container has no image/audio libraries, so ``decode_image``/
``decode_audio`` either raise ``NotImplementedError`` (strict mode) or
produce a deterministic fake decode derived from the bytes (test
mode). Swapping in Pillow/torchaudio/pyav is a one-function change —
the distributed plan is unchanged.

Scale notes:
  - binary payloads ride the Arrow transfer like any column; keep
    ``spark.sql.files.maxPartitionBytes`` sized so a partition of
    blobs fits executor memory (the session builder does).
  - feature vectors come back as array<float> ready for the
    similarity/dedup operators (operators/similarity.py).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, "
    "codec:string>"
)

FEATURE_DIM = 32


def synthesize_media(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure
    function of (media_id, seed); metadata is typed and plausible."""
    base = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id")), 512).cast(
        "binary"
    )
    return base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.col("id"), F.lit(8)) * 64 + 64).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(4)) * 64 + 64).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id"), F.lit(30)) + 1).cast("int").alias("n_frames"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, meta: dict, strict: bool = False) -> bytes:
    """STUB codec. Real deployment: Pillow/libjpeg here."""
    if strict:
        raise NotImplementedError(
            "image codec not available in this container; install Pillow "
            "and replace decode_image"
        )
    # deterministic fake: 'pixels' = repeated digest of the payload
    return hashlib.sha256(payload).digest()


def _features_from_bytes(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature extractor: dim floats in [-1, 1)
    unfolded from iterated sha256 (stands in for a CNN/wav2vec
    embedding; same shape, same dtype, same batch contract)."""
    out: list[float] = []
    block = data
    while len(out) < dim:
        block = hashlib.sha256(block).digest()
        for i in range(0, len(block) - 3, 4):
            (u,) = struct.unpack_from("<I", block, i)
            out.append((u / 2**31) - 1.0)
            if len(out) == dim:
                break
    return out


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media table → (media_id, kind, feature array<float>, n_bytes).

    mapInPandas so each Arrow batch of blobs is decoded+featurized in
    one Python call; the output feeds the ANN/near-dup operators."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _features_from_bytes(
                    decode_image(bytes(p), None) if k == "image" else bytes(p)
                )
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        _batches,
        schema="media_id long, kind string, feature array<float>, n_bytes int",
    )


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame sampling: explode n_frames into sampled frame rows
    (the decode of each frame is the stubbed codec; the explode/
    partition shape is the real plan a video pipeline needs)."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def resize_plan(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize bookkeeping: compute target dims JVM-side (the actual
    pixel work is the stubbed codec)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.ceil(w * scale).cast("int").alias("target_width"),
        F.ceil(h * scale).cast("int").alias("target_height"),
    )
