"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio codecs, so DECODING is stubbed behind
a deterministic fake (clearly marked); everything Spark-side — schema,
Arrow batch shape, mapInPandas partitioning, metadata typing — is real
and tested. Swapping the stub for PIL/torchaudio is a one-function
change on a real cluster.

Design: media rows are ``(id, media_type, payload binary, meta
struct)``; per-batch processing uses mapInPandas (Arrow-batched,
never per-row Python), the pattern the north rule mandates for
logic Spark exprs can't express.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from getl_spark.schema import parse_ddl

MEDIA_SCHEMA = parse_ddl(
    "media_id bigint, media_type string, payload binary, width int, height int, sample_rate int"
)

FEATURE_SCHEMA = parse_ddl(
    "media_id bigint, media_type string, n_bytes bigint, sha256 string, feat array<float>"
)


def synth_media(spark, n: int = 100, seed: int = 5) -> DataFrame:
    """Deterministic fake media rows: payload = seeded pseudo-bytes."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
            ).alias("media_type"),
            F.unhex(F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 512))
            .alias("payload"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        )
    )


def _decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB — the real implementation calls PIL / torchaudio / ffmpeg.

    Deterministic fake 'decoded features': 8 floats derived from the
    payload's sha256 so tests are stable and the Arrow plumbing is
    exercised with realistic shapes. Raises for unknown media types
    exactly as a real decoder would.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    h = hashlib.sha256(payload).digest()
    return [v / 65535.0 for (v,) in _struct.iter_unpack(">H", h[:16])]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch is one pandas frame; the decode stub
    is vectorized with .map (pure CPU, no per-row Python<->JVM hops).
    """

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feat": [
                        _decode_stub(bytes(p), t)
                        for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(proc, FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (real); the pixel work would
    happen in the decode stub's replacement."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return media.withColumn("target_w", (F.col("width") * scale).cast("int")).withColumn(
        "target_h", (F.col("height") * scale).cast("int")
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0, duration_s: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: timestamps to extract (column
    math; extraction itself belongs to the decoder stub)."""
    n = int(fps * duration_s)
    return media.filter(F.col("media_type") == "video").withColumn(
        "frame_ts", F.expr(f"sequence(0, {n - 1})")
    ).withColumn("frame_ts", F.transform("frame_ts", lambda i: i / F.lit(fps)))
