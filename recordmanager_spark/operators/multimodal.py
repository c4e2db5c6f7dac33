"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (mime, width/height/duration, sha256). The Spark-side
plumbing — schema, batch shape, partition sizing, Arrow transfer — is real
and tested; the actual decode kernels are STUBBED (image/audio libraries
are not in this container) behind deterministic fakes / NotImplementedError
so the pipeline shape can be validated end-to-end.

Scale notes: binary payloads dominate row size, so these operators
(a) repartition by byte budget, not row count, before Python stages, and
(b) use mapInPandas (iterator form) so a partition streams through Arrow
batches without materializing fully in one pandas frame.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, payload binary, mime string, meta map<string,string>"
)

FEATURE_SCHEMA = "id long, sha256 string, byte_len int, feature array<float>"


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + sha256 of the payload."""
    return df.withColumn("byte_len", F.length(F.col(payload_col))).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def repartition_by_bytes(
    df: DataFrame, payload_col: str, target_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Repartition so each partition holds ~target_bytes of payload —
    the unit that matters for Python decode stages, not row count."""
    total = df.agg(F.sum(F.length(F.col(payload_col)))).collect()[0][0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)


def decode_image_stub(payload: bytes) -> dict:
    """STUB: real impl would use PIL/libvips. Deterministic fake derives
    "dimensions" from the payload hash so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    return {"width": 64 + h[0], "height": 64 + h[1], "channels": 3}


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: streams Arrow batches through a
    Python stage. The "feature" is a deterministic 8-float fake (STUB for
    a real CNN/audio embedding); the batch plumbing is the real thing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (missing media) hash as empty bytes instead of
            # killing the stage
            payloads = pdf[payload_col].map(lambda b: b if b is not None else b"")
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "byte_len": payloads.map(len).astype("int32"),
                    "feature": payloads.map(
                        lambda b: [
                            float(x) / 255.0
                            for x in hashlib.sha256(bytes(b)).digest()[:8]
                        ]
                    ),
                }
            )
            yield out

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling placeholder: real impl would demux + decode;
    raises to make the gap explicit rather than silently wrong."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav (not in this container); "
        "the mapInPandas pattern in extract_features is the execution shape"
    )
