"""Video frame sampling over an INJECTED decoder — the last multimodal
seam, closed with the same pattern as ``examples/pil_images.py``.

The engine's pure-stdlib media probe (`operators/multimodal.py`) stops
at container metadata for video: demuxing + H.264/VP9 decode need
ffmpeg/PyAV, which are not importable in every deployment (and not in
this container). Instead of a hard dependency the decoder is INJECTED:
callers pass ``frame_sampler(payload, n) -> list[ndarray]``;
:func:`pyav_frame_sampler` builds one from PyAV when it is importable,
tests pass a deterministic fake, and the engine itself imports
neither (reference parity: RecordManager treats media the same way —
payloads opaque, external tooling optional; conf/recordmanager.ini
wires such helpers per deployment).

Each sampled frame is fingerprinted with the engine's real
:func:`~recordmanager_spark.operators.multimodal.ahash64` and fed to
the banded Hamming near-dup engine
(:func:`~recordmanager_spark.operators.text_dedup.
hamming_near_duplicates`), so near-duplicate VIDEOS surface as videos
sharing many near-duplicate frames — re-encodes, resolution changes,
and watermarks survive aHash, exact-byte dedup does not catch them.

Scale shape: frame extraction is one Arrow-batched Python scan (no
shuffles; pair with ``repartition_by_bytes`` so partitions are
byte-bounded — video payloads dominate row size). The frame-hash
table is ``n_frames`` rows per video (tiny next to the payloads);
everything downstream — banding, bucket caps, the video-level match
aggregation — is the already-audited bounded-state pair engine.

The sampler factory resolves INSIDE the task (a live PyAV/ffmpeg
handle cannot ship from the driver) — the Solr pusher transport
pattern.
"""

from __future__ import annotations

from typing import Callable, Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recordmanager_spark.operators.multimodal import ahash64

__all__ = [
    "pyav_frame_sampler",
    "video_frame_ahashes",
    "video_near_duplicates",
    "FRAME_AHASH_SCHEMA",
]

FrameSampler = Callable[[bytes, int], List[np.ndarray]]

FRAME_AHASH_SCHEMA = "id long, frame int, ahash long"


def pyav_frame_sampler() -> FrameSampler:
    """Build a frame sampler from PyAV (raises ImportError when PyAV is
    not installed — the caller decides whether that is fatal). Samples
    ``n`` frames uniformly across the stream; undecodable payloads
    return [] instead of raising, so one corrupt video never kills a
    stage."""
    import io

    import av  # noqa: F401 — the injected dependency

    def sample(payload: bytes, n: int) -> List[np.ndarray]:
        try:
            with av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                total = stream.frames or 0
                want = (
                    set(range(n))
                    if total <= n
                    else {int(i * total / n) for i in range(n)}
                )
                out: List[np.ndarray] = []
                for idx, frame in enumerate(container.decode(stream)):
                    if idx in want:
                        out.append(frame.to_ndarray(format="rgb24"))
                    if len(out) >= n:
                        break
                return out
        except Exception:
            return []

    return sample


def video_frame_ahashes(
    df: DataFrame,
    sampler_factory: Callable[[], FrameSampler] = pyav_frame_sampler,
    n_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "id",
) -> DataFrame:
    """(id, frame, ahash): one signed-64-bit perceptual fingerprint per
    sampled frame. ``sampler_factory`` is called once per task (not per
    row, not on the driver); pass :func:`pyav_frame_sampler` in
    deployments, a deterministic fake in tests. Videos that decode to
    zero frames contribute zero rows (they can never pair — the honest
    outcome for undecodable payloads)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sample = sampler_factory()
        for pdf in batches:
            ids: list = []
            fidx: list = []
            hashes: list = []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(b) if b is not None else b""
                for i, frame in enumerate(sample(p, n_frames)):
                    h = int(ahash64(frame), 16)
                    ids.append(rid)
                    fidx.append(i)
                    # to signed 64-bit so the value fits a Spark LONG
                    hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame": pd.Series(fidx, dtype="int32"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.mapInPandas(op, schema=FRAME_AHASH_SCHEMA)


def video_near_duplicates(
    frames: DataFrame,
    max_hamming: int = 3,
    min_matching_frames: int = 2,
) -> DataFrame:
    """(id_a, id_b, n_frame_matches): video pairs whose sampled frames
    contain at least ``min_matching_frames`` cross-video near-duplicate
    frame pairs (aHash Hamming distance <= ``max_hamming``).

    Each (video, frame) fingerprint is an item in the banded Hamming
    engine; the frame-pair hits aggregate map-side-combinably to video
    pairs, so state per (video_a, video_b) group is one counter. The
    aggregation inherits nothing corpus-sized: the pair table is
    bounded by the bucket caps upstream."""
    from recordmanager_spark.operators.text_dedup import (
        hamming_near_duplicates,
    )

    items = frames.select(
        # frame items need unique ids: (video_id << 16) | frame index.
        # 16 bits of frame budget; video ids stay comparable so the
        # id_a < id_b orientation groups consistently.
        (F.col("id").cast("long") * F.lit(65536) + F.col("frame")).alias(
            "fid"
        ),
        F.col("ahash"),
    )
    pairs = hamming_near_duplicates(
        items, id_col="fid", hash_col="ahash", max_hamming=max_hamming
    )
    vids = pairs.select(
        # integer div (not /): float division loses bits past 2^53
        F.expr("id_a div 65536").alias("vid_a"),
        F.expr("id_b div 65536").alias("vid_b"),
    ).where(F.col("vid_a") != F.col("vid_b"))
    agg = (
        vids.select(
            F.least("vid_a", "vid_b").alias("id_a"),
            F.greatest("vid_a", "vid_b").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_frame_matches"))
    )
    return agg.where(F.col("n_frame_matches") >= min_matching_frames)
