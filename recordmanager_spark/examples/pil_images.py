"""JPEG (and exotic-PNG) pixel decode over an INJECTED imaging library.

Closes the perceptual-hash story for the dominant crawl image format
without polluting the stdlib-only engine: `operators/multimodal.py`
decodes every container a pure-stdlib parser can (BMP 24-bit, PNG
8-bit non-interlaced) and leaves compressed formats as an explicit
seam — JPEG entropy decoding needs libjpeg. Like the other example
clients (``examples/nominatim.py``, ``examples/solr_pusher.py``) the
dependency is INJECTED: callers pass ``pixel_decoder(payload) ->
ndarray | None``; :func:`pil_pixel_decoder` builds one from PIL when
it is importable, tests pass a deterministic fake, and the engine
itself imports neither.

The Spark stage (:func:`image_ahash`) reuses the engine's real
machinery — container sniffing, stdlib decoders, the
:func:`~recordmanager_spark.operators.multimodal.ahash64` fingerprint,
iterator-form ``mapInPandas`` streaming — so the only thing the
injected library does is turn compressed bytes into an RGB array. The
resulting 64-bit aHash feeds the banded Hamming near-dup engine
(``hamming_near_duplicates``) exactly like simhash.

Scale shape: one Arrow-batched Python scan, no shuffles; pair with
``repartition_by_bytes`` so partitions are byte-bounded (binary
payloads dominate row size). The decoder factory is resolved INSIDE
the task (a live PIL module cannot ship from the driver), same as the
Solr pusher's transport.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from recordmanager_spark.operators.multimodal import (
    ahash64,
    bmp_pixels,
    png_pixels,
    sniff_mime,
)

__all__ = ["pil_pixel_decoder", "image_ahash", "IMAGE_AHASH_SCHEMA"]

PixelDecoder = Callable[[bytes], Optional[np.ndarray]]

IMAGE_AHASH_SCHEMA = (
    "id long, mime string, width int, height int, ahash string"
)


def pil_pixel_decoder() -> PixelDecoder:
    """Build a pixel decoder from PIL/Pillow (raises ImportError when
    Pillow is not installed — the caller decides whether that is fatal).
    Returns RGB uint8 (H, W, 3); undecodable payloads return None
    instead of raising, so one corrupt image never kills a stage."""
    import io

    from PIL import Image  # noqa: F401 — the injected dependency

    def decode(payload: bytes) -> Optional[np.ndarray]:
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)
        except Exception:
            return None

    return decode


def image_ahash(
    df: DataFrame,
    decoder_factory: Callable[[], PixelDecoder] = pil_pixel_decoder,
    payload_col: str = "payload",
    id_col: str = "id",
) -> DataFrame:
    """(id, mime, width, height, ahash): perceptual fingerprints for
    EVERY decodable image — stdlib decoders for BMP/plain-PNG, the
    injected decoder for JPEG/WebP/exotic PNGs. ``decoder_factory`` is
    called once per task (not per row, not on the driver); pass
    :func:`pil_pixel_decoder` in deployments, a fake in tests."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decoder_factory()
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(b) if b is not None else b""
                mime = sniff_mime(p)
                img = None
                if mime == "image/bmp":
                    img = bmp_pixels(p)
                elif mime == "image/png":
                    img = png_pixels(p)
                if img is None and mime is not None and mime.startswith(
                    "image/"
                ):
                    img = decode(p)
                if img is not None and img.ndim == 3 and img.size:
                    rows.append(
                        (rid, mime, img.shape[1], img.shape[0], ahash64(img))
                    )
                else:
                    rows.append((rid, mime, None, None, None))
            out = pd.DataFrame(
                rows, columns=["id", "mime", "width", "height", "ahash"]
            )
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return df.mapInPandas(op, schema=IMAGE_AHASH_SCHEMA)
