"""examples/pil_images.py — injected-decoder JPEG aHash over the real
mapInPandas plumbing, with a deterministic fake decoder (Pillow is not
in this container; the example's contract is the injection seam)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from recordmanager_spark.examples.pil_images import (
    IMAGE_AHASH_SCHEMA,
    image_ahash,
)
from recordmanager_spark.operators.multimodal import ahash64, bmp_pixels
from tests.test_multimodal import make_bmp, make_jpeg


def gradient(x, y):
    return (min(255, 32 * x), min(255, 32 * y), 0)


def _make_fake_factory():
    """Deterministic stand-in for pil_pixel_decoder: derives an 8x8
    'image' from the payload bytes — same shape contract (RGB uint8
    (H, W, 3) or None). Built as a closure so cloudpickle ships it by
    VALUE to executors (the tests package is not on their sys.path —
    exactly the constraint a real deployment's decoder factory faces)."""

    def fake_decoder_factory():
        import numpy as _np

        def decode(payload: bytes):
            if len(payload) < 4:
                return None
            seed = _np.frombuffer(
                payload[-8:].ljust(8, b"\0"), dtype=_np.uint8
            )
            img = _np.tile(seed, 24).reshape(8, 8, 3)
            return img.astype(_np.uint8)

        return decode

    return fake_decoder_factory


def test_image_ahash_routes_and_fingerprints(spark):
    fake = _make_fake_factory()
    bmp = make_bmp(16, 16, gradient)
    jpg = make_jpeg(7, 8)
    rows = [
        (1, bytearray(bmp)),
        (2, bytearray(jpg)),
        (3, bytearray(b"not an image")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in image_ahash(df, fake).collect()}

    # BMP went through the STDLIB decoder (exact pixels, not the fake)
    assert out[1].mime == "image/bmp"
    assert (out[1].width, out[1].height) == (16, 16)
    assert out[1].ahash == ahash64(bmp_pixels(bmp))

    # JPEG went through the INJECTED decoder
    assert out[2].mime == "image/jpeg"
    assert (out[2].width, out[2].height) == (8, 8)
    assert out[2].ahash == ahash64(fake()(jpg))

    # non-images and NULL payloads yield NULL fields, never a crash
    assert out[3].ahash is None and out[3].mime is None
    assert out[4].ahash is None

    assert image_ahash(df, fake).schema.simpleString() == (
        spark.createDataFrame([], IMAGE_AHASH_SCHEMA).schema.simpleString()
    )


def test_ahash_feeds_hamming_neardup(spark):
    """The example's output plugs straight into the banded Hamming
    engine: near-identical images land in the same near-dup pair."""
    from recordmanager_spark.operators.text_dedup import (
        hamming_near_duplicates,
    )

    fake = _make_fake_factory()
    base = make_bmp(16, 16, gradient)
    near = make_bmp(16, 16, lambda x, y: gradient(x, y) if (x, y) != (0, 0)
                    else (255, 255, 255))
    far = make_bmp(16, 16, lambda x, y: gradient(15 - x, 15 - y))
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(near)), (3, bytearray(far))],
        "id long, payload binary",
    )
    hashed = image_ahash(df, fake).where(
        F.col("ahash").isNotNull()
    ).select("id", F.conv("ahash", 16, 10).cast("long").alias("h"))
    pairs = hamming_near_duplicates(
        hashed, id_col="id", hash_col="h", total_bits=64, max_hamming=3
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_pil_factory_raises_cleanly_without_pillow():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; the live path is exercised for real")
    except ImportError:
        pass
    from recordmanager_spark.examples.pil_images import pil_pixel_decoder

    with pytest.raises(ImportError):
        pil_pixel_decoder()
