"""Parity pins for the r13 vectorized multimodal internals.

ahash64's 8x8 pooling moved from 64 per-cell ``.mean()`` calls to one
``np.add.reduceat`` pass (summation order differs by <=1 ulp in the
cell means); png_pixels' Sub filter moved to an exact int64 cumsum and
Average/Paeth to a plain-Python-int loop. These tests pin the outputs
against (a) the pre-rewrite reference implementation and (b) ground
truth: a spec-correct PNG encoder over random pixels, where the decode
must reproduce the exact input plane for every filter type.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from recordmanager_spark.operators.multimodal import ahash64, png_pixels


def _ref_ahash64(img: np.ndarray) -> str:
    """The pre-r13 per-cell-mean implementation, verbatim."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            cells[r, c] = gray[ys[r]:ys[r + 1], xs[c]:xs[c + 1]].mean()
    bits = (cells >= cells.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:016x}"


def test_ahash64_matches_reference_on_fixture_shapes():
    # the media_probe fixture family: half-white/half-black, w % 8 == 0
    for w in (16, 24, 32):
        for invert in (False, True):
            img = np.zeros((16, w, 3), dtype=np.uint8)
            img[:, w // 2:, :] = 255
            if invert:
                img = 255 - img
            assert ahash64(img) == _ref_ahash64(img)


def test_ahash64_matches_reference_on_random_images():
    rng = np.random.default_rng(13)
    for _ in range(300):
        h = int(rng.integers(3, 41))
        w = int(rng.integers(3, 41))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert ahash64(img) == _ref_ahash64(img)


def _encode_png(px: np.ndarray, filters: list[int], ch: int = 3) -> bytes:
    """Spec-correct PNG encoder (the entry-fixture device generalized):
    filter type per row from ``filters``, raw-byte predictors."""
    h, w = px.shape[0], px.shape[1]
    flat = px.reshape(h, w * ch).astype(np.int32)
    filtered = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        f = filters[y % len(filters)]
        filtered.append(f)
        a = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
        b = prev
        c = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - a
        elif f == 2:
            enc = row - b
        elif f == 3:
            enc = row - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pr = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            enc = row - pr
        filtered.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)

    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def test_png_pixels_roundtrips_every_filter_type():
    rng = np.random.default_rng(131)
    for trial in range(60):
        h = int(rng.integers(2, 24))
        w = int(rng.integers(2, 24))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        # per-trial: one fixed filter type, then the cycling mix
        filters = (
            [trial % 5] if trial < 30 else [0, 1, 2, 3, 4]
        )
        out = png_pixels(_encode_png(px, filters))
        assert out is not None
        np.testing.assert_array_equal(out, px)


def test_png_pixels_gray_and_rgba_roundtrip():
    rng = np.random.default_rng(7)
    # grayscale replicates to 3 channels
    g = rng.integers(0, 256, size=(9, 11, 1), dtype=np.uint8)
    out = png_pixels(_encode_png(g, [0, 1, 2, 3, 4], ch=1))
    np.testing.assert_array_equal(out, np.repeat(g, 3, axis=2))
    # RGBA drops alpha
    a = rng.integers(0, 256, size=(7, 5, 4), dtype=np.uint8)
    out = png_pixels(_encode_png(a, [4, 3, 1], ch=4))
    np.testing.assert_array_equal(out, a[..., :3])
