"""Byte-identity pins for the r13 numpy-vectorized media_probe fixture
generators (_mp_wav/_mp_bmp/_mp_png in __spark_entry__.py): the oracle
predicts every probed field analytically from the generation
arithmetic, so the generated payloads must stay BIT-identical to the
original per-frame/per-pixel Python forms, reproduced here verbatim as
references. i ranges cover every modulus class the generators read
(%2/%3/%4/%8/%100; 100 ≡ 0 mod 4 makes range(200) exhaustive)."""

from __future__ import annotations

import struct
import zlib

from __spark_entry__ import _mp_bmp, _mp_png, _mp_wav


def _ref_wav(i: int) -> bytes:
    rate = 8000 + (i % 4) * 2000
    frames = 400 + i % 100
    amp = 1000 + i % 100
    data = b"".join(
        struct.pack("<h", amp if j % 2 == 0 else -amp)
        for j in range(frames)
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _ref_bmp(i: int) -> bytes:
    w, h = 16 + (i % 3) * 8, 16
    invert = i % 4 == 1
    stride = (w * 3 + 3) & ~3
    rows = []
    for _y in range(h):
        row = bytearray()
        for x in range(w):
            white = (x >= w // 2) != invert
            row += b"\xff\xff\xff" if white else b"\x00\x00\x00"
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(data), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    return hdr + info + data


def _ref_png(i: int) -> bytes:
    w, h = 16 + (i % 3) * 8, 16
    invert = i % 8 == 3
    ch = 3
    rows = []
    for _y in range(h):
        row = bytearray()
        for x in range(w):
            white = (x >= w // 2) != invert
            row += b"\xff\xff\xff" if white else b"\x00\x00\x00"
        rows.append(bytes(row))
    filtered = bytearray()
    prev = bytes(w * ch)
    for y, row in enumerate(rows):
        f = y % 5
        filtered.append(f)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                v = row[x] - pr
            filtered.append(v & 0xFF)
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", crc)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def test_wav_byte_identity():
    for i in range(0, 200, 2):
        assert _mp_wav(i) == _ref_wav(i), f"wav diverges at i={i}"


def test_bmp_byte_identity():
    for i in range(1, 200, 2):
        assert _mp_bmp(i) == _ref_bmp(i), f"bmp diverges at i={i}"


def test_png_byte_identity():
    for i in range(3, 200, 4):
        assert _mp_png(i) == _ref_png(i), f"png diverges at i={i}"
