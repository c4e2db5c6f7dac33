"""Multimodal plumbing tests: binary columns, Arrow streaming, byte budgets."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from recordmanager_spark.operators import multimodal as MM


def _media(spark, n=10, size=1000):
    rows = [(i, bytes([i % 256]) * size) for i in range(n)]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_attach_media_meta(spark):
    out = MM.attach_media_meta(_media(spark, 3, 10)).collect()
    r = next(x for x in out if x.id == 1)
    assert r.byte_len == 10
    assert r.sha256 == hashlib.sha256(b"\x01" * 10).hexdigest()


def test_extract_features_shape_and_determinism(spark):
    out = {r.id: r for r in MM.extract_features(_media(spark)).collect()}
    assert len(out) == 10
    r = out[2]
    digest = hashlib.sha256(b"\x02" * 1000).digest()
    assert r.sha256 == hashlib.sha256(b"\x02" * 1000).hexdigest()
    assert r.byte_len == 1000
    assert len(r.feature) == 8
    assert r.feature[0] == pytest.approx(digest[0] / 255.0, abs=1e-6)


def test_repartition_by_bytes(spark):
    df = _media(spark, n=8, size=100_000)  # 800 KB total
    out = MM.repartition_by_bytes(df, "payload", target_bytes=200_000)
    assert out.rdd.getNumPartitions() == 5  # ceil(800k/200k)+1 bound
    assert out.count() == 8


def test_frame_sample_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        MM.frame_sample_stub(_media(spark))


def test_decode_image_stub_deterministic():
    a = MM.decode_image_stub(b"payload")
    assert a == MM.decode_image_stub(b"payload")
    assert set(a) == {"width", "height", "channels"}
