"""Injected-sampler video frame pipeline (examples/video_frames.py):
the deterministic fake stands in for PyAV exactly like the fake pixel
decoder in test_pil_images_example.py — the Spark plumbing (Arrow
batches, per-task factory resolution, frame-id packing, Hamming
aggregation) is the real thing."""

from __future__ import annotations

import pytest

from recordmanager_spark.examples import video_frames as VF


_PATTERNS = [0x0F0F0F0F0F0F0F0F, 0xAAAA5555AAAA5555, 0x00FF00FF00FF00FF]


def _make_sampler_factory():
    """payload[0] selects the video family; family 0 and 1 render the
    same patterns (1 with a single perturbed cell per frame), family 2
    renders inverted patterns — near-dups by construction. Built as a
    nested closure so cloudpickle ships it by VALUE to executors (the
    tests package is not on their sys.path — the same constraint a real
    deployment's sampler factory faces), with the frame renderer
    inlined for the same reason."""

    def sampler_factory():
        import numpy as _np

        patterns = [0x0F0F0F0F0F0F0F0F, 0xAAAA5555AAAA5555, 0x00FF00FF00FF00FF]

        def frame(pattern, noise_cell):
            img = _np.zeros((32, 32, 3), dtype=_np.uint8)
            for cell in range(64):
                r, c = divmod(cell, 8)
                bit = (pattern >> (63 - cell)) & 1
                if noise_cell is not None and cell == noise_cell:
                    bit = 1 - bit
                img[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4, :] = (
                    220 if bit else 30
                )
            return img

        def sample(payload: bytes, n: int):
            fam = payload[0] if payload else 255
            if fam == 255:
                return []  # undecodable
            out = []
            for i in range(min(n, len(patterns))):
                pat = patterns[i]
                if fam == 2:
                    pat ^= (1 << 64) - 1
                out.append(frame(pat, i if fam == 1 else None))
            return out

        return sample

    return sampler_factory


@pytest.fixture()
def videos(spark):
    rows = [
        (0, bytearray([0, 1, 2, 3])),
        (1, bytearray([1, 9, 9])),
        (2, bytearray([2, 7])),
        (3, bytearray([])),  # undecodable -> zero frames
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_frame_ahashes_shape_and_determinism(spark, videos):
    out = VF.video_frame_ahashes(
        videos, sampler_factory=_make_sampler_factory(), n_frames=3
    )
    rows = {(r.id, r.frame): r.ahash for r in out.collect()}
    # 3 decodable videos x 3 frames; the empty payload contributes none
    assert len(rows) == 9
    assert all((3, i) not in rows for i in range(3))
    # family 0 frame hashes equal the patterns themselves (signed64)
    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    for i, pat in enumerate(_PATTERNS):
        assert rows[(0, i)] == signed(pat)
        # family 1 differs in exactly one bit per frame
        assert bin((rows[(1, i)] ^ rows[(0, i)]) & ((1 << 64) - 1)).count(
            "1"
        ) == 1
        # family 2 is the bitwise inverse: Hamming 64
        assert (rows[(2, i)] ^ rows[(0, i)]) & ((1 << 64) - 1) == (
            1 << 64
        ) - 1


def test_video_near_duplicates_groups_families(spark, videos):
    frames = VF.video_frame_ahashes(
        videos, sampler_factory=_make_sampler_factory(), n_frames=3
    )
    pairs = VF.video_near_duplicates(
        frames, max_hamming=3, min_matching_frames=2
    ).collect()
    assert [(r.id_a, r.id_b, r.n_frame_matches) for r in pairs] == [(0, 1, 3)]


def test_video_near_duplicates_min_frames_gate(spark, videos):
    frames = VF.video_frame_ahashes(
        videos, sampler_factory=_make_sampler_factory(), n_frames=3
    )
    none = VF.video_near_duplicates(
        frames, max_hamming=3, min_matching_frames=4
    ).collect()
    assert none == []


def test_stub_names_the_example(spark, videos):
    from recordmanager_spark.operators.multimodal import frame_sample_stub

    with pytest.raises(NotImplementedError, match="video_frames"):
        frame_sample_stub(videos)
