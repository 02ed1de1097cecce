"""Native C++ y4m loader vs NumPy fallback: build, round-trip, parity."""

import numpy as np
import pytest

from meatmodeler_tpu.io import y4m
from meatmodeler_tpu.io.video import FrameSource


def make_frames(t=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth frames: YUV 4:2:0 is lossy on noise, smooth content round-trips.
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(t):
        base = 120 + 80 * np.sin((yy + 5 * i) / 11.0) * np.cos(xx / 13.0)
        frames.append(
            np.stack([base, base * 0.8 + 20, base * 1.1], axis=-1).clip(0, 255)
        )
    return np.stack(frames).astype(np.uint8)


class TestY4m:
    def test_native_builds(self):
        assert y4m.native_available(), "g++ build of the native loader failed"

    def test_round_trip_444(self, tmp_path):
        frames = make_frames()
        p = tmp_path / "v.y4m"
        y4m.write_y4m(p, frames, colorspace="444")
        back = y4m.read_y4m(p)
        assert back.shape == frames.shape
        # BT.601 integer forward+inverse: a couple of levels of error.
        assert np.abs(back.astype(int) - frames.astype(int)).mean() < 3.0

    def test_native_matches_numpy(self, tmp_path):
        if not y4m.native_available():
            pytest.skip("no native loader")
        frames = make_frames(seed=1)
        p = tmp_path / "v.y4m"
        y4m.write_y4m(p, frames, colorspace="420")
        nat = y4m.read_y4m(p)
        ref = y4m._read_y4m_numpy(p)
        np.testing.assert_array_equal(nat, ref)

    def test_frame_source_integration(self, tmp_path):
        frames = make_frames(seed=2)
        p = tmp_path / "v.y4m"
        y4m.write_y4m(p, frames, colorspace="444")
        src = FrameSource(p)
        total = sum(len(c) for c in src.chunks(4))
        assert total == len(frames)

    def test_empty_and_bad_header(self, tmp_path):
        bad = tmp_path / "bad.y4m"
        bad.write_bytes(b"NOT A Y4M\n")
        with pytest.raises(Exception):
            y4m._read_y4m_numpy(bad)
