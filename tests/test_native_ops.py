"""Native preprocessing tier (native/preprocess.cpp via io/native_ops.py)."""

import numpy as np

from meatmodeler_tpu.io import native_ops


def _ref_grey(frames, scale):
    small = frames[:, ::scale, ::scale]
    return (
        small[..., 0] * np.float32(0.114)
        + small[..., 1] * np.float32(0.587)
        + small[..., 2] * np.float32(0.299)
    ).astype(np.uint8)


def test_matches_float_formula():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 64, 80, 3), dtype=np.uint8)
    for scale in (1, 2, 4):
        got = native_ops.bgr_to_grey_down(frames, scale)
        want = _ref_grey(frames, scale)
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_native_library_builds():
    # The toolchain is part of the supported environment; the native path
    # must actually engage there (the NumPy fallback is for toolchain-less
    # installs only).
    assert native_ops.native_available()


def test_numpy_fallback_matches_native(monkeypatch):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 32, 48, 3), dtype=np.uint8)
    native = native_ops.bgr_to_grey_down(frames, 2)
    monkeypatch.setattr(native_ops, "_load_native", lambda: None)
    fallback = native_ops.bgr_to_grey_down(frames, 2)
    np.testing.assert_array_equal(native, fallback)
