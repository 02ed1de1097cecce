"""Umeyama similarity alignment + XProf device-time summarizer units."""

import numpy as np
import pytest

from meatmodeler_tpu.utils.alignment import SimilarityTransform, aligned_rmse, umeyama


def _random_rotation(rng) -> np.ndarray:
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    r = u @ vt
    if np.linalg.det(r) < 0:
        r[:, 2] *= -1
    return r


class TestUmeyama:
    def test_recovers_known_similarity(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(50, 3))
        r = _random_rotation(rng)
        s, t = 2.37, np.array([1.0, -2.0, 0.5])
        dst = s * src @ r.T + t
        tf = umeyama(src, dst)
        assert abs(tf.scale - s) < 1e-9
        np.testing.assert_allclose(tf.rotation, r, atol=1e-9)
        np.testing.assert_allclose(tf.translation, t, atol=1e-9)
        assert aligned_rmse(src, dst) < 1e-9

    def test_rigid_mode_fixes_scale(self):
        rng = np.random.default_rng(1)
        src = rng.normal(size=(20, 3))
        dst = 3.0 * src
        tf = umeyama(src, dst, with_scale=False)
        assert tf.scale == 1.0

    def test_rotation_is_proper_under_reflection(self):
        """A reflected correspondence must yield det(R) = +1 (the sign trick),
        never a reflection disguised as a rotation."""
        rng = np.random.default_rng(2)
        src = rng.normal(size=(30, 3))
        dst = src * np.array([1.0, 1.0, -1.0])  # mirror
        tf = umeyama(src, dst)
        assert np.linalg.det(tf.rotation) > 0.99

    def test_noise_robust(self):
        rng = np.random.default_rng(3)
        src = rng.normal(size=(200, 3)) * 5
        r = _random_rotation(rng)
        dst = 0.5 * src @ r.T + 1.0 + rng.normal(scale=0.01, size=src.shape)
        tf = umeyama(src, dst)
        assert abs(tf.scale - 0.5) < 0.01
        assert aligned_rmse(src, dst) < 0.02

    def test_apply_matches_definition(self):
        tf = SimilarityTransform(2.0, np.eye(3), np.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(
            tf.apply(np.array([[1.0, 2.0, 3.0]])), [[3.0, 4.0, 6.0]]
        )


class TestXplaneSummary:
    def test_summarizes_cpu_trace(self, tmp_path):
        """End-to-end: capture a real (CPU) JAX trace and summarize it.
        Skips when the xplane proto schema is not installed."""
        from meatmodeler_tpu.utils import xplane

        if xplane._load_pb2() is None:
            pytest.skip("xplane_pb2 schema unavailable")
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x @ x)
        x = jnp.ones((256, 256))
        f(x).block_until_ready()  # compile outside the capture
        jax.profiler.start_trace(str(tmp_path))
        f(x).block_until_ready()
        jax.profiler.stop_trace()
        summary = xplane.device_time_summary(str(tmp_path))
        assert summary is not None
        assert summary["total_device_s"] > 0
        assert summary["modules"], summary

    def test_missing_trace_returns_none(self, tmp_path):
        from meatmodeler_tpu.utils import xplane

        assert xplane.device_time_summary(str(tmp_path)) is None
