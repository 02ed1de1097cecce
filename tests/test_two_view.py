"""Marker-free two-view reconstruction tests.

Two regimes, asserted separately:

* Well-posed geometry (spread 3D structure, known correspondences): the
  LO-RANSAC pose MUST match ground truth tightly — this is the correctness
  bar for ``estimate_relative_pose``.
* Real ORB matches on the synthetic turntable (narrow ~7-degree baseline,
  compact quasi-planar object): translation direction is fundamentally
  ill-conditioned — cv2's 5-point RANSAC swings between 1 and 118 degrees
  of error across adjacent pairs of this very sequence. Here the asserted
  contract is model quality (consensus, residuals, cheirality), not
  absolute pose accuracy.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from meatmodeler_tpu.config import DEFAULT_CONFIG, MatcherConfig, OrbConfig
from meatmodeler_tpu.geometry import projection, ransac, so3
from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence
from meatmodeler_tpu.two_view import reconstruct_two_view

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    orb=OrbConfig(num_features=1536, num_levels=2),
    matcher=MatcherConfig(max_matches=512),
)

SCENE = TurntableScene(image_size=(400, 300), focal=420.0, noise_sigma=0.5)


def _relative_pose(p1, p2):
    """GT camera-2-from-camera-1 (R, t) from world-to-camera [rvec, tvec]."""
    r1, r2 = np.asarray(so3.exp(p1[:3])), np.asarray(so3.exp(p2[:3]))
    t1, t2 = p1[3:], p2[3:]
    r_rel = r2 @ r1.T
    t_rel = t2 - r_rel @ t1
    return r_rel, t_rel


class TestEstimateRelativePoseWellPosed:
    """Spread structure + known correspondences -> tight pose recovery."""

    def _scene(self, noise, seed=0):
        rng = np.random.default_rng(seed)
        _, poses, _ = render_sequence(SCENE, 4, seed=3)
        k = SCENE.intrinsics
        ctr = np.array(SCENE.ellipsoid_center)
        pts = np.concatenate(
            [
                ctr + rng.normal(size=(150, 3)) * np.array(SCENE.ellipsoid_axes),
                np.array([3.0, 0.0, 2.0]) + rng.normal(size=(50, 3)) * [3, 0.01, 2],
            ]
        )
        p0, p1 = poses[0], poses[1]
        n = len(pts)
        x1 = np.array(projection.project_points(pts, np.broadcast_to(p0, (n, 6)), k))
        x2 = np.array(projection.project_points(pts, np.broadcast_to(p1, (n, 6)), k))
        x1 = x1 + rng.normal(scale=noise, size=x1.shape)
        x2 = x2 + rng.normal(scale=noise, size=x2.shape)
        return k, p0, p1, x1, x2

    def test_recovers_pose(self):
        k, p0, p1, x1, x2 = self._scene(noise=0.5)
        rv, tv, res = ransac.estimate_relative_pose(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1), bool),
            jnp.asarray(k), jax.random.PRNGKey(0),
        )
        r_rel, t_rel = _relative_pose(p0, p1)
        t_gt = t_rel / np.linalg.norm(t_rel)
        r_est = np.asarray(so3.exp(rv))
        cos = (np.trace(r_est @ r_rel.T) - 1.0) / 2.0
        rot_err = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
        t_err = np.degrees(np.arccos(np.clip(np.dot(t_gt, np.asarray(tv)), -1, 1)))
        assert rot_err < 1.5, rot_err
        assert t_err < 6.0, t_err
        assert int(res.num_inliers) > 180

    def test_robust_to_outliers(self):
        k, p0, p1, x1, x2 = self._scene(noise=0.5, seed=1)
        rng = np.random.default_rng(2)
        out = rng.choice(len(x1), 60, replace=False)
        x2[out] = rng.uniform([0, 0], [400, 300], size=(60, 2))
        rv, tv, res = ransac.estimate_relative_pose(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1), bool),
            jnp.asarray(k), jax.random.PRNGKey(0),
        )
        r_rel, t_rel = _relative_pose(p0, p1)
        t_gt = t_rel / np.linalg.norm(t_rel)
        r_est = np.asarray(so3.exp(rv))
        cos = (np.trace(r_est @ r_rel.T) - 1.0) / 2.0
        rot_err = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
        t_err = np.degrees(np.arccos(np.clip(np.dot(t_gt, np.asarray(tv)), -1, 1)))
        assert rot_err < 2.0, rot_err
        assert t_err < 8.0, t_err
        # Planted outliers rejected.
        found = np.asarray(res.inliers)
        assert found[out].mean() < 0.15, found[out].mean()


@pytest.fixture(scope="module")
def two_view_run():
    frames, poses, _ = render_sequence(SCENE, 8, seed=3)
    res = reconstruct_two_view(frames[0], frames[1], SCENE.intrinsics, config=CFG)
    return res, poses[0], poses[1]


@pytest.mark.slow
class TestTwoViewImages:
    def test_enough_inliers(self, two_view_run):
        res, _, _ = two_view_run
        assert int(res.num_inliers) > 30, int(res.num_inliers)

    def test_model_explains_matches(self, two_view_run):
        """The winning essential matrix must fit its inliers to sub-pixel
        Sampson error (model quality is well-defined even when the pose
        direction is ill-conditioned at this baseline)."""
        res, _, _ = two_view_run
        inl = np.asarray(res.inliers)
        k = SCENE.intrinsics
        n1 = (np.asarray(res.pts1) - k[:2, 2]) / [k[0, 0], k[1, 1]]
        n2 = (np.asarray(res.pts2) - k[:2, 2]) / [k[0, 0], k[1, 1]]
        x1 = np.hstack([n1, np.ones((len(n1), 1))])
        x2 = np.hstack([n2, np.ones((len(n2), 1))])
        e = np.asarray(res.essential)
        ex1 = x1 @ e.T
        etx2 = x2 @ e
        d2 = np.sum(x2 * ex1, 1) ** 2 / np.maximum(
            ex1[:, 0] ** 2 + ex1[:, 1] ** 2 + etx2[:, 0] ** 2 + etx2[:, 1] ** 2, 1e-12
        )
        sampson_px = np.sqrt(d2[inl]) * SCENE.focal
        assert np.median(sampson_px) < 1.0, np.median(sampson_px)

    def test_rotation_sane(self, two_view_run):
        """Rotation magnitude must be in the right regime (the GT step is
        ~7 degrees; reject wild or degenerate estimates)."""
        res, p1, p2 = two_view_run
        r_rel, _ = _relative_pose(p1, p2)
        r_est = np.asarray(so3.exp(res.rvec))
        cos = (np.trace(r_est @ r_rel.T) - 1.0) / 2.0
        angle_err = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
        # cv2's 5-point on adjacent pairs of this sequence errs 0.3-48 deg;
        # hold ours to the same practical envelope.
        assert angle_err < 45.0, angle_err

    def test_points_in_front(self, two_view_run):
        res, _, _ = two_view_run
        pts = np.asarray(res.points)[np.asarray(res.inliers)]
        assert (pts[:, 2] > 0).all()
        assert np.isfinite(pts).all()
