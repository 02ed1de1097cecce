"""Marker-free visual odometry vs the synthetic turntable ground truth."""

import numpy as np
import pytest

from meatmodeler_tpu.geometry import so3
from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence
from meatmodeler_tpu.odometry import chain_poses

SCENE = TurntableScene(image_size=(400, 300), focal=420.0, noise_sigma=0.5)
N_FRAMES = 10


@pytest.fixture(scope="module")
def odo_run():
    frames, gt_poses, _ = render_sequence(SCENE, N_FRAMES, seed=3)
    res = chain_poses(frames, SCENE.intrinsics)
    return res, gt_poses


@pytest.mark.slow
class TestOdometry:
    def test_tracks_survive(self, odo_run):
        res, _ = odo_run
        assert (res.num_tracked[1:] > 50).all(), res.num_tracked
        assert (res.num_inliers[1:] > 30).all(), res.num_inliers

    def test_rotation_chain_matches_gt(self, odo_run):
        """Chained rotations must follow the ground-truth orbit (rotation is
        scale-free, so this is the strong odometry assertion)."""
        res, gt = odo_run
        r0_est = np.asarray(so3.exp(res.poses[0][:3]))
        r0_gt = np.asarray(so3.exp(gt[0][:3]))
        errs = []
        for t in range(1, N_FRAMES):
            r_est = np.asarray(so3.exp(res.poses[t][:3])) @ r0_est.T
            r_gt = np.asarray(so3.exp(gt[t][:3])) @ r0_gt.T
            cos = (np.trace(r_est @ r_gt.T) - 1.0) / 2.0
            errs.append(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
        # Total orbit over 10 frames is ~28 degrees; drift stays small.
        assert max(errs) < 6.0, errs

    def test_translation_directions(self, odo_run):
        """Per-step camera-center motion must follow the orbit tangent."""
        res, gt = odo_run

        def centers(poses):
            cs = []
            for p in poses:
                r = np.asarray(so3.exp(p[:3]))
                cs.append(-r.T @ p[3:])
            return np.stack(cs)

        c_est = centers(res.poses)
        c_gt = centers(gt)
        # Compare step directions in the GLOBAL frames (each is anchored to
        # its own frame-0 camera; rotate estimated steps into gt frame 0).
        r_align = np.asarray(so3.exp(gt[0][:3])).T @ np.asarray(so3.exp(res.poses[0][:3]))
        errs = []
        for t in range(1, N_FRAMES):
            d_est = r_align @ (c_est[t] - c_est[t - 1])
            d_gt = c_gt[t] - c_gt[t - 1]
            cosang = np.dot(d_est, d_gt) / (
                np.linalg.norm(d_est) * np.linalg.norm(d_gt) + 1e-12
            )
            errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        assert np.median(errs) < 20.0, errs

    def test_scale_consistency(self, odo_run):
        """Chained step lengths must stay proportional to ground truth (the
        orbit has constant speed, so scales should be near-constant)."""
        res, _ = odo_run
        steps = []
        for t in range(1, N_FRAMES):
            steps.append(np.linalg.norm(res.scales[t]))
        steps = np.asarray(steps)
        assert steps.std() / steps.mean() < 0.35, steps
