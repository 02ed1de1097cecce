"""Batched-RANSAC two-view geometry tests vs ground truth and cv2."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from meatmodeler_tpu.geometry import projection, ransac, so3


def two_view_scene(n=300, outlier_frac=0.3, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    k = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    pts = rng.normal(size=(n, 3)) * 2
    pts[:, 2] += 8
    rvec = np.array([0.02, 0.25, -0.03])
    tvec = np.array([-1.5, 0.1, 0.3])
    cam0 = np.zeros(6)
    cam1 = np.concatenate([rvec, tvec])
    p1 = np.asarray(projection.project_points(pts, np.broadcast_to(cam0, (n, 6)), k))
    p2 = np.asarray(projection.project_points(pts, np.broadcast_to(cam1, (n, 6)), k))
    p1 = p1 + rng.normal(scale=noise, size=p1.shape)
    p2 = p2 + rng.normal(scale=noise, size=p2.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    p2[out_idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    is_inlier = np.ones(n, bool)
    is_inlier[out_idx] = False
    return k, rvec, tvec, p1, p2, is_inlier


class TestFundamental:
    def test_separates_inliers(self):
        k, rvec, tvec, p1, p2, gt_in = two_view_scene()
        res = ransac.find_fundamental(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jax.random.PRNGKey(0), threshold=2.0,
        )
        found = np.asarray(res.inliers)
        # Nearly all true inliers kept, nearly all outliers rejected.
        assert found[gt_in].mean() > 0.9, found[gt_in].mean()
        assert found[~gt_in].mean() < 0.1, found[~gt_in].mean()

    def test_epipolar_constraint_on_inliers(self):
        k, rvec, tvec, p1, p2, gt_in = two_view_scene(seed=1)
        res = ransac.find_fundamental(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jax.random.PRNGKey(1), threshold=2.0,
        )
        f = np.asarray(res.matrix)
        p1h = np.hstack([p1, np.ones((len(p1), 1))])
        p2h = np.hstack([p2, np.ones((len(p2), 1))])
        errs = np.abs(np.sum(p2h * (p1h @ f.T), axis=1))[gt_in]
        # Normalize by line magnitude for a geometric-ish distance.
        lines = p1h @ f.T
        d = errs / np.linalg.norm(lines[gt_in, :2], axis=1)
        assert np.median(d) < 1.5, np.median(d)


class TestEssential:
    def test_recover_pose_matches_truth(self):
        k, rvec, tvec, p1, p2, gt_in = two_view_scene(outlier_frac=0.2, seed=2)
        mask = jnp.ones(len(p1), bool)
        res = ransac.find_essential(
            jnp.asarray(p1), jnp.asarray(p2), mask, jnp.asarray(k),
            jax.random.PRNGKey(2), threshold=2.0,
        )
        r_est, t_est, votes = ransac.recover_pose(
            res.matrix, jnp.asarray(p1), jnp.asarray(p2), res.inliers, jnp.asarray(k)
        )
        r_est, t_est = np.asarray(r_est), np.asarray(t_est)
        # Rotation within a degree.
        dr = np.asarray(so3.log(so3.exp(r_est) @ np.asarray(so3.exp(rvec)).T))
        assert np.linalg.norm(dr) < np.deg2rad(1.5), dr
        # Translation direction (scale is unobservable).
        t_dir = tvec / np.linalg.norm(tvec)
        assert abs(np.dot(t_est, t_dir)) > 0.99, (t_est, t_dir)

    def test_comparable_to_cv2(self):
        k, rvec, tvec, p1, p2, gt_in = two_view_scene(seed=3)
        res = ransac.find_essential(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
            jnp.asarray(k), jax.random.PRNGKey(3), threshold=2.0,
        )
        e_cv, inl_cv = cv2.findEssentialMat(
            p1.astype(np.float64), p2.astype(np.float64), k,
            method=cv2.RANSAC, threshold=2.0,
        )
        ours = int(res.num_inliers)
        cvs = int(inl_cv.sum())
        # Within 15% of cv2's inlier count on the same data.
        assert abs(ours - cvs) <= max(5, 0.15 * cvs), (ours, cvs)
