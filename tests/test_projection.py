"""Projection residual kernel vs a NumPy re-run of the reference semantics.

The oracle below re-implements rotate/project exactly as described in
SURVEY.md §2.1 (bundleAdjuster.py:7-52) in NumPy, then our JAX version is held
to it. (Per the build rules the reference file itself is not imported.)
"""

import numpy as np
import cv2

from meatmodeler_tpu.geometry import projection, so3


def oracle_rotate(points, rot_vecs):
    theta = np.linalg.norm(rot_vecs, axis=1)[:, np.newaxis]
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.nan_to_num(rot_vecs / theta)
    dot = np.sum(points * v, axis=1)[:, np.newaxis]
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    return cos_t * points + sin_t * np.cross(v, points) + dot * (1 - cos_t) * v


def oracle_project(points, frame_params, K):
    p = oracle_rotate(points, frame_params[:, :3]) + frame_params[:, 3:6]
    p = np.einsum("ij,...j", K, p)
    return p[:, :2] / p[:, -1, np.newaxis]


def make_problem(n=256, seed=0):
    rng = np.random.default_rng(seed)
    points = rng.normal(size=(n, 3)) * 3.0
    points[:, 2] += 10.0
    rvecs = rng.normal(size=(n, 3)) * 0.5
    tvecs = rng.normal(size=(n, 3))
    tvecs[:, 2] += 12.0
    params = np.hstack([rvecs, tvecs])
    K = np.array([[800.0, 0, 640], [0, 820.0, 360], [0, 0, 1]])
    return points, params, K


class TestRotate:
    def test_matches_oracle(self):
        points, params, _ = make_problem()
        ours = np.asarray(projection.rotate_points(points, params[:, :3]))
        np.testing.assert_allclose(ours, oracle_rotate(points, params[:, :3]), atol=1e-6)

    def test_zero_rotation(self):
        points = np.random.default_rng(1).normal(size=(16, 3))
        out = np.asarray(projection.rotate_points(points, np.zeros((16, 3))))
        np.testing.assert_allclose(out, points, atol=1e-12)

    def test_agrees_with_matrix_rotation(self):
        points, params, _ = make_problem(64, seed=2)
        rs = np.asarray(so3.exp(params[:, :3]))
        expected = np.einsum("nij,nj->ni", rs, points)
        ours = np.asarray(projection.rotate_points(points, params[:, :3]))
        np.testing.assert_allclose(ours, expected, atol=1e-6)


class TestProject:
    def test_matches_oracle(self):
        points, params, K = make_problem()
        ours = np.asarray(projection.project_points(points, params, K))
        np.testing.assert_allclose(ours, oracle_project(points, params, K), atol=1e-5)

    def test_matches_cv2_project_points(self):
        points, params, K = make_problem(64, seed=3)
        rvec, tvec = params[0, :3], params[0, 3:6]
        expected = cv2.projectPoints(points, rvec, tvec, K, None)[0][:, 0, :]
        ours = np.asarray(
            projection.project_points(points, np.broadcast_to(params[0], (64, 6)), K)
        )
        np.testing.assert_allclose(ours, expected, atol=1e-4)


class TestPacking:
    def test_params_round_trip(self):
        _, params, _ = make_problem(32, seed=4)
        ext = np.asarray(projection.extrinsics_from_params(params))
        assert ext.shape == (32, 3, 4)
        back = np.asarray(projection.params_from_extrinsics(ext))
        np.testing.assert_allclose(back, params, atol=1e-5)

    def test_homogeneous(self):
        _, params, _ = make_problem(8, seed=5)
        ext = np.asarray(projection.extrinsics_from_params(params, homogeneous=True))
        assert ext.shape == (8, 4, 4)
        np.testing.assert_allclose(ext[:, 3], np.tile([0, 0, 0, 1.0], (8, 1)))
        back = np.asarray(projection.params_from_extrinsics(ext))
        np.testing.assert_allclose(back, params, atol=1e-5)

    def test_projection_matrix(self):
        _, params, K = make_problem(8, seed=6)
        ext = np.asarray(projection.extrinsics_from_params(params))
        p = np.asarray(projection.projection_from_extrinsic(K, ext))
        expected = np.einsum("ij,njk->nik", K, ext)
        np.testing.assert_allclose(p, expected, atol=1e-6)
