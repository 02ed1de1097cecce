"""Bundle adjuster oracle tests vs scipy.optimize.least_squares (SURVEY.md §4).

The oracle solves the *identical* problem with the reference's solver setup
(TRF, jac_sparsity, x_scale='jac', ftol=1e-4 — bundleAdjuster.py:180-192) and
our Schur-LM result is held to reprojection-RMSE parity within 2%
(BASELINE.md target).
"""

import numpy as np
import pytest
from scipy.optimize import least_squares
from scipy.sparse import lil_matrix

import jax.numpy as jnp

from meatmodeler_tpu.geometry import projection, so3
from meatmodeler_tpu.solvers import bundle_adjust as ba
from meatmodeler_tpu.config import SolverConfig


# ---------------- synthetic turntable problem ----------------


def make_problem(n_frames=12, n_points=300, noise=0.5, pose_noise=0.01, seed=0):
    """Cameras on a ring looking at a cloud of points, noisy observations and
    perturbed initial guesses — the BA must pull them back."""
    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 640], [0, 800.0, 360], [0, 0, 1]])

    pts = rng.normal(size=(n_points, 3)) * 2.0

    cams = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames * 0.25  # quarter arc
        rvec = np.array([0.0, ang, 0.0])
        rot = np.asarray(so3.exp(rvec))
        center = np.array([10 * np.sin(ang), 0.0, -10 * np.cos(ang)])
        tvec = -rot @ center
        cams.append(np.concatenate([rvec, tvec]))
    cams = np.stack(cams)

    # Every point observed in a random subset of frames (>= 2).
    fidx, pidx = [], []
    for p in range(n_points):
        k = rng.integers(2, n_frames + 1)
        for f in sorted(rng.choice(n_frames, size=k, replace=False)):
            fidx.append(f)
            pidx.append(p)
    fidx = np.array(fidx, np.int32)
    pidx = np.array(pidx, np.int32)

    obs = np.asarray(projection.project_points(pts[pidx], cams[fidx], K))
    obs = obs + rng.normal(scale=noise, size=obs.shape)

    cams0 = cams + rng.normal(scale=pose_noise, size=cams.shape)
    pts0 = pts + rng.normal(scale=0.05, size=pts.shape)
    return K, cams, pts, cams0, pts0, obs, fidx, pidx


def scipy_oracle(K, cams0, pts0, obs, fidx, pidx, ftol=1e-4):
    """The reference's solver configuration re-run on the identical problem."""
    n_frames, n_points = cams0.shape[0], pts0.shape[0]

    def fun(params):
        cams = params[: n_frames * 6].reshape(n_frames, 6)
        pts = params[n_frames * 6 :].reshape(n_points, 3)
        proj = np.asarray(projection.project_points(pts[pidx], cams[fidx], K))
        return (proj - obs).ravel()

    m = fidx.size * 2
    n = n_frames * 6 + n_points * 3
    A = lil_matrix((m, n), dtype=int)
    i = np.arange(fidx.size)
    for s in range(6):
        A[2 * i, fidx * 6 + s] = 1
        A[2 * i + 1, fidx * 6 + s] = 1
    for s in range(3):
        A[2 * i, n_frames * 6 + pidx * 3 + s] = 1
        A[2 * i + 1, n_frames * 6 + pidx * 3 + s] = 1

    x0 = np.hstack([cams0.ravel(), pts0.ravel()])
    res = least_squares(fun, x0, jac_sparsity=A, x_scale="jac", ftol=ftol, method="trf")
    rmse = np.sqrt(np.mean(fun(res.x) ** 2) * 2)  # per-obs RMSE (2 comps)
    return res, rmse


class TestSchurBA:
    def test_matches_scipy_oracle_rmse(self):
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem()
        oracle, oracle_rmse = scipy_oracle(K, cams0, pts0, obs, fidx, pidx)

        new_pts, new_ext, result = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)),
            K,
            pts0,
            obs,
            fidx,
            pidx,
        )
        ours_rmse = float(result.rmse)
        # BASELINE.md: reprojection RMSE within 2% of the scipy baseline.
        assert ours_rmse <= oracle_rmse * 1.02, (ours_rmse, oracle_rmse)

    def test_reduces_cost_and_recovers_geometry(self):
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem(noise=0.0)
        new_pts, new_ext, result = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)), K, pts0, obs, fidx, pidx
        )
        # Zero observation noise: BA should reach near-zero reprojection.
        assert float(result.rmse) < 1e-3
        # Extrinsics are homogeneous 4x4 like reformatPointResult.
        assert new_ext.shape == (12, 4, 4)
        np.testing.assert_allclose(np.asarray(new_ext)[:, 3], np.tile([0, 0, 0, 1.0], (12, 1)))

    def test_masked_padding_is_inert(self):
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem(n_frames=6, n_points=50, seed=1)
        n = obs.shape[0]
        pad = 64
        obs_p = np.vstack([obs, np.full((pad, 2), 1e6)])
        fidx_p = np.concatenate([fidx, np.zeros(pad, np.int32)])
        pidx_p = np.concatenate([pidx, np.zeros(pad, np.int32)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

        _, _, res_pad = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)), K, pts0,
            obs_p, fidx_p, pidx_p, mask=jnp.asarray(mask),
        )
        _, _, res_ref = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)), K, pts0, obs, fidx, pidx
        )
        np.testing.assert_allclose(float(res_pad.rmse), float(res_ref.rmse), rtol=1e-6)

    @pytest.mark.slow
    def test_baseline_scale_100cams_10kpts(self):
        """BASELINE.json config 3: 100 cameras / 10k points sparse BA."""
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem(
            n_frames=100, n_points=10000, noise=0.5, seed=2
        )
        new_pts, new_ext, result = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)), K, pts0, obs, fidx, pidx
        )
        # Converged near the noise floor (~0.5 px / sqrt(2) per component).
        assert float(result.rmse) < 0.75


class TestShapeBucketing:
    """adjust_points/adjust_pose pad to bucket multiples (SolverConfig.bucket)
    so data-dependent problem sizes reuse one compiled solver program; the
    padded cameras/points/obs are masked out and must not move the solution."""

    def test_bucketed_matches_exact_shapes(self):
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem(
            n_frames=7, n_points=53, seed=3
        )
        ext0 = np.asarray(projection.extrinsics_from_params(jnp.asarray(cams0)))
        exact = ba.adjust_points(
            ext0, K, pts0, obs, fidx, pidx,
            config=SolverConfig(bucket=(1, 1, 1)),
        )
        bucketed = ba.adjust_points(
            ext0, K, pts0, obs, fidx, pidx,
            config=SolverConfig(bucket=(4, 256, 1024)),
        )
        assert bucketed[0].shape == exact[0].shape
        assert bucketed[1].shape == exact[1].shape
        np.testing.assert_allclose(
            np.asarray(bucketed[0]), np.asarray(exact[0]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(bucketed[1]), np.asarray(exact[1]), atol=1e-5
        )
        np.testing.assert_allclose(
            float(bucketed[2].rmse), float(exact[2].rmse), rtol=1e-6
        )
        assert int(bucketed[2].iterations) == int(exact[2].iterations)

    def test_pose_bucketed_matches_exact(self):
        rng = np.random.default_rng(5)
        f, pattern, side = 6, (4, 3), 2.0
        board = np.asarray(ba._chessboard_xz(pattern, side, np.float64))
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        cams = np.hstack([
            rng.normal(scale=0.05, size=(f, 3)),
            np.tile([2.0, 1.0, 20.0], (f, 1)) + rng.normal(scale=0.2, size=(f, 3)),
        ])
        obs = np.asarray(
            projection.project_points(
                np.tile(board, (f, 1)),
                np.repeat(cams, board.shape[0], axis=0),
                K,
            )
        ) + rng.normal(scale=0.3, size=(f * board.shape[0], 2))
        ext0 = np.asarray(
            projection.extrinsics_from_params(
                jnp.asarray(cams + rng.normal(scale=0.01, size=(f, 6)))
            )
        )
        exact_ext, exact_res = ba.adjust_pose(
            ext0, K, obs, pattern=pattern, side_length=side,
            config=SolverConfig(bucket=(1, 1, 1)),
        )
        buck_ext, buck_res = ba.adjust_pose(
            ext0, K, obs, pattern=pattern, side_length=side,
            config=SolverConfig(bucket=(4, 256, 1024)),
        )
        assert buck_ext.shape == exact_ext.shape == (f, 3, 4)
        np.testing.assert_allclose(
            np.asarray(buck_ext), np.asarray(exact_ext), atol=1e-5
        )
        np.testing.assert_allclose(
            float(buck_res.rmse), float(exact_res.rmse), rtol=1e-6
        )


class TestAdjustPose:
    def test_pose_only_against_scipy(self):
        """The adjustPose problem: known X-Z chessboard, F frames, fixed points."""
        rng = np.random.default_rng(3)
        K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
        board = np.asarray(ba._chessboard_xz((4, 3), 2.0, np.float64))
        F = 8
        cams = []
        for i in range(F):
            rvec = rng.normal(size=3) * 0.2 + np.array([0.2, 0, 0])
            tvec = np.array([-3.0 + 0.3 * i, 1.0, 15.0])
            cams.append(np.concatenate([rvec, tvec]))
        cams = np.stack(cams)
        obs = np.asarray(
            projection.project_points(
                np.tile(board, (F, 1)), np.repeat(cams, 12, axis=0), K
            )
        )
        obs = obs + rng.normal(scale=0.3, size=obs.shape)
        cams0 = cams + rng.normal(scale=0.02, size=cams.shape)

        # scipy oracle (dense, like adjustPose's commented-out sparsity).
        fidx = np.repeat(np.arange(F), 12)

        def fun(params):
            c = params.reshape(F, 6)
            proj = np.asarray(projection.project_points(np.tile(board, (F, 1)), c[fidx], K))
            return (proj - obs).ravel()

        res = least_squares(fun, cams0.ravel(), ftol=1e-4, method="trf")
        oracle_rmse = np.sqrt(np.mean(fun(res.x) ** 2) * 2)

        ext0 = np.asarray(projection.extrinsics_from_params(cams0))
        new_ext, result = ba.adjust_pose(ext0, K, obs)
        assert new_ext.shape == (F, 3, 4)
        assert float(result.rmse) <= oracle_rmse * 1.02

    def test_pose_only_refine_vmapped(self):
        rng = np.random.default_rng(4)
        K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
        F, N = 6, 20
        pts = rng.normal(size=(F, N, 3)) * 2
        pts[..., 2] += 10
        cams = np.hstack([rng.normal(size=(F, 3)) * 0.1, rng.normal(size=(F, 3))])
        cams[:, 5] += 12
        obs = np.stack(
            [
                np.asarray(projection.project_points(pts[i], np.broadcast_to(cams[i], (N, 6)), K))
                for i in range(F)
            ]
        )
        cams0 = cams + rng.normal(scale=0.01, size=cams.shape)
        refined = np.asarray(
            ba.pose_only_refine(
                jnp.asarray(cams0), jnp.asarray(pts), jnp.asarray(K), jnp.asarray(obs),
                jnp.ones((F, N), bool),
            )
        )
        np.testing.assert_allclose(refined, cams, atol=1e-5)


class TestObservationWeights:
    def test_weights_downweight_noisy_observations(self):
        """Inverse-sigma weighting must pull the solution toward the precise
        observations: with half the observations 8x noisier, the weighted
        solve recovers the ground-truth points better than the unweighted."""
        import numpy as np
        from meatmodeler_tpu.geometry import projection
        from meatmodeler_tpu.solvers import bundle_adjust

        rng = np.random.default_rng(0)
        k = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
        pts = rng.normal(size=(60, 3)) * 2.0
        cams = np.hstack([rng.normal(size=(5, 3)) * 0.05, rng.normal(size=(5, 3))])
        cams[:, 5] += 12
        fidx = np.repeat(np.arange(5), 60).astype(np.int32)
        pidx = np.tile(np.arange(60), 5).astype(np.int32)
        clean = np.asarray(projection.project_points(pts[pidx], cams[fidx], k))
        coarse = rng.random(len(fidx)) < 0.5
        sigma = np.where(coarse, 4.0, 0.5)
        obs = clean + rng.normal(size=clean.shape) * sigma[:, None]

        def solve(weights):
            p, _, res = bundle_adjust.adjust_points(
                projection.extrinsics_from_params(cams + rng.normal(size=cams.shape) * 0.002),
                k, pts + 0.05, obs, fidx, pidx, weights=weights,
            )
            return np.asarray(p)

        err_unw = np.linalg.norm(solve(None) - pts, axis=1).mean()
        err_w = np.linalg.norm(solve((1.0 / sigma).astype(np.float32)) - pts, axis=1).mean()
        assert err_w < 0.8 * err_unw, (err_w, err_unw)


class TestWarmStartIncremental:
    def test_damping_warm_start_cuts_iterations_at_equal_rmse(self):
        """The incremental-BA pattern (pipeline.incremental_ba): each keyframe
        prefix re-solved from the previous prefix's solution AND exit damping
        must spend measurably fewer total LM iterations than cold restarts,
        at (or better than) the cold path's final RMSE — the online design the
        reference sketched but never ran (processor.py:395-408)."""
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem(
            n_frames=8, n_points=120, seed=3, pose_noise=0.05
        )
        ext0 = np.asarray(projection.extrinsics_from_params(cams0))
        fidx_j = jnp.asarray(fidx)
        cfg = SolverConfig()

        def run(warm: bool):
            ext_cur, pts_cur, lam = ext0, pts0, None
            total = 0
            for k in range(3, 9):
                pts_cur, ext4, res = ba.adjust_points(
                    ext_cur if warm else ext0,
                    K,
                    pts_cur if warm else pts0,
                    obs,
                    fidx,
                    pidx,
                    mask=fidx_j < k,
                    config=cfg,
                    init_lambda=lam if warm else None,
                )
                ext_cur = np.asarray(ext4)[:, :3, :]
                if warm:
                    # The pipeline's capped carry: an exploded exit lambda
                    # (LM walks damping UP through rejected steps near
                    # convergence) must not make the next prefix's first
                    # tiny step satisfy ftol immediately — measured 10+ px
                    # premature stops at ftol=1e-6 without the cap.
                    lam = min(float(res.final_lambda) * cfg.lambda_down, cfg.init_lambda)
                total += int(res.iterations)
            return total, float(res.rmse)

        warm_iters, warm_rmse = run(warm=True)
        cold_iters, cold_rmse = run(warm=False)
        assert warm_rmse <= cold_rmse * 1.02, (warm_rmse, cold_rmse)
        # Measured on this problem: 22 warm vs 37 cold iterations in the
        # pipeline's f32; 20 vs 23 under the suite's x64 (the f64 cold solve
        # wanders less near convergence, shrinking the gap).
        assert warm_iters < cold_iters, (warm_iters, cold_iters)

    def test_final_lambda_reported_and_consumed(self):
        K, cams, pts, cams0, pts0, obs, fidx, pidx = make_problem(
            n_frames=4, n_points=40, seed=5
        )
        _, _, res = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)),
            K, pts0, obs, fidx, pidx,
        )
        lam = float(res.final_lambda)
        assert np.isfinite(lam) and lam > 0
        # Feeding it back must be accepted and converge to the same solution.
        _, _, res2 = ba.adjust_points(
            np.asarray(projection.extrinsics_from_params(cams0)),
            K, pts0, obs, fidx, pidx, init_lambda=jnp.asarray(lam),
        )
        np.testing.assert_allclose(float(res2.rmse), float(res.rmse), rtol=0.02)
