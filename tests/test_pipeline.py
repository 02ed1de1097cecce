"""End-to-end pipeline integration test on the synthetic turntable scene
(SURVEY.md §4: "rendered synthetic turntable video -> full pipeline ->
compare point cloud + volume to ground truth")."""

import dataclasses

import numpy as np
import pytest

from meatmodeler_tpu.config import (
    DEFAULT_CONFIG,
    KeyframeConfig,
    MatcherConfig,
    OrbConfig,
    TrackConfig,
    VolumeConfig,
)
from meatmodeler_tpu.io import ply
from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence
from meatmodeler_tpu.pipeline import process

# Small-capacity config so the suite runs quickly on one CPU core.
TEST_CONFIG = dataclasses.replace(
    DEFAULT_CONFIG,
    keyframe=dataclasses.replace(KeyframeConfig(), max_corners=256, threshold=0.02),
    orb=OrbConfig(num_features=768, num_levels=2),
    matcher=MatcherConfig(max_matches=512),
    tracks=TrackConfig(max_tracks=2048, max_keyframes=32),
    volume=VolumeConfig(voxel_resolution=48),
    frame_chunk=8,
)

SCENE = TurntableScene(image_size=(400, 300), focal=420.0, noise_sigma=1.0)


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    frames, poses, corners = render_sequence(SCENE, 40, seed=0)
    out = tmp_path_factory.mktemp("e2e") / "run"
    result = process(frames, path=str(out), config=TEST_CONFIG)
    return result, poses, corners, out


class TestEndToEnd:
    def test_runs_and_returns_cloud(self, synthetic_run):
        result, _, _, _ = synthetic_run
        assert result.points.shape[1] == 3
        assert len(result.points) > 50
        assert np.isfinite(result.points).all()

    def test_calibration_recovers_intrinsics(self, synthetic_run):
        result, _, _, _ = synthetic_run
        k = result.intrinsics
        # Focal within a few percent of ground truth (420).
        assert abs(k[0, 0] - SCENE.focal) / SCENE.focal < 0.05, k
        assert abs(k[1, 1] - SCENE.focal) / SCENE.focal < 0.05, k
        # Principal point near the image center.
        assert abs(k[0, 2] - 200) < 20 and abs(k[1, 2] - 150) < 20, k

    def test_reprojection_rmse(self, synthetic_run):
        result, _, _, _ = synthetic_run
        # Noise sigma 1.0 on 8-bit pixels -> subpixel tracking residuals.
        assert result.reprojection_rmse < 2.0, result.reprojection_rmse

    def test_poses_on_ring(self, synthetic_run):
        """Camera centers must sit near the ground-truth ring (same world
        frame: both anchored to the chessboard)."""
        result, gt_poses, _, _ = synthetic_run
        ext = result.extrinsics  # (F, 4, 4)
        centers = -np.einsum("fji,fj->fi", ext[:, :3, :3], ext[:, :3, 3])
        gt_radius = SCENE.ring_radius
        # Scale: our board has side_length 2 like ground truth -> same units.
        board_center = np.array([3.0, 0.0, 2.0])
        r = np.linalg.norm((centers - board_center)[:, [0, 2]], axis=1)
        horiz = np.sqrt(gt_radius**2)
        # Round-1 envelope: the ~2% constrained-calibration focal error plus
        # oblique-view corner bias drifts radii by up to ~12% along the arc.
        assert np.all(np.abs(r - horiz) / horiz < 0.15), r

    def test_volume_within_tolerance(self, synthetic_run):
        result, _, _, _ = synthetic_run
        truth = SCENE.volume
        assert np.isfinite(result.volume)
        # Hull = symmetric-completion ∩ carve (volume.hull_and_carved_volume)
        # with silhouette-pruned support + trim=9 measures -3.9% at this
        # scene and +5.4% at the 1080p bench scene (the scene-spread table
        # lives in tools/volume_validation.py) — envelope tightened round-3
        # from 0.65..1.35 (VERDICT r2 item 5). Carve at
        # THIS scene's geometry is wedge-limited: with EXACT analytic
        # silhouettes at these 8 views the ideal visual hull is +132%, so
        # its envelope stays wide — the carve is an upper bound by
        # construction, not an estimator, from a one-sided arc.
        assert 0.80 * truth < result.volume < 1.20 * truth, (result.volume, truth)
        assert 0.3 * truth < result.volume_carved < 3.0 * truth, (
            result.volume_carved,
            truth,
        )

    def test_ply_written(self, synthetic_run):
        result, _, _, out = synthetic_run
        assert result.ply_path == str(out) + "Cloud.ply"
        cloud = ply.read_ply(result.ply_path)
        np.testing.assert_allclose(cloud, result.points.astype(np.float32), rtol=1e-5)

    def test_metrics_populated(self, synthetic_run):
        result, _, _, _ = synthetic_run
        assert result.metrics["counters"]["keyframes"] >= 3
        assert "bundle_adjustment" in result.metrics["timings"]

    def test_device_board_detector_served(self, synthetic_run):
        """Default detector mode is "auto": the on-device detector must have
        handled every keyframe; any host-cv2 fallback is counted."""
        result, _, _, _ = synthetic_run
        assert result.metrics["counters"].get("board_detect_host_fallbacks", 0) == 0


@pytest.mark.slow
class TestFailurePaths:
    def test_no_board_raises_cleanly(self):
        """The reference loops forever / crashes on board-free video
        (processor.py:316-319); with the marker-free fallback disabled we
        must raise a described error."""
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, size=(10, 120, 160, 3), dtype=np.uint8)
        cfg = dataclasses.replace(TEST_CONFIG, markerless_fallback=False)
        with pytest.raises(ValueError, match="chessboard"):
            process(frames, config=cfg)

    def test_structureless_video_fails_described(self):
        """Pure-noise frames have no trackable structure: the marker-free
        fallback engages but must fail with a described error, not garbage."""
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, size=(10, 120, 160, 3), dtype=np.uint8)
        with pytest.raises(ValueError):
            process(frames, config=TEST_CONFIG)


@pytest.mark.slow
class TestMarkerFree:
    def test_board_probe_budget_stops_the_hunt(self, tmp_path):
        """Board-free clip with a small board_probe_frames: pass 1 must stop
        hunting after the budget (the reference busy-loops forever,
        processor.py:315-319; pre-budget we cv2-detected on EVERY frame —
        measured 356 s of a 378 s warm run at 720p) and the marker-free
        path must still engage and reconstruct."""
        scene = dataclasses.replace(SCENE, show_board=False, noise_sigma=0.5)
        frames, _, _ = render_sequence(scene, 24, seed=3)
        cfg = dataclasses.replace(
            TEST_CONFIG,
            board_probe_frames=6,
            keyframe=dataclasses.replace(TEST_CONFIG.keyframe, threshold=0.025),
        )
        result = process(frames, path=str(tmp_path / "mfp"), config=cfg)
        counters = result.metrics["counters"]
        assert counters.get("markerless") is True
        assert counters.get("board_probe_exhausted") == 6
        assert np.isfinite(result.reprojection_rmse)
        assert result.reprojection_rmse < 2.0

    def test_board_free_video_reconstructs_up_to_scale(self, tmp_path):
        """North-star RANSAC path inside process(): a board-free clip (white
        ground sheet, textured ellipsoid only) reconstructs via chained
        essential-matrix RANSAC — finite RMSE, flagged as markerless."""
        scene = dataclasses.replace(SCENE, show_board=False, noise_sigma=0.5)
        frames, _, _ = render_sequence(scene, 24, seed=3)
        cfg = dataclasses.replace(
            TEST_CONFIG,
            keyframe=dataclasses.replace(TEST_CONFIG.keyframe, threshold=0.025),
        )
        result = process(frames, path=str(tmp_path / "mf"), config=cfg)
        counters = result.metrics["counters"]
        assert counters.get("markerless") is True
        assert np.isfinite(result.reprojection_rmse)
        assert result.reprojection_rmse < 2.0
        assert len(result.points) >= 30
        # Up-to-scale but metrically consistent: the hull volume is finite
        # (no board plane; the density gates alone split the item).
        assert np.isfinite(result.volume)

    def test_assume_markerless_skips_board_hunt(self, tmp_path):
        """assume_markerless=True goes straight to the marker-free scan:
        no board probe runs (no probe counters), exactly one pass-1 scan,
        and the reconstruction matches the auto-fallback path's output on
        the same clip (identical keyframes -> identical chain input)."""
        scene = dataclasses.replace(SCENE, show_board=False, noise_sigma=0.5)
        frames, _, _ = render_sequence(scene, 24, seed=3)
        cfg = dataclasses.replace(
            TEST_CONFIG,
            assume_markerless=True,
            keyframe=dataclasses.replace(TEST_CONFIG.keyframe, threshold=0.025),
        )
        result = process(frames, path=str(tmp_path / "amf"), config=cfg)
        counters = result.metrics["counters"]
        assert counters.get("markerless") is True
        assert "board_probe_exhausted" not in counters
        assert np.isfinite(result.reprojection_rmse)
        assert result.reprojection_rmse < 2.0


@pytest.mark.slow
class TestPass1Downscale:
    def test_downscaled_pass1_reconstructs(self, synthetic_run):
        """pass1_downscale=2 (the >=720p auto path, which the CPU suite
        never hits via auto) must reconstruct with full-quality geometry:
        detected corners scale back to full resolution and pass 2 is
        unchanged. Keyframes may come denser on a small forced-downscale
        input (see PipelineConfig.pass1_downscale), never sparser than half."""
        result, _, _, _ = synthetic_run
        frames, _, _ = render_sequence(SCENE, 40, seed=0)
        cfg = dataclasses.replace(
            TEST_CONFIG,
            pass1_downscale=2,
            tracks=dataclasses.replace(TEST_CONFIG.tracks, max_keyframes=48),
        )
        ds = process(frames, config=cfg)
        assert ds.reprojection_rmse < max(1.5 * result.reprojection_rmse, 2.0)
        kf_full = result.metrics["counters"]["keyframes"]
        kf_ds = ds.metrics["counters"]["keyframes"]
        assert kf_ds >= 0.5 * kf_full, (kf_ds, kf_full)
        np.testing.assert_allclose(
            ds.intrinsics[0, 0], result.intrinsics[0, 0], rtol=0.05
        )


@pytest.mark.slow
class TestPass2Downscale:
    def test_halfres_keyframes_keep_geometry(self, synthetic_run):
        """pass2_downscale=2: keyframes ship and process at half resolution
        (4x fewer bytes over the throttled host->device link); all image-
        plane quantities land in half-res pixel units while the 3D geometry
        — anchored to the board's metric side_length — is unchanged."""
        result, _, _, _ = synthetic_run
        frames, _, _ = render_sequence(SCENE, 40, seed=0)
        cfg = dataclasses.replace(TEST_CONFIG, pass2_downscale=2, pass2_enhance="grey")
        ds = process(frames, config=cfg)
        # K is in half-res units: focal ~ truth/2.
        np.testing.assert_allclose(ds.intrinsics[0, 0], SCENE.focal / 2, rtol=0.06)
        assert ds.metrics["counters"]["kf_scale"] == 2
        # RMSE is in half-res px; localization noise keeps it subpixel.
        assert ds.reprojection_rmse < 1.5, ds.reprojection_rmse
        # The metric 3D output is resolution-independent, but at THIS toy
        # scale (item ~60 working px wide, focal 210) per-point depth noise
        # doubles and the hull envelope widens accordingly — measured
        # 25.7-38.8 across keyframe densities vs truth 22.6. The 1080p
        # bench (item ~6x more pixels) is the accuracy gate for p2s=2 and
        # holds volume_err tight there (recorded in BENCH detail).
        truth = SCENE.volume
        assert 0.65 * truth < ds.volume < 1.85 * truth, (ds.volume, truth)


@pytest.mark.slow
class TestCapacityGuard:
    def test_keyframe_overflow_raises_described_error(self):
        frames, _, _ = render_sequence(SCENE, 30, seed=0)
        cfg = dataclasses.replace(
            TEST_CONFIG, tracks=dataclasses.replace(TEST_CONFIG.tracks, max_keyframes=4)
        )
        with pytest.raises(ValueError, match="max_keyframes"):
            process(frames, config=cfg)


@pytest.mark.slow
class TestGreyEnhanceMode:
    def test_grey_keyframe_path_reconstructs(self, synthetic_run):
        """pass2_enhance="grey" (keyframes shipped as 1-byte/px grey, CLAHE
        on luma instead of LAB L) must reconstruct with comparable quality
        to the exact reference path."""
        result, _, _, _ = synthetic_run
        frames, _, _ = render_sequence(SCENE, 40, seed=0)
        cfg = dataclasses.replace(TEST_CONFIG, pass2_enhance="grey")
        grey = process(frames, config=cfg)
        assert grey.reprojection_rmse < max(1.5 * result.reprojection_rmse, 2.0)
        assert len(grey.points) > 0.5 * len(result.points)
        np.testing.assert_allclose(
            grey.intrinsics[0, 0], result.intrinsics[0, 0], rtol=0.05
        )


@pytest.mark.slow
class TestNViewTriangulation:
    def test_nview_init_reconstructs(self, synthetic_run):
        """tracks.triangulation="nview" (masked DLT over ALL observations)
        must match or beat the endpoints init after BA."""
        result, _, _, _ = synthetic_run
        frames, _, _ = render_sequence(SCENE, 40, seed=0)
        cfg = dataclasses.replace(
            TEST_CONFIG, tracks=dataclasses.replace(TEST_CONFIG.tracks, triangulation="nview")
        )
        nv = process(frames, config=cfg)
        assert nv.reprojection_rmse < max(1.2 * result.reprojection_rmse, 2.0)
        assert len(nv.points) > 0.7 * len(result.points)


@pytest.mark.slow
class TestIncrementalBA:
    def test_matches_global_ba(self, synthetic_run):
        """Incremental (per-keyframe-prefix) BA must land where the global
        solve does — the final prefix IS the global problem."""
        result, _, _, _ = synthetic_run
        frames, _, _ = render_sequence(SCENE, 40, seed=0)
        cfg = dataclasses.replace(TEST_CONFIG, incremental_ba=True)
        inc = process(frames, config=cfg)
        assert inc.reprojection_rmse < max(1.2 * result.reprojection_rmse, 2.0)
        assert len(inc.points) == len(result.points)
        steps = inc.metrics["counters"]["ba_rmse_px_steps"]
        assert len(steps) >= 2 and np.isfinite(steps).all()


class TestKeyframeRuleScaleInvariance:
    """KeyframeConfig.threshold_abs (VERDICT r4 #10): one intensity budget,
    any (resolution, downscale) — no per-config threshold compensation."""

    def test_pixel_doubled_selection_identical(self):
        """A pixel-doubled clip scanned at a doubled downscale sees the SAME
        working frames, so with threshold_abs the selection must be BIT-
        IDENTICAL to the original clip's — the exact shape of bench.py's 4K
        probe, which previously had to halve `threshold` to compensate for
        the reference rule's `threshold * full_width` coupling
        (processor.py:100)."""
        import jax.numpy as jnp

        from meatmodeler_tpu.pipeline import _clahe_grey_batch, _make_keyframe_scan

        frames, _, _ = render_sequence(SCENE, 12, seed=0, color=False)
        cfg = dataclasses.replace(
            TEST_CONFIG,
            keyframe=dataclasses.replace(
                TEST_CONFIG.keyframe, threshold_abs=0.02 * SCENE.image_size[0]
            ),
        )

        def scan_flags(greys, width_scale):
            init_carry, scan_chunk = _make_keyframe_scan(cfg)
            g = _clahe_grey_batch(jnp.asarray(greys))
            carry = init_carry(g[0])
            _, flags = scan_chunk(carry, g[1:], width_scale=width_scale)
            return np.asarray(flags)

        base = scan_flags(frames, 1)
        doubled = np.repeat(np.repeat(frames, 2, axis=1), 2, axis=2)
        redec = scan_flags(doubled[:, ::2, ::2], 2)
        assert base.sum() >= 2, "scene must select some keyframes"
        np.testing.assert_array_equal(base, redec)
