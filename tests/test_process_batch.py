"""Multi-video process_batch: sharded per-core BA solves must reproduce the
single-video pipeline (BASELINE config 5, on the virtual 8-device CPU mesh)."""

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
from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence
from meatmodeler_tpu.parallel import sharded
from meatmodeler_tpu.parallel.batch import process_batch
from meatmodeler_tpu.pipeline import process

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    keyframe=dataclasses.replace(KeyframeConfig(), max_corners=256, threshold=0.02),
    orb=OrbConfig(num_features=768, num_levels=2),
    matcher=MatcherConfig(max_matches=512),
    tracks=TrackConfig(max_tracks=2048, max_keyframes=32),
    volume=VolumeConfig(voxel_resolution=48),
    frame_chunk=8,
)


@pytest.fixture(scope="module")
def two_videos():
    s1 = TurntableScene(image_size=(400, 300), focal=420.0, noise_sigma=1.0)
    s2 = TurntableScene(image_size=(400, 300), focal=500.0, noise_sigma=1.0)
    v1, _, _ = render_sequence(s1, 28, seed=0)
    v2, _, _ = render_sequence(s2, 28, seed=5)
    return [v1, v2], [s1, s2]


class TestProcessBatch:
    @pytest.mark.slow
    def test_sharded_matches_single(self, two_videos):
        videos, scenes = two_videos
        mesh = sharded.make_mesh(data=2, model=1)
        batch = process_batch(videos, config=CFG, mesh=mesh)
        assert len(batch) == 2
        for res, scene, video in zip(batch, scenes, videos):
            single = process(video, config=CFG)
            # Same reconstruction problem -> same solution (both solves are
            # the identical Schur LM on identical inputs).
            assert abs(res.reprojection_rmse - single.reprojection_rmse) < 0.05
            assert len(res.points) == len(single.points)
            np.testing.assert_allclose(res.points, single.points, atol=1e-2)
            # Calibration quality carried through.
            assert abs(res.intrinsics[0, 0] - scene.focal) / scene.focal < 0.05

    @pytest.mark.slow
    def test_unpadded_batch_without_mesh(self, two_videos):
        videos, _ = two_videos
        batch = process_batch(videos[:1], config=CFG, mesh=None)
        assert len(batch) == 1
        assert np.isfinite(batch[0].reprojection_rmse)


def test_smoke_threaded_front_end_and_confidence():
    """Quick-suite smoke for the batch front-end (thread-pool overlap, fused
    two-batch readback) and the per-video volume_confidence: tiny clips so
    this stays in the default '-m not slow' pass while the heavier
    parity-vs-single tests above remain slow-marked."""
    tiny = dataclasses.replace(
        CFG,
        keyframe=dataclasses.replace(
            KeyframeConfig(), max_corners=128, threshold=0.015
        ),
        orb=OrbConfig(num_features=256, num_levels=2),
        matcher=MatcherConfig(max_matches=128),
        tracks=TrackConfig(max_tracks=512, max_keyframes=16),
        volume=VolumeConfig(voxel_resolution=24),
        frame_chunk=4,
    )
    scene = TurntableScene(image_size=(160, 120), focal=170.0, noise_sigma=0.5)
    clips, corners = [], []
    for s in (0, 1):
        f, _, c = render_sequence(scene, 10, seed=s)
        clips.append(f)
        corners.append(c)
    res = process_batch(clips, config=tiny, known_corners=corners)
    assert len(res) == 2
    for r in res:
        assert np.isfinite(r.reprojection_rmse) and r.reprojection_rmse < 2.0
        assert len(r.points) > 10
        # The regime check must be populated for batch callers (these tiny
        # clouds land in the sparse regime by construction).
        assert r.volume_confidence is not None
        assert set(r.volume_confidence) >= {
            "low_confidence", "view_arc_deg", "elongation", "reason",
            "n_item_points",
        }
        # Tiny clips land in a weak regime by construction — either the
        # narrow-arc/elongation rule or the sparse-cloud rule fires.
        assert r.volume_confidence["low_confidence"] is True
        assert r.volume_confidence["reason"]


class TestBatchFastPrepass:
    def test_fast_path_engages_and_reconstructs(self):
        """Quick-suite smoke: the batched prepass must engage for a uniform
        grey-keyframe batch and produce a sane reconstruction (the full
        vs-single equivalence check is the slow test below)."""
        s = TurntableScene(image_size=(400, 300), focal=420.0, noise_sigma=1.0)
        v, _, _ = render_sequence(s, 16, seed=3)
        cfg = dataclasses.replace(CFG, pass2_enhance="grey")
        batch = process_batch([v, v], config=cfg)
        for res in batch:
            assert res.metrics["counters"].get("batch_fast_prepass") is True
            assert np.isfinite(res.reprojection_rmse)
            assert res.reprojection_rmse < 1.0

    @pytest.mark.slow
    def test_fast_path_matches_single(self, two_videos):
        """The batched device scan + batched board detection
        (``_batch_prepass``) must engage for uniform grey-keyframe batches
        and reproduce the single-video pipeline's reconstruction."""
        videos, scenes = two_videos
        cfg = dataclasses.replace(CFG, pass2_enhance="grey")
        batch = process_batch(videos, config=cfg)
        assert len(batch) == 2
        for res, scene, video in zip(batch, scenes, videos):
            assert res.metrics["counters"].get("batch_fast_prepass") is True
            single = process(video, config=cfg)
            assert abs(res.reprojection_rmse - single.reprojection_rmse) < 0.1
            # Same scan math, same board gating -> same keyframe set.
            assert (
                res.metrics["counters"]["keyframe_indices"]
                == single.metrics["counters"]["keyframe_indices"]
            )
            assert abs(len(res.points) - len(single.points)) <= max(
                5, 0.05 * len(single.points)
            )
            assert abs(res.intrinsics[0, 0] - scene.focal) / scene.focal < 0.05

    @pytest.mark.slow
    def test_nonuniform_batch_falls_back(self, two_videos):
        """Mixed frame counts bypass the fast prepass but still reconstruct
        through the per-video driver."""
        videos, scenes = two_videos
        cfg = dataclasses.replace(CFG, pass2_enhance="grey")
        mixed = [videos[0], videos[1][:20]]
        batch = process_batch(mixed, config=cfg)
        assert len(batch) == 2
        for res in batch:
            assert res.metrics["counters"].get("batch_fast_prepass") is None
            assert np.isfinite(res.reprojection_rmse)
