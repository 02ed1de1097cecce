"""Pipeline parallelism (parallel/pipelined.py) on the virtual CPU mesh."""

import dataclasses

import jax
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
from meatmodeler_tpu.parallel.pipelined import process_batch_pipelined
from meatmodeler_tpu.pipeline import process

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    keyframe=dataclasses.replace(KeyframeConfig(), max_corners=128, threshold=0.03),
    orb=OrbConfig(num_features=512, num_levels=2),
    matcher=MatcherConfig(max_matches=256),
    tracks=TrackConfig(max_tracks=1024, max_keyframes=32),
    volume=VolumeConfig(voxel_resolution=32),
    frame_chunk=8,
)

SCENE = TurntableScene(image_size=(320, 240), focal=340.0, noise_sigma=1.0)


@pytest.fixture(scope="module")
def clips():
    return [render_sequence(SCENE, 24, seed=s)[0] for s in (0, 1, 2)]


@pytest.mark.slow
def test_pipelined_matches_sequential(clips):
    assert len(jax.devices()) >= 2  # conftest forces the 8-device CPU mesh
    piped = process_batch_pipelined(clips, config=CFG, devices=jax.devices()[:2])
    for clip, res in zip(clips, piped):
        seq = process(clip, config=CFG)
        assert res.reprojection_rmse < max(1.2 * seq.reprojection_rmse, 2.0)
        assert len(res.points) == len(seq.points)
        np.testing.assert_allclose(res.intrinsics, seq.intrinsics, rtol=1e-4)


@pytest.mark.slow
def test_pipelined_single_device_fallback(clips):
    d = jax.devices()[0]
    piped = process_batch_pipelined(clips[:2], config=CFG, devices=(d, d))
    assert all(np.isfinite(r.reprojection_rmse) for r in piped)


@pytest.mark.slow
def test_pipelined_propagates_errors():
    # Pure-noise frames: board detection fails AND the marker-free
    # bootstrap finds no epipolar inliers, so the pipeline raises a
    # described error either way (never the reference's infinite loop,
    # processor.py:316-319) and the pipelined path must propagate it.
    rng = np.random.default_rng(0)
    boardless = rng.integers(0, 255, size=(10, 120, 160, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="chessboard|marker-free"):
        process_batch_pipelined([boardless], config=CFG)


@pytest.mark.slow
def test_solve_stage_error_does_not_deadlock(clips, monkeypatch):
    """A solve-stage failure must re-raise promptly, not deadlock the
    bounded handoff queue while ingest keeps producing (queue_depth=1 with
    3 videos exercises the backpressure path)."""
    from meatmodeler_tpu.parallel import pipelined as pl

    def boom(*a, **k):
        raise RuntimeError("solver exploded")

    monkeypatch.setattr(pl, "_solve_and_finish", boom)
    with pytest.raises(RuntimeError, match="solver exploded"):
        pl.process_batch_pipelined(clips, config=CFG, queue_depth=1)
