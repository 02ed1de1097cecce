"""Stage checkpoint/resume tests (SURVEY.md §5.4)."""

import pytest
import numpy as np

from meatmodeler_tpu.utils.checkpoint import StageCheckpointer


class TestStageCheckpointer:
    def test_save_load_round_trip(self, tmp_path):
        c = StageCheckpointer(str(tmp_path))
        c.save("stage_a", x=np.arange(10), y=np.ones((3, 3)))
        assert c.has("stage_a")
        data = c.load("stage_a")
        np.testing.assert_array_equal(data["x"], np.arange(10))
        np.testing.assert_array_equal(data["y"], np.ones((3, 3)))

    def test_disabled_when_none(self):
        c = StageCheckpointer(None)
        c.save("whatever", x=np.ones(3))  # no-op, no crash
        assert not c.has("whatever")

    @pytest.mark.slow
    def test_pipeline_resume_skips_pass1(self, tmp_path):
        """process() with a checkpoint dir resumes pass 1 from disk: the
        second run must not read the video at all."""
        import dataclasses

        from meatmodeler_tpu.config import (
            DEFAULT_CONFIG,
            KeyframeConfig,
            MatcherConfig,
            OrbConfig,
            TrackConfig,
            VolumeConfig,
        )
        from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence
        from meatmodeler_tpu.pipeline import process

        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            keyframe=dataclasses.replace(KeyframeConfig(), max_corners=128, threshold=0.02),
            orb=OrbConfig(num_features=512, num_levels=2),
            matcher=MatcherConfig(max_matches=256),
            tracks=TrackConfig(max_tracks=1024, max_keyframes=32),
            volume=VolumeConfig(voxel_resolution=32),
            frame_chunk=8,
        )
        scene = TurntableScene(image_size=(320, 240), focal=340.0, noise_sigma=1.0)
        frames, _, _ = render_sequence(scene, 24, seed=0)

        ck = tmp_path / "ck"
        r1 = process(frames, config=cfg, checkpoint_dir=str(ck))
        assert (ck / "keyframes.npz").exists()
        assert (ck / "cloud.npz").exists()

        # Resume: pass a BROKEN video source — pass 1 must come from disk.
        r2 = process(
            np.zeros((1, 8, 8, 3), np.uint8), config=cfg, checkpoint_dir=str(ck)
        )
        assert len(r2.points) == len(r1.points)
        np.testing.assert_allclose(r2.intrinsics, r1.intrinsics, rtol=1e-5)
