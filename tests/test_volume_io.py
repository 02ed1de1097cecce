"""Volume estimators on shapes with known volume + PLY/video IO round trips."""

import pytest
import numpy as np
import jax.numpy as jnp

from meatmodeler_tpu import volume
from meatmodeler_tpu.io import ply, video
from meatmodeler_tpu.geometry import projection


def sphere_points(n=4000, r=1.5, center=(0.0, -3.0, 1.0), seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r + np.array(center)).astype(np.float32)


class TestConvexHullVolume:
    def test_sphere(self):
        pts = sphere_points()
        vol = float(
            volume.convex_hull_volume(
                jnp.asarray(pts), jnp.ones(len(pts), bool), resolution=96, num_directions=512
            )
        )
        truth = 4 / 3 * np.pi * 1.5**3
        assert abs(vol - truth) / truth < 0.08, (vol, truth)

    @pytest.mark.slow
    def test_cube(self):
        rng = np.random.default_rng(1)
        # Dense samples on the cube surface (hull = the cube itself).
        faces = []
        for axis in range(3):
            for side in (-1.0, 1.0):
                uv = rng.uniform(-1, 1, size=(700, 2))
                pts = np.insert(uv, axis, np.full(700, side), axis=1)
                faces.append(pts)
        pts = np.concatenate(faces).astype(np.float32)
        vol = float(
            volume.convex_hull_volume(
                jnp.asarray(pts), jnp.ones(len(pts), bool), resolution=96, num_directions=1024
            )
        )
        assert abs(vol - 8.0) / 8.0 < 0.08, vol

    def test_masked_outliers_ignored(self):
        pts = sphere_points(n=1000)
        pts_out = np.vstack([pts, [[100.0, 100.0, 100.0]]]).astype(np.float32)
        mask = np.append(np.ones(1000, bool), False)
        vol = float(
            volume.convex_hull_volume(jnp.asarray(pts_out), jnp.asarray(mask), resolution=64)
        )
        truth = 4 / 3 * np.pi * 1.5**3
        assert abs(vol - truth) / truth < 0.15


class TestCarvedVolume:
    def test_sphere_carve(self):
        pts = sphere_points(n=3000)
        k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        # Ring of cameras around the sphere.
        poses = []
        for i in range(8):
            ang = 2 * np.pi * i / 8
            rvec = np.array([0.0, ang, 0.0])
            import meatmodeler_tpu.geometry.so3 as so3

            rot = np.asarray(so3.exp(rvec))
            center = np.array([0.0, -3.0, 1.0]) + 12 * np.array(
                [np.sin(ang), 0.0, -np.cos(ang)]
            )
            tvec = -rot @ center
            poses.append(np.concatenate([rvec, tvec]))
        poses = np.stack(poses)
        projs = np.asarray(
            projection.projection_from_extrinsic(
                jnp.asarray(k), projection.extrinsics_from_params(jnp.asarray(poses))
            )
        )
        vol = float(
            volume.carved_volume(
                jnp.asarray(pts),
                jnp.ones(len(pts), bool),
                jnp.asarray(projs),
                jnp.ones(8, bool),
                image_size=(640, 480),
                resolution=64,
                dilation=12,
            )
        )
        truth = 4 / 3 * np.pi * 1.5**3
        # Carving with dilated sparse silhouettes overestimates; bound loosely.
        assert 0.5 * truth < vol < 2.5 * truth, (vol, truth)

    def test_hull_and_carved_one_sided_wedge(self):
        """The pipeline estimator's design case: cameras on a narrow arc see
        ONE side of the item. The visual hull cannot close the unseen side
        (its cone intersection stays open — measured +132% with exact
        silhouettes at the e2e scene), and the seen-surface point hull
        misses half the body; the symmetric-completion ∩ carve estimator
        must still land near truth."""
        import meatmodeler_tpu.geometry.so3 as so3

        center = np.array([0.0, -3.0, 1.0])
        r_sph = 1.5
        pts = sphere_points(n=3000)
        # Cameras on a 50-degree arc at -z: keep only the surface the wedge
        # actually sees (outward normal facing the cameras), plus a few
        # mis-triangulated outliers the trim must absorb.
        seen = pts[(pts[:, 2] - center[2]) < 0.4 * r_sph]
        rng = np.random.default_rng(7)
        outliers = center + rng.normal(size=(6, 3)) * np.array([3.0, 3.0, 5.0])
        cloud = np.vstack([seen, outliers]).astype(np.float32)

        k = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        poses = []
        for i in range(8):
            ang = np.deg2rad(-25 + 50 * i / 7)
            rvec = np.array([0.0, ang, 0.0])
            rot = np.asarray(so3.exp(rvec))
            cam = center + 12 * np.array([np.sin(ang), 0.0, -np.cos(ang)])
            poses.append(np.concatenate([rvec, -rot @ cam]))
        projs = np.asarray(
            projection.projection_from_extrinsic(
                jnp.asarray(k),
                projection.extrinsics_from_params(jnp.asarray(np.stack(poses))),
            )
        )
        mask = np.ones(len(cloud), bool)
        mask[len(seen):] = True  # outliers NOT masked: the trim must eat them
        hull, carve = volume.hull_and_carved_volume(
            jnp.asarray(cloud),
            jnp.asarray(mask),
            jnp.asarray(projs),
            jnp.ones(8, bool),
            image_size=(640, 480),
            resolution=96,
            dilation=12,
        )
        hull, carve = float(hull), float(carve)
        truth = 4 / 3 * np.pi * r_sph**3
        # The wedge-limited carve overestimates (open cone); the hull must
        # recover truth despite seeing one side + outliers.
        assert carve > hull, (carve, hull)
        assert 0.8 * truth < hull < 1.25 * truth, (hull, truth)

    def test_split_item_points(self):
        item = sphere_points(n=500, center=(0.0, -3.0, 0.0))
        board = np.column_stack(
            [
                np.random.default_rng(2).uniform(0, 8, 300),
                np.zeros(300),
                np.random.default_rng(3).uniform(0, 6, 300),
            ]
        ).astype(np.float32)
        pts = np.vstack([item, board])
        mask = np.ones(len(pts), bool)
        keep = np.asarray(volume.split_item_points(jnp.asarray(pts), jnp.asarray(mask)))
        assert keep[:500].mean() > 0.95
        assert keep[500:].mean() < 0.05

    def test_separable_morphology_matches_2d(self):
        """The carve's separable dilate/erode (rows then columns) must equal
        the full 2-D rectangle ops with the same constant OOB extensions —
        the identity that justified the ~13x tap-count cut in
        ``volume._carve_occupancy``; includes border cells, where the OOB
        contract (dilate joins 0, erode joins "set") is what makes the
        composition exact. Tests the PRODUCTION helpers (the carve calls
        ``volume.maxpool_sep``/``volume.erode_sep`` directly), so drift in
        their init values or window shapes fails here."""
        import jax.lax as lax

        from meatmodeler_tpu.volume import erode_sep, maxpool_sep

        def maxpool2d(g, r):
            return lax.reduce_window(
                g, jnp.float32(0.0), lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
            )

        def erode2d(g, r):
            return -lax.reduce_window(
                -g, jnp.float32(-1.0), lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
            )

        rng = np.random.default_rng(7)
        for shape, rad in [((33, 47), 1), ((33, 47), 5), ((64, 40), 13), ((17, 17), 8)]:
            g = (rng.random(shape) < 0.08).astype(np.float32)
            gj = jnp.asarray(g)
            np.testing.assert_array_equal(
                np.asarray(maxpool_sep(gj, rad)), np.asarray(maxpool2d(gj, rad))
            )
            np.testing.assert_array_equal(
                np.asarray(erode_sep(gj, rad)), np.asarray(erode2d(gj, rad))
            )
            # The composition the carve actually runs: closing then slack.
            closed_sep = maxpool_sep(erode_sep(maxpool_sep(gj, rad), rad), 1)
            closed_2d = maxpool2d(erode2d(maxpool2d(gj, rad), rad), 1)
            np.testing.assert_array_equal(
                np.asarray(closed_sep), np.asarray(closed_2d)
            )


class TestPly:
    def test_round_trip_binary(self, tmp_path):
        pts = np.random.default_rng(4).normal(size=(100, 3)).astype(np.float32)
        p = ply.write_ply(tmp_path / "c.ply", pts, binary=True)
        back = ply.read_ply(p)
        np.testing.assert_allclose(back, pts, rtol=1e-6)

    def test_round_trip_ascii(self, tmp_path):
        pts = np.random.default_rng(5).normal(size=(50, 3)).astype(np.float32)
        p = ply.write_ply(tmp_path / "c.ply", pts, binary=False)
        back = ply.read_ply(p)
        np.testing.assert_allclose(back, pts, rtol=1e-4)


class TestFrameSource:
    def test_ndarray_chunks(self):
        frames = np.random.default_rng(6).integers(0, 255, size=(10, 32, 48, 3), dtype=np.uint8)
        src = video.FrameSource(frames)
        chunks = list(src.chunks(4))
        assert [len(c) for c in chunks] == [4, 4, 2]
        np.testing.assert_array_equal(np.concatenate(chunks), frames)

    def test_grey_promoted_to_bgr(self):
        frames = np.random.default_rng(7).integers(0, 255, size=(3, 16, 16), dtype=np.uint8)
        src = video.FrameSource(frames)
        (chunk,) = list(src.chunks(8))
        assert chunk.shape == (3, 16, 16, 3)

    def test_npy_source(self, tmp_path):
        frames = np.random.default_rng(8).integers(0, 255, size=(5, 16, 16, 3), dtype=np.uint8)
        p = tmp_path / "v.npy"
        np.save(p, frames)
        src = video.FrameSource(p)
        assert sum(len(c) for c in src.chunks(2)) == 5
