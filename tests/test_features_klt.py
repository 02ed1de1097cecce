"""Shi-Tomasi + pyramidal KLT golden tests vs OpenCV (SURVEY.md §4)."""

import pytest
import cv2
import numpy as np

from meatmodeler_tpu.ops import features, klt


def textured_image(h=240, w=320, seed=0, n_blobs=60):
    """Random blobby texture with trackable structure."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        cy, cx = rng.uniform(20, h - 20), rng.uniform(20, w - 20)
        sy, sx = rng.uniform(2, 6), rng.uniform(2, 6)
        amp = rng.uniform(60, 200)
        yy, xx = np.mgrid[0:h, 0:w]
        img += amp * np.exp(-(((yy - cy) / sy) ** 2 + ((xx - cx) / sx) ** 2))
    return np.clip(img, 0, 255)


def shift_image(img, dx, dy):
    """Subpixel shift via cv2.warpAffine (ground-truth flow = (dx, dy))."""
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, m, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR)


class TestGoodFeatures:
    def test_finds_cv2s_strong_corners(self):
        img = textured_image()
        ours = features.good_features(img, max_corners=100, quality_level=0.01, min_distance=7)
        xy = np.asarray(ours.xy)[np.asarray(ours.mask)]
        cv = cv2.goodFeaturesToTrack(
            img.astype(np.uint8), maxCorners=100, qualityLevel=0.01, minDistance=7, blockSize=7
        ).reshape(-1, 2)
        # Statistical parity: most cv2 corners should have one of ours within
        # a couple of pixels (grid suppression vs greedy changes the set at
        # the margin).
        d = np.linalg.norm(cv[:, None, :] - xy[None, :, :], axis=-1).min(axis=1)
        assert np.mean(d < 3.0) > 0.75, np.mean(d < 3.0)

    def test_static_shapes_and_mask(self):
        img = textured_image(seed=1)
        c = features.good_features(img, max_corners=64)
        assert c.xy.shape == (64, 2)
        assert c.mask.shape == (64,)
        # Responses sorted descending among valid entries.
        r = np.asarray(c.response)[np.asarray(c.mask)]
        assert (np.diff(r) <= 1e-6).all()

    def test_min_distance_respected(self):
        img = textured_image(seed=2)
        c = features.good_features(img, max_corners=200, min_distance=10)
        xy = np.asarray(c.xy)[np.asarray(c.mask)]
        if len(xy) > 1:
            d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
            np.fill_diagonal(d, np.inf)
            # Best-per-cell guarantees >= cell spacing for most pairs; corners
            # in adjacent cells can be close, but never coincident.
            assert d.min() >= 1.0

    def test_blank_image_all_masked(self):
        c = features.good_features(np.zeros((64, 64), np.float32), max_corners=16)
        assert not np.asarray(c.mask).any() or np.asarray(c.response).max() <= 0.0


class TestLucasKanade:
    @pytest.mark.slow
    def test_recovers_known_shift(self):
        img = textured_image(seed=3)
        dx, dy = 3.4, -2.2
        img2 = shift_image(img, dx, dy)
        corners = features.good_features(img, max_corners=50)
        pts = np.asarray(corners.xy)[np.asarray(corners.mask)][:30]

        pyr1 = tuple(klt.build_pyramid(img, 4))
        pyr2 = tuple(klt.build_pyramid(img2, 4))
        res = klt.lucas_kanade(pyr1, pyr2, pts.astype(np.float32))
        st = np.asarray(res.status)
        flow = np.asarray(res.points) - pts
        # Interior points must recover the shift to subpixel accuracy.
        interior = (
            (pts[:, 0] > 30) & (pts[:, 0] < 290) & (pts[:, 1] > 30) & (pts[:, 1] < 210)
        )
        good = st & interior
        assert good.sum() >= 10
        err = np.abs(flow[good] - np.array([dx, dy]))
        assert np.median(err) < 0.1, np.median(err)

    @pytest.mark.slow
    def test_matches_cv2_tracks(self):
        img = textured_image(seed=4)
        img2 = shift_image(img, 1.7, 2.9)
        corners = features.good_features(img, max_corners=40)
        pts = np.asarray(corners.xy)[np.asarray(corners.mask)][:20].astype(np.float32)

        cv_pts, cv_st, cv_err = cv2.calcOpticalFlowPyrLK(
            img.astype(np.uint8),
            img2.astype(np.uint8),
            pts.reshape(-1, 1, 2),
            None,
            winSize=(21, 21),
            maxLevel=3,
        )
        pyr1 = tuple(klt.build_pyramid(img, 4))
        pyr2 = tuple(klt.build_pyramid(img2, 4))
        res = klt.lucas_kanade(pyr1, pyr2, pts)

        both = np.asarray(res.status) & (cv_st.ravel() == 1)
        assert both.sum() >= 10
        diff = np.linalg.norm(np.asarray(res.points)[both] - cv_pts.reshape(-1, 2)[both], axis=1)
        assert np.median(diff) < 0.5, np.median(diff)

    def test_error_measures_residual(self):
        img = textured_image(seed=5)
        img2 = shift_image(img, 1.0, 0.0) + 5.0  # brightness change -> residual
        corners = features.good_features(img, max_corners=20)
        pts = np.asarray(corners.xy)[np.asarray(corners.mask)][:10].astype(np.float32)
        pyr1 = tuple(klt.build_pyramid(img, 3))
        pyr2 = tuple(klt.build_pyramid(img2, 3))
        res = klt.lucas_kanade(pyr1, pyr2, pts)
        errs = np.asarray(res.error)[np.asarray(res.status)]
        assert (errs > 1.0).all()  # at least the brightness offset

    def test_masked_points_skipped(self):
        img = textured_image(seed=6)
        img2 = shift_image(img, 1.0, 1.0)
        pts = np.array([[50.0, 50.0], [0.0, 0.0]], np.float32)
        mask = np.array([True, False])
        pyr1 = tuple(klt.build_pyramid(img, 3))
        pyr2 = tuple(klt.build_pyramid(img2, 3))
        res = klt.lucas_kanade(pyr1, pyr2, pts, point_mask=mask)
        assert not bool(np.asarray(res.status)[1])
