"""ORB + Hamming-matmul matcher tests (SURVEY.md §4 unit strategy).

FAST ring test against a truth table; Hamming matmul vs direct XOR popcount;
end-to-end: detect+describe on an image pair and check the matches recover
the known transform (the downstream-parity contract of SURVEY.md §7.3.2).
"""

import pytest
import cv2
import numpy as np

from meatmodeler_tpu.ops import matching, orb


def textured_image(h=240, w=320, seed=0, n=70):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx = rng.uniform(20, h - 20), rng.uniform(20, w - 20)
        img += rng.uniform(50, 180) * np.exp(
            -(((yy - cy) / rng.uniform(2, 6)) ** 2 + ((xx - cx) / rng.uniform(2, 6)) ** 2)
        )
    return np.clip(img, 0, 255).astype(np.float32)


class TestFast:
    def test_synthetic_corner_truth_table(self):
        """A bright square on dark background: FAST fires at its corners and
        not along the straight edges or flat regions."""
        img = np.zeros((64, 64), np.float32)
        img[20:44, 20:44] = 200.0
        mask = np.asarray(orb.fast_score(img, threshold=20.0))
        # Corner pixels just inside the square should respond.
        assert mask[20:23, 20:23].sum() > 0
        assert mask[41:44, 41:44].sum() > 0
        # Flat interior and background must not respond.
        assert mask[30:34, 30:34].sum() == 0
        assert mask[2:10, 2:10].sum() == 0
        # Edge midpoints must not respond (segment test needs a corner).
        assert mask[20:22, 30:34].sum() == 0

    def test_agrees_with_cv2_fast_locations(self):
        img = textured_image(seed=1)
        mask = np.asarray(orb.fast_score(img, threshold=20.0))
        fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
        kps = fast.detect(img.astype(np.uint8), None)
        cv_pts = np.array([kp.pt for kp in kps]) if kps else np.zeros((0, 2))
        ours = np.argwhere(mask > 0)[:, ::-1]  # (x, y)
        if len(cv_pts) and len(ours):
            d = np.linalg.norm(cv_pts[:, None] - ours[None], axis=-1).min(axis=1)
            assert np.mean(d <= 1.5) > 0.9, np.mean(d <= 1.5)


class TestHamming:
    def test_matmul_equals_xor_popcount(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 2, size=(37, 256)).astype(np.int8)
        b = rng.integers(0, 2, size=(53, 256)).astype(np.int8)
        ours = np.asarray(matching.hamming_matrix(a, b))
        expected = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(ours.astype(int), expected)

    def test_ratio_and_crosscheck(self):
        rng = np.random.default_rng(3)
        train = rng.integers(0, 2, size=(64, 256)).astype(np.int8)
        # Queries 0..9 are noisy copies of train 10..19 — must match them.
        query = train[10:20].copy()
        flips = rng.integers(0, 256, size=(10, 12))
        for i in range(10):
            query[i, flips[i]] ^= 1
        m = matching.match_descriptors(
            query,
            train,
            np.ones(10, bool),
            np.ones(64, bool),
            max_matches=16,
        )
        mask = np.asarray(m.mask)
        qi, ti = np.asarray(m.query_idx)[mask], np.asarray(m.train_idx)[mask]
        assert mask.sum() >= 8
        assert (ti == qi + 10).all()

    def test_masked_slots_never_match(self):
        rng = np.random.default_rng(4)
        desc = rng.integers(0, 2, size=(16, 256)).astype(np.int8)
        qmask = np.ones(16, bool)
        qmask[8:] = False
        m = matching.match_descriptors(desc, desc, qmask, qmask, cross_check=False, ratio=1.1, max_matches=16)
        valid_q = np.asarray(m.query_idx)[np.asarray(m.mask)]
        assert (valid_q < 8).all()


class TestOrbEndToEnd:
    def test_detect_shapes(self):
        img = textured_image(seed=5)
        f = orb.detect_and_compute(img, max_features=256, num_levels=3)
        assert f.xy.shape == (256, 2)
        assert f.descriptors.shape == (256, 256)
        assert f.descriptors.dtype == np.int8
        assert np.asarray(f.mask).sum() > 20

    @pytest.mark.slow
    def test_budget_larger_than_image(self):
        """Deep pyramid levels (and tiny warmup probes) can have fewer
        pixels than the level's feature budget; the static capacity must
        pad with masked slots instead of crashing top-k (k > n)."""
        img = textured_image(h=48, w=64, seed=6, n=40)
        f = orb.detect_and_compute(img, max_features=8192, num_levels=3)
        assert f.xy.shape == (8192, 2)
        mask = np.asarray(f.mask)
        assert 0 < mask.sum() < 48 * 64
        # Padded slots are invalid and carry no response.
        assert not np.isfinite(np.asarray(f.response)[~mask]).any()

    def test_matches_recover_known_shift(self):
        img = textured_image(seed=6)
        dx, dy = 7.0, -4.0
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        img2 = cv2.warpAffine(img, m, (img.shape[1], img.shape[0]))

        f1 = orb.detect_and_compute(img, max_features=512, num_levels=3)
        f2 = orb.detect_and_compute(img2, max_features=512, num_levels=3)
        mm = matching.match_descriptors(
            f1.descriptors, f2.descriptors, f1.mask, f2.mask, max_matches=256
        )
        mk = np.asarray(mm.mask)
        assert mk.sum() >= 30, mk.sum()
        p1 = np.asarray(f1.xy)[np.asarray(mm.query_idx)[mk]]
        p2 = np.asarray(f2.xy)[np.asarray(mm.train_idx)[mk]]
        flow = p2 - p1
        med = np.median(flow, axis=0)
        np.testing.assert_allclose(med, [dx, dy], atol=1.0)
        # Most matches agree with the global shift (low outlier rate).
        inliers = np.linalg.norm(flow - np.array([dx, dy]), axis=1) < 2.0
        assert inliers.mean() > 0.7, inliers.mean()

    def test_matches_survive_rotation(self):
        """Steered BRIEF: matches must survive an in-plane rotation."""
        img = textured_image(seed=7)
        center = (img.shape[1] / 2, img.shape[0] / 2)
        rot = cv2.getRotationMatrix2D(center, 25.0, 1.0)
        img2 = cv2.warpAffine(img, rot, (img.shape[1], img.shape[0]))

        f1 = orb.detect_and_compute(img, max_features=512, num_levels=3)
        f2 = orb.detect_and_compute(img2, max_features=512, num_levels=3)
        mm = matching.match_descriptors(
            f1.descriptors, f2.descriptors, f1.mask, f2.mask, max_matches=256
        )
        mk = np.asarray(mm.mask)
        assert mk.sum() >= 20, mk.sum()
        p1 = np.asarray(f1.xy)[np.asarray(mm.query_idx)[mk]]
        p2 = np.asarray(f2.xy)[np.asarray(mm.train_idx)[mk]]
        # Apply the true rotation to p1; most matches should land on p2.
        p1h = np.hstack([p1, np.ones((len(p1), 1))])
        pred = p1h @ rot.T
        inliers = np.linalg.norm(pred - p2, axis=1) < 2.5
        assert inliers.mean() > 0.5, inliers.mean()
