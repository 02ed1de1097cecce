"""On-device chessboard detection (ops/board_detect.py).

Replaces the host ``cv2.findChessboardCorners`` (``processor.py:315,319,369``)
— the one stage SURVEY.md §7.3.5 had deferred to host OpenCV. Ground truth
comes from the analytic turntable renderer (exact projected corner pixels).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence
from meatmodeler_tpu.ops import board_detect, chessboard


def _grey(frame):
    return (
        frame[..., 0] * 0.114 + frame[..., 1] * 0.587 + frame[..., 2] * 0.299
    ).astype(np.float32)


@pytest.fixture(scope="module")
def rendered():
    scene = TurntableScene()  # 640x480, (4, 3) pattern, noise sigma 1.5
    frames, _, corners_gt = render_sequence(scene, 5, seed=1)
    return scene, frames, corners_gt


def test_detects_synthetic_board(rendered):
    scene, frames, corners_gt = rendered
    for f, gt in zip(frames[::2], corners_gt[::2]):
        det = board_detect.find_chessboard_device(jnp.asarray(_grey(f)))
        assert bool(det.ok)
        c = np.asarray(det.corners)
        # Every ground-truth corner has a detection within 1.5 px (set match).
        d = np.linalg.norm(c[:, None] - gt[None], axis=-1)
        assert d.min(axis=1).max() < 1.5
        # Grid ORDER: after canonicalization the detection must equal the
        # canonicalized ground truth up to the board's 180-degree symmetry
        # (resolved downstream by orient_corners_to, as for the host path).
        cc = chessboard.canonicalize_corners(c, scene.pattern)
        gg = chessboard.canonicalize_corners(gt.astype(np.float32), scene.pattern)
        err = min(np.abs(cc - gg).max(), np.abs(cc[::-1] - gg).max())
        assert err < 1.5


def test_half_resolution(rendered):
    scene, frames, corners_gt = rendered
    g = _grey(frames[0])[::2, ::2]
    det = board_detect.find_chessboard_device(jnp.asarray(g))
    assert bool(det.ok)
    c = np.asarray(det.corners) * 2.0
    d = np.linalg.norm(c[:, None] - corners_gt[0][None], axis=-1)
    assert d.min(axis=1).max() < 3.0


def test_rejects_boardless_noise():
    rng = np.random.default_rng(0)
    img = rng.normal(128.0, 12.0, size=(240, 320)).astype(np.float32)
    det = board_detect.find_chessboard_device(jnp.asarray(img))
    assert not bool(det.ok)


def test_rejects_boardless_structure(rendered):
    scene, frames, _ = rendered
    # Crop to the item-only half of the frame: textured ellipsoid, no board.
    g = _grey(frames[0])[:, 416:]
    det = board_detect.find_chessboard_device(jnp.asarray(np.ascontiguousarray(g)))
    assert not bool(det.ok)


def test_saddle_candidates_hit_corners(rendered):
    scene, frames, corners_gt = rendered
    cand = board_detect.saddle_candidates(jnp.asarray(_grey(frames[2])), max_candidates=24)
    xy = np.asarray(cand.xy)[np.asarray(cand.mask)]
    d = np.linalg.norm(corners_gt[2][:, None] - xy[None], axis=-1)
    assert d.min(axis=1).max() < 1.0  # all 12 corners among candidates


def test_matches_host_detector(rendered):
    cv2 = pytest.importorskip("cv2")
    scene, frames, _ = rendered
    g = _grey(frames[1])
    det = board_detect.find_chessboard_device(jnp.asarray(g))
    host = chessboard.find_chessboard(g.astype(np.uint8), scene.pattern)
    assert bool(det.ok) and host is not None
    cc = chessboard.canonicalize_corners(np.asarray(det.corners), scene.pattern)
    hh = chessboard.canonicalize_corners(host, scene.pattern)
    err = min(np.abs(cc - hh).max(), np.abs(cc[::-1] - hh).max())
    assert err < 2.0
