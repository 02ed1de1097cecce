"""Synthetic turntable-scene renderer with exact ground truth.

The integration-test and benchmark workload (SURVEY.md §4, §6): the reference
was built for videos of a food item rotating past a calibration chessboard
(``README.md:2``), but ships no data and no tests. This module renders that
scene analytically — a tiny vectorized ray tracer over a plane-bound
chessboard and a textured ellipsoid "food item" — so every test has exact
ground truth: K, per-frame poses, board corner pixels, and the object's true
volume (4/3 pi abc).

Rays are cast per pixel; the chessboard quad lives in the X-Z plane (y = 0)
with the same layout the reference hard-codes (``processor.py:162-166``,
(4, 3) inner corners, side length 2), the ellipsoid floats above it.
NumPy on host — rendering is test scaffolding, not a pipeline stage.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["TurntableScene", "render_sequence"]


def _speckle(px, py, pz, m):
    """Aperiodic surface speckle at world point (px, py, pz); ``m`` is the
    array module (numpy or jax.numpy — the two renderers must match).

    Five incommensurate 3D-coupled sinusoids: a texture with a single
    low-frequency period (the original ``sin(7x)cos(6z)``) is a barber pole
    — surface points one period apart are visually IDENTICAL, descriptor
    matching locks onto the moving phase instead of the moving surface
    (measured: matched flow dx ~2.7 px where the true surface flow is
    6.3 px), and no robust estimator can recover pose from consistently
    aliased correspondences. Incommensurate frequencies make every patch on
    the object unique at ORB-patch scale, like real-world texture.
    """
    return (
        150.0
        + 30.0 * m.sin(7.13 * px + 3.71 * pz + 0.9)
        + 26.0 * m.cos(11.71 * pz - 2.93 * py + 0.4)
        + 22.0 * m.sin(9.41 * py + 2.17 * px + 2.2)
        + 18.0 * m.sin(15.97 * px - 7.73 * pz + 1.1)
        + 14.0 * m.cos(21.31 * py + 5.09 * pz + 3.0)
    )


@dataclasses.dataclass(frozen=True)
class TurntableScene:
    """Scene + camera-rig description. Distances in board-square units
    (side_length scales the squares like ``processor.py:434``)."""

    image_size: Tuple[int, int] = (640, 480)  # (W, H)
    pattern: Tuple[int, int] = (4, 3)  # inner corners
    side_length: float = 2.0
    # Ellipsoid semi-axes and center (the "food item" sits beside the board
    # so both stay visible — the reference's scenario has the item rotating
    # past the chessboard, not covering it).
    ellipsoid_axes: Tuple[float, float, float] = (2.0, 1.5, 1.8)
    ellipsoid_center: Tuple[float, float, float] = (11.5, -1.8, 2.0)
    # Camera ring: radius, height (negative y is "up" in OpenCV convention),
    # arc swept over the sequence, look-at target.
    ring_radius: float = 18.0
    ring_height: float = -8.5
    arc_degrees: float = 50.0
    focal: float = 700.0
    noise_sigma: float = 1.5
    # False renders the ground plane as a uniform white sheet (no checker
    # squares): the marker-free test scene, where the only trackable
    # structure is the ellipsoid's speckle texture.
    show_board: bool = True
    # Amplitude (grey levels) of a weak aperiodic speckle on the ground
    # sheet's white areas. 0 = perfectly uniform sheet. A compact textured
    # object over a FEATURELESS ground is gauge-ambiguous for monocular SfM
    # (the bas-relief family: measured on the 24-frame marker-free clip, a
    # pose 27 deg off reprojects every observation at 0.58 px, tying the
    # truth at 0.53 — no estimator can separate them from image evidence).
    # Real tabletop scenes have surface grain; a few grey levels of it puts
    # background parallax in view and makes the scene well-posed, so the
    # marker-free accuracy gates use ground_texture > 0.
    ground_texture: float = 0.0

    @property
    def intrinsics(self) -> np.ndarray:
        w, h = self.image_size
        return np.array(
            [[self.focal, 0.0, w / 2.0], [0.0, self.focal, h / 2.0], [0.0, 0.0, 1.0]]
        )

    @property
    def volume(self) -> float:
        a, b, c = self.ellipsoid_axes
        return 4.0 / 3.0 * np.pi * a * b * c

    def board_corners_3d(self) -> np.ndarray:
        """(N, 3) inner-corner world points, X-Z plane, y = 0 — the layout of
        ``poseEstimation`` (``processor.py:162-166``)."""
        x, y = self.pattern
        grid = np.mgrid[0:x, 0:y].T.reshape(-1, 2) * self.side_length
        pts = np.zeros((x * y, 3), np.float64)
        pts[:, 0] = grid[:, 0]
        pts[:, 2] = grid[:, 1]
        return pts


def camera_pose(scene: TurntableScene, t: float) -> Tuple[np.ndarray, np.ndarray]:
    """World->camera (R, tvec) for normalized time t in [0, 1] along the arc,
    looking at the scene center."""
    ang = np.deg2rad(scene.arc_degrees) * (t - 0.5)
    # Aim between the board center and the item so both stay in frame.
    x, y = scene.pattern
    board_center = np.array(
        [(x - 1) * scene.side_length / 2.0, 0.0, (y - 1) * scene.side_length / 2.0]
    )
    target = 0.5 * (board_center + np.array(scene.ellipsoid_center))
    center = target + np.array(
        [scene.ring_radius * np.sin(ang), scene.ring_height, -scene.ring_radius * np.cos(ang)]
    )

    # Look-at: camera z axis points at the target.
    fwd = target - center
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])  # OpenCV y-down convention; -y is up
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd])  # rows: camera axes in world coords
    tvec = -rot @ center
    return rot, tvec


def _checker_color(u: np.ndarray, v: np.ndarray, scene: TurntableScene) -> np.ndarray:
    """Chessboard shading in board-plane coords (world x, z). The (4, 3)
    inner-corner pattern needs a 5x4 field of squares; corners sit on the
    integer grid {0..3} x {0..2} at square boundaries."""
    s = scene.side_length
    # Shift so corner (0,0) is a square intersection: squares span
    # [-1, 4] x [-1, 3] in corner units.
    iu = np.floor(u / s + 1.0)
    iv = np.floor(v / s + 1.0)
    x, y = scene.pattern
    in_board = (u >= -s) & (u <= x * s) & (v >= -s) & (v <= y * s)
    # White border apron around the squares (required by board detectors).
    in_apron = (u >= -2.2 * s) & (u <= (x + 1.2) * s) & (v >= -2.2 * s) & (v <= (y + 1.2) * s)
    checker = np.where((iu + iv) % 2 == 0, 235.0, 20.0)
    if not scene.show_board:
        checker = np.full_like(checker, 235.0)
    color = np.where(in_board, checker, np.where(in_apron, 235.0, np.nan))
    if scene.ground_texture > 0:
        # Weak sheet grain on the white areas only (dark squares keep their
        # detector contrast). _speckle at plane coords stays aperiodic.
        grain = scene.ground_texture * (_speckle(u, 0.0, v, np) - 150.0) / 110.0
        color = np.where(color > 128, np.clip(color + grain, 0, 255), color)
    return color


def _render_frame(scene: TurntableScene, rot: np.ndarray, tvec: np.ndarray, rng) -> np.ndarray:
    w, h = scene.image_size
    k = scene.intrinsics

    # Rays in world space.
    xs = (np.arange(w) - k[0, 2]) / k[0, 0]
    ys = (np.arange(h) - k[1, 2]) / k[1, 1]
    dirs_cam = np.stack(
        [np.tile(xs, (h, 1)), np.tile(ys[:, None], (1, w)), np.ones((h, w))], axis=-1
    )
    dirs = dirs_cam @ rot  # R^T @ d for each pixel
    origin = -rot.T @ tvec

    img = np.full((h, w), 135.0)  # grey background
    depth = np.full((h, w), np.inf)

    # --- chessboard plane y = 0 ---
    dy = dirs[..., 1]
    tt = np.where(np.abs(dy) > 1e-9, -origin[1] / dy, np.inf)
    hit = tt > 0.1
    pu = origin[0] + tt * dirs[..., 0]
    pv = origin[2] + tt * dirs[..., 2]
    color = _checker_color(pu, pv, scene)
    plane_ok = hit & ~np.isnan(color)
    img = np.where(plane_ok & (tt < depth), color, img)
    depth = np.where(plane_ok, np.minimum(depth, tt), depth)

    # --- ellipsoid ---
    c = np.array(scene.ellipsoid_center)
    ax = np.array(scene.ellipsoid_axes)
    oc = (origin - c) / ax
    d_s = dirs / ax
    a_q = np.sum(d_s * d_s, axis=-1)
    b_q = 2.0 * np.sum(d_s * oc, axis=-1)
    c_q = np.sum(oc * oc) - 1.0
    disc = b_q * b_q - 4 * a_q * c_q
    t_hit = np.where(disc >= 0, (-b_q - np.sqrt(np.maximum(disc, 0))) / (2 * a_q), np.inf)
    ell_ok = (t_hit > 0.1) & (t_hit < depth)

    # Procedural surface texture (trackable speckle) + Lambert shading.
    with np.errstate(invalid="ignore"):
        t_safe = np.where(np.isfinite(t_hit), t_hit, 0.0)
        p_hit = origin + t_safe[..., None] * dirs
        n = (p_hit - c) / (ax * ax)
        n_norm = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        light = np.array([0.4, -0.8, 0.45])
        light = light / np.linalg.norm(light)
        lam = np.clip(np.einsum("...i,i", n_norm, -light), 0.35, 1.0)
        tex = _speckle(p_hit[..., 0], p_hit[..., 1], p_hit[..., 2], np)
        img = np.where(ell_ok, np.clip(tex * lam, 15, 250), img)

    if scene.noise_sigma > 0:
        img = img + rng.normal(scale=scene.noise_sigma, size=img.shape)
    return np.clip(img, 0, 255)


def render_sequence(
    scene: TurntableScene,
    num_frames: int,
    seed: int = 0,
    color: bool = True,
    backend: str = "numpy",
):
    """Render the turntable sequence.

    Args:
      backend: "numpy" (reference implementation, bit-stable across runs) or
        "jax" (same math batched over frames on the default JAX device —
        ~orders faster for the 1080p benchmark clip; noise differs in bit
        pattern, not distribution).

    Returns:
      frames: (T, H, W, 3) uint8 BGR (or (T, H, W) grey if color=False),
      poses: (T, 6) ground-truth [rvec, tvec],
      corners: (T, N, 2) ground-truth projected inner-corner pixels.
    """
    from meatmodeler_tpu.geometry import so3  # lazy; host-side numpy use

    rng = np.random.default_rng(seed)
    board = scene.board_corners_3d()
    k = scene.intrinsics

    rots, tvecs, poses, corners = [], [], [], []
    for i in range(num_frames):
        t = i / max(num_frames - 1, 1)
        rot, tvec = camera_pose(scene, t)
        rots.append(rot)
        tvecs.append(tvec)
        rvec = np.asarray(so3.log(rot))
        poses.append(np.concatenate([rvec, tvec]))
        cam = (rot @ board.T).T + tvec
        proj = (k @ cam.T).T
        corners.append(proj[:, :2] / proj[:, 2:3])

    if backend == "jax":
        frames = _render_frames_jax(scene, np.stack(rots), np.stack(tvecs), seed, color)
    else:
        frames = []
        for rot, tvec in zip(rots, tvecs):
            grey = _render_frame(scene, rot, tvec, rng)
            frames.append(_tint(grey) if color else grey.astype(np.uint8))
        frames = np.stack(frames)

    return frames, np.stack(poses), np.stack(corners)


def _tint(grey: np.ndarray) -> np.ndarray:
    """Mild channel tinting so the BGR->LAB->CLAHE path is exercised."""
    return np.stack(
        [
            np.clip(grey * 0.96 + 4, 0, 255),
            np.clip(grey * 1.0, 0, 255),
            np.clip(grey * 1.03, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)


def _render_frames_jax(
    scene: TurntableScene, rots: np.ndarray, tvecs: np.ndarray, seed: int, color: bool
) -> np.ndarray:
    """The same ray tracer as ``_render_frame``, batched over frames in JAX.

    One jitted program renders a frame chunk on the default device; the
    300-frame 1080p benchmark clip renders in seconds instead of the better
    part of an hour of single-core NumPy.
    """
    import jax
    import jax.numpy as jnp

    w, h = scene.image_size
    k = scene.intrinsics
    s = scene.side_length
    px, py = scene.pattern
    c = jnp.asarray(scene.ellipsoid_center, jnp.float32)
    ax = jnp.asarray(scene.ellipsoid_axes, jnp.float32)

    xs = (np.arange(w) - k[0, 2]) / k[0, 0]
    ys = (np.arange(h) - k[1, 2]) / k[1, 1]
    dirs_cam = np.stack(
        [np.tile(xs, (h, 1)), np.tile(ys[:, None], (1, w)), np.ones((h, w))], axis=-1
    ).astype(np.float32)
    dirs_cam_j = jnp.asarray(dirs_cam)

    def render_one(rot, tvec, noise):
        dirs = dirs_cam_j @ rot  # R^T d per pixel
        origin = -rot.T @ tvec

        img = jnp.full((h, w), 135.0, jnp.float32)
        depth = jnp.full((h, w), jnp.inf, jnp.float32)

        # --- chessboard plane y = 0 ---
        dy = dirs[..., 1]
        tt = jnp.where(jnp.abs(dy) > 1e-9, -origin[1] / dy, jnp.inf)
        hit = tt > 0.1
        pu = origin[0] + tt * dirs[..., 0]
        pv = origin[2] + tt * dirs[..., 2]
        iu = jnp.floor(pu / s + 1.0)
        iv = jnp.floor(pv / s + 1.0)
        in_board = (pu >= -s) & (pu <= px * s) & (pv >= -s) & (pv <= py * s)
        in_apron = (
            (pu >= -2.2 * s) & (pu <= (px + 1.2) * s) & (pv >= -2.2 * s) & (pv <= (py + 1.2) * s)
        )
        checker = jnp.where((iu + iv) % 2 == 0, 235.0, 20.0)
        if not scene.show_board:
            checker = jnp.full_like(checker, 235.0)
        color_v = jnp.where(in_board, checker, 235.0)
        if scene.ground_texture > 0:
            # Mirror of _checker_color's sheet grain (white areas only).
            grain = (
                scene.ground_texture * (_speckle(pu, 0.0, pv, jnp) - 150.0) / 110.0
            )
            color_v = jnp.where(
                color_v > 128, jnp.clip(color_v + grain, 0, 255), color_v
            )
        plane_ok = hit & (in_board | in_apron)
        img = jnp.where(plane_ok & (tt < depth), color_v, img)
        depth = jnp.where(plane_ok, jnp.minimum(depth, tt), depth)

        # --- ellipsoid ---
        oc = (origin - c) / ax
        d_s = dirs / ax
        a_q = jnp.sum(d_s * d_s, axis=-1)
        b_q = 2.0 * jnp.sum(d_s * oc, axis=-1)
        c_q = jnp.sum(oc * oc) - 1.0
        disc = b_q * b_q - 4 * a_q * c_q
        t_hit = jnp.where(disc >= 0, (-b_q - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a_q), jnp.inf)
        ell_ok = (t_hit > 0.1) & (t_hit < depth)

        t_safe = jnp.where(jnp.isfinite(t_hit), t_hit, 0.0)
        p_hit = origin + t_safe[..., None] * dirs
        n = (p_hit - c) / (ax * ax)
        n_norm = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        light = np.array([0.4, -0.8, 0.45])
        light = jnp.asarray(light / np.linalg.norm(light), jnp.float32)
        lam = jnp.clip(jnp.einsum("...i,i", n_norm, -light), 0.35, 1.0)
        tex = _speckle(p_hit[..., 0], p_hit[..., 1], p_hit[..., 2], jnp)
        img = jnp.where(ell_ok, jnp.clip(tex * lam, 15, 250), img)

        grey = jnp.clip(img + scene.noise_sigma * noise, 0, 255)
        if color:
            return jnp.stack(
                [
                    jnp.clip(grey * 0.96 + 4, 0, 255),
                    grey,
                    jnp.clip(grey * 1.03, 0, 255),
                ],
                axis=-1,
            ).astype(jnp.uint8)
        return grey.astype(jnp.uint8)

    chunk = max(1, min(16, int(2e8 // (h * w * 4))))
    run = jax.jit(jax.vmap(render_one))
    key = jax.random.PRNGKey(seed)
    out = []
    for i in range(0, len(rots), chunk):
        r = jnp.asarray(rots[i : i + chunk], jnp.float32)
        t = jnp.asarray(tvecs[i : i + chunk], jnp.float32)
        n_pad = chunk - len(r)
        if n_pad:
            r = jnp.concatenate([r, jnp.repeat(r[-1:], n_pad, 0)])
            t = jnp.concatenate([t, jnp.repeat(t[-1:], n_pad, 0)])
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (chunk, h, w), jnp.float32) if scene.noise_sigma > 0 else jnp.zeros((chunk, h, w), jnp.float32)
        out.append(np.asarray(run(r, t, noise))[: len(rots[i : i + chunk])])
    return np.concatenate(out)


def degrade_sequence(
    frames: np.ndarray,
    kind: str,
    seed: int = 0,
    strength: float = 1.0,
) -> np.ndarray:
    """Apply a capture degradation family to a rendered clip (uint8 BGR).

    The reference was built for hand-held food videos
    (``/root/reference/README.md:1-2``, ``processor.py:294-319``) — real
    captures carry sensor noise, motion blur, exposure drift, codec
    artifacts, and occasional occlusions that a clean synthetic render
    never shows. These families drive the bench's robustness section
    (BENCH ``robustness``): each is applied POST-render so the
    ground-truth geometry (poses, corners, volume) is unchanged and the
    pipeline's accuracy under degradation is measurable against the same
    truth.

    Kinds:
      "noise"     — additive Gaussian sensor noise, sigma = 8 * strength.
      "blur"      — linear motion blur, kernel length ~ 9 * strength px
                    (horizontal: the turntable pan direction).
      "flicker"   — sinusoidal exposure gain, +-25% * strength across the
                    clip (auto-exposure hunting / mains flicker).
      "jpeg"      — per-frame JPEG encode/decode at quality
                    ~ 40 / strength (blocking + chroma artifacts; the
                    closest available stand-in for codec artifacts).
      "occlusion" — a grey rectangle (~18% * strength of the frame's short
                    side) drifting over the lower-center region where the
                    board sits, on a third of the frames.
    """
    rng = np.random.default_rng(seed)
    out = np.asarray(frames)
    t, h, w = out.shape[:3]
    if kind == "noise":
        noisy = out.astype(np.float32) + rng.normal(
            0.0, 8.0 * strength, size=out.shape
        ).astype(np.float32)
        return np.clip(noisy, 0, 255).astype(np.uint8)
    if kind == "blur":
        k = max(3, int(round(9 * strength)) | 1)
        kernel = np.ones(k, np.float32) / k
        blurred = out.astype(np.float32)
        # Separable horizontal box blur via cumsum (fast on the weak host).
        pad = np.pad(blurred, ((0, 0), (0, 0), (k // 2, k // 2), (0, 0)), mode="edge")
        cs = np.cumsum(pad, axis=2)
        blurred = (cs[:, :, k - 1 :] - np.concatenate(
            [np.zeros_like(cs[:, :, :1]), cs[:, :, : -k]], axis=2
        )) / k
        return np.clip(blurred, 0, 255).astype(np.uint8)
    if kind == "flicker":
        phase = rng.uniform(0, 2 * np.pi)
        gain = 1.0 + 0.25 * strength * np.sin(
            np.linspace(0, 6 * np.pi, t) + phase
        )
        return np.clip(
            out.astype(np.float32) * gain[:, None, None, None], 0, 255
        ).astype(np.uint8)
    if kind == "jpeg":
        import cv2

        q = int(np.clip(40 / max(strength, 1e-3), 5, 95))
        enc = [int(cv2.IMWRITE_JPEG_QUALITY), q]
        dec = np.empty_like(out)
        for i in range(t):
            ok, buf = cv2.imencode(".jpg", out[i], enc)
            assert ok
            dec[i] = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        return dec
    if kind == "occlusion":
        occ = out.copy()
        side = int(min(h, w) * 0.18 * strength)
        for i in range(t):
            if i % 3:
                continue
            cy = int(h * 0.62 + 0.1 * h * np.sin(i / 7.0))
            cx = int(w * 0.5 + 0.25 * w * np.cos(i / 11.0))
            y0, x0 = max(cy - side // 2, 0), max(cx - side // 2, 0)
            occ[i, y0 : y0 + side, x0 : x0 + side] = 96
        return occ
    raise ValueError(f"unknown degradation kind: {kind!r}")
