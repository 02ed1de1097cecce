"""Ideal (exact-silhouette) visual hull of a turntable scene's ellipsoid.

Answers "how big SHOULD the voxel carve be?": the carve estimator
(``volume.carved_volume``) reports the visual hull of the item from the
clip's view wedge, and from a partial arc that hull is geometrically much
larger than the item — no silhouette method can close the unseen cone.
This tool computes that information-theoretic bound with EXACT analytic
silhouettes (a voxel is inside a view's silhouette iff the ray from the
camera centre through it intersects the ellipsoid), removing every splat /
dilation / closing approximation the real carve makes.

Decision record (bench scene, 1080p, focal 1500, default 50-degree arc,
20 evenly spaced views, R=96):

    truth 22.619   ideal_visual_hull 36.360   ratio 1.607

i.e. the IDEAL carve from this wedge is +61% over truth. The round-3 bench's
measured carve (+92%) is that geometric floor plus splat-closing slack and
the 0.9 vote fraction; the round-2 carve's -0.6% was an accidental
cancellation of silhouette UNDER-coverage (sparse feature splats) against
the wedge's intrinsic OVER-coverage — the round-3 cloud improvements
(n-view triangulation, tighter reprojection gating, denser keyframes)
removed the under-coverage and exposed the true bound. This is why
``volume`` (symmetric-completion hull ∩ carve) is the headline estimator
and ``volume_carved`` is reported as a diagnostic upper bound only
(see volume.hull_and_carved_volume's docstring).

Usage:  python tools/ideal_visual_hull.py [--views 20] [--res 96]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from meatmodeler_tpu.io.synthetic import TurntableScene, camera_pose  # noqa: E402


def ideal_visual_hull(scene: TurntableScene, n_views: int, res: int) -> float:
    """Volume of the exact-silhouette visual hull from n evenly spaced views."""
    c = np.array(scene.ellipsoid_center)
    ax = np.array(scene.ellipsoid_axes)

    lo = c - ax * 1.3
    hi = c + ax * 1.3
    grids = [(np.arange(res) + 0.5) / res * (hi[i] - lo[i]) + lo[i] for i in range(3)]
    x, y, z = np.meshgrid(*grids, indexing="ij")
    voxels = np.stack([x, y, z], -1).reshape(-1, 3)
    voxel_vol = np.prod(hi - lo) / res**3

    inside = np.ones(len(voxels), bool)
    for t in np.linspace(0.0, 1.0, n_views):
        rot, tvec = camera_pose(scene, t)
        cam = -rot.T @ tvec  # camera centre in world coordinates
        # Ray cam -> voxel intersects the ellipsoid iff the quadratic
        # |o' + s d'|^2 = 1 (coordinates scaled by the axes) has a real root.
        d_scaled = (voxels - cam) / ax
        o_scaled = (cam - c) / ax
        a2 = np.sum(d_scaled * d_scaled, axis=1)
        b2 = 2.0 * np.sum(d_scaled * o_scaled, axis=1)
        c2 = np.sum(o_scaled * o_scaled) - 1.0
        disc = b2 * b2 - 4.0 * a2 * c2
        # A real root alone tests the infinite LINE; the silhouette needs the
        # ellipsoid on the FORWARD ray (s >= 0). With the camera outside the
        # ellipsoid (c2 > 0) the two roots share their sign, so the larger
        # root's sign decides: s+ = (-b2 + sqrt(disc)) / (2 a2) >= 0 iff
        # -b2 + sqrt(disc) >= 0. (ADVICE r3: the default bench geometry
        # never exercised the difference, but a --arc/--focal combination
        # that looks AWAY from the item must not count the behind-camera
        # intersection as a silhouette hit.)
        hits = disc >= 0
        hits &= (-b2 + np.sqrt(np.maximum(disc, 0.0))) >= 0
        inside &= hits
    return float(inside.sum() * voxel_vol)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--focal", type=float, default=1500.0)
    ap.add_argument("--arc", type=float, default=50.0)
    args = ap.parse_args(argv)

    scene = TurntableScene(
        image_size=(args.width, args.height), focal=args.focal,
        arc_degrees=args.arc,
    )
    vh = ideal_visual_hull(scene, args.views, args.res)
    print(
        f"truth {scene.volume:.3f}  ideal_visual_hull {vh:.3f}  "
        f"ratio {vh / scene.volume:.3f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
