"""Multi-scene validation harness for the hull volume estimator.

The hull estimator's robustness knobs (support-cloud gating, order-statistic
trim) interact with scene scale and texture in ways single-scene tuning gets
wrong — round 3 measured the shipped (ungated, trim=7) support at +17.7% on
the 1080p bench scene after a texture revision, while (gated, trim=7) digs
-20% at the 400x300 e2e scene. This harness renders a SPREAD of synthetic
turntable scenes (sizes, ellipsoid shapes, arcs, noise), runs the real
pipeline on each, captures the volume stage's exact inputs (cloud, masks,
projections), and tabulates estimator variants against each scene's analytic
truth — the decision record for the shipped configuration.

Pipeline runs are cached as .cache/volval_<name>.npz; delete to re-render.
External captures (e.g. the 1080p bench scene, too slow for the CPU suite)
are picked up from .cache/volval_ext_*.npz with the same keys.

Usage:  python tools/volume_validation.py [--scenes a,b,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
CACHE = REPO / ".cache"

from meatmodeler_tpu import pipeline, volume  # noqa: E402
from meatmodeler_tpu.config import DEFAULT_CONFIG, VolumeConfig  # noqa: E402
from meatmodeler_tpu.geometry import projection  # noqa: E402
from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence  # noqa: E402


def validation_scenes():
    """Name -> (scene, n_frames, config). Spans image scale, ellipsoid shape,
    arc width, and noise — the axes the estimator's knobs are sensitive to."""
    base = dataclasses.replace(
        DEFAULT_CONFIG,
        keyframe=dataclasses.replace(DEFAULT_CONFIG.keyframe, threshold=0.04),
        tracks=dataclasses.replace(
            DEFAULT_CONFIG.tracks, max_keyframes=48, triangulation="nview"
        ),
    )
    s = TurntableScene(image_size=(400, 300), focal=420.0, noise_sigma=1.0)
    return {
        # the e2e test scene
        "e2e_400": (s, 40, base),
        # flat and elongated ellipsoids (support anisotropy)
        "flat_400": (
            dataclasses.replace(s, ellipsoid_axes=(2.4, 0.9, 1.6)), 40, base,
        ),
        "long_480": (
            dataclasses.replace(
                s, image_size=(480, 360), focal=520.0,
                ellipsoid_axes=(3.0, 1.2, 1.2),
            ),
            40,
            base,
        ),
        # wider arc + more views (better-conditioned carve)
        "wide_640": (
            dataclasses.replace(
                s, image_size=(640, 480), focal=700.0, arc_degrees=80.0,
                noise_sigma=1.5,
            ),
            48,
            base,
        ),
    }


def capture_scene(name, scene, n_frames, config):
    """Run the pipeline once, hooking the volume stage's inputs; cached."""
    path = CACHE / f"volval_{name}.npz"
    if path.exists():
        return dict(np.load(path))
    frames, _, _ = render_sequence(scene, n_frames, seed=0)
    orig = pipeline._estimate_volume
    cap = {}

    def hook(pts_j, intrinsics, ext4, n_kf, image_size, cfg, point_sigma=None,
             point_parallax=None, use_plane=True, kf_scale=1, **kw):
        cap.update(
            pts=np.asarray(pts_j), intr=np.asarray(intrinsics),
            ext4=np.asarray(ext4), n_kf=n_kf,
            image_size=np.asarray(image_size), sigma=np.asarray(point_sigma),
            parallax=np.asarray(point_parallax), kf_scale=kf_scale,
        )
        return orig(pts_j, intrinsics, ext4, n_kf, image_size, cfg,
                    point_sigma, point_parallax, use_plane, kf_scale, **kw)

    pipeline._estimate_volume = hook
    try:
        pipeline.process(frames, config=config)
    finally:
        pipeline._estimate_volume = orig
    cap["truth"] = scene.volume
    # The scene's own carve knobs ride along so variants are evaluated with
    # the configuration the scene actually ships with.
    v = config.volume
    cap["vcfg"] = np.array([v.voxel_resolution, v.hull_directions,
                            v.carve_dilation, v.carve_close_frac,
                            v.carve_vote_frac, v.max_point_sigma,
                            v.min_parallax_deg], np.float64)
    CACHE.mkdir(exist_ok=True)
    np.savez(path, **cap)
    return cap


def masks_for(cap, vcfg: VolumeConfig):
    """Replicate _estimate_volume's gating on a capture."""
    pts = jnp.asarray(cap["pts"])
    pmask = np.ones(pts.shape[0], bool)
    precise = cap["sigma"] <= vcfg.max_point_sigma
    if precise.sum() >= 32:
        pmask = precise
    certain = pmask & (cap["parallax"] >= vcfg.min_parallax_deg)
    if certain.sum() >= 32:
        pmask = certain
    gated = np.asarray(volume.split_item_points(pts, jnp.asarray(pmask)))
    ungated = np.asarray(
        volume.split_item_points(pts, jnp.ones(pts.shape[0], bool))
    )
    return gated, ungated


def eval_variant(cap, vcfg, support, trim, trim_ref=0, inflate=0.0):
    pts = jnp.asarray(cap["pts"])
    gated, ungated = masks_for(cap, vcfg)
    smask = gated if support == "gated" else ungated
    kf_scale = int(cap["kf_scale"])
    proj = projection.projection_from_extrinsic(
        jnp.asarray(cap["intr"]), jnp.asarray(cap["ext4"])[:, :3, :]
    )
    hull, carve = volume.hull_and_carved_volume(
        pts, jnp.asarray(gated), proj, jnp.ones(int(cap["n_kf"]), bool),
        image_size=tuple(int(x) for x in cap["image_size"]),
        resolution=vcfg.voxel_resolution,
        num_directions=vcfg.hull_directions, trim=trim,
        dilation=max(1, round(vcfg.carve_dilation / kf_scale)),
        grid_step=max(1, 4 // kf_scale),
        close_frac=vcfg.carve_close_frac, vote_frac=vcfg.carve_vote_frac,
        support_mask=jnp.asarray(smask),
        trim_ref=trim_ref,
        support_inflate=inflate,
    )
    return float(hull), float(carve)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default=None, help="comma-separated subset")
    ap.add_argument("--trims", default="1,2,3,5,7")
    # Sparse-aware trim scaling (VolumeConfig.hull_trim_ref): depth reaches
    # `trim` at `trim_ref` support points, scales linearly below. 0 = fixed.
    ap.add_argument("--trim-refs", default="0")
    # Sampling-interval support inflation (volume.hull_and_carved_volume
    # support_inflate): fraction of the support cloud's median 6th-NN
    # distance added to every support plane.
    ap.add_argument("--inflates", default="0")
    args = ap.parse_args(argv)

    scenes = validation_scenes()
    if args.scenes:
        scenes = {k: scenes[k] for k in args.scenes.split(",")}
    caps = {}
    for name, (scene, n, cfg) in scenes.items():
        print(f"capturing {name}...", file=sys.stderr)
        caps[name] = capture_scene(name, scene, n, cfg)
    for ext in sorted(CACHE.glob("volval_ext_*.npz")):
        caps[ext.stem.replace("volval_ext_", "ext_")] = dict(np.load(ext))

    def cfg_of(cap):
        if "vcfg" not in cap:
            return VolumeConfig()
        r, d, dil, cf, vf, ms, mp = [float(x) for x in cap["vcfg"]]
        return VolumeConfig(voxel_resolution=int(r), hull_directions=int(d),
                            carve_dilation=int(dil), carve_close_frac=cf,
                            carve_vote_frac=vf, max_point_sigma=ms,
                            min_parallax_deg=mp)

    trims = [int(t) for t in args.trims.split(",")]
    trim_refs = [int(t) for t in args.trim_refs.split(",")]
    inflates = [float(t) for t in args.inflates.split(",")]
    variants = [
        (s, t, tr, inf)
        for s in ("gated",)
        for t in trims
        for tr in trim_refs
        for inf in inflates
    ]
    rows = {}
    for sup, trim, tref, inf in variants:
        errs = {}
        for name, cap in caps.items():
            truth = float(cap["truth"])
            hull, _ = eval_variant(cap, cfg_of(cap), sup, trim, trim_ref=tref, inflate=inf)
            errs[name] = hull / truth - 1.0
        worst = max(abs(e) for e in errs.values())
        rows[(sup, trim, tref, inf)] = (errs, worst)
        cells = "  ".join(f"{n}:{e:+.1%}" for n, e in errs.items())
        print(f"{sup:8s} trim={trim:2d} ref={tref:4d} inf={inf:.2f}  worst={worst:.1%}  {cells}")
    best = min(rows.items(), key=lambda kv: kv[1][1])
    print(f"\nbest variant: support={best[0][0]} trim={best[0][1]} "
          f"trim_ref={best[0][2]} inflate={best[0][3]} "
          f"worst-case |err|={best[1][1]:.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
