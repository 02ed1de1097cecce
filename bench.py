"""Benchmark driver: end-to-end SfM+volume throughput on the headline clip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json north star): a 300-frame 1080p synthetic turntable
video -> full pipeline (CLAHE, keyframe scan, ORB, matching, tracks,
calibration, PnP, pose BA, triangulation, Schur BA, volume, PLY). The clip
renders once and caches under .cache/ (gitignored).

``vs_baseline``: ratio of our warm-run fps to the measured OpenCV/SciPy
reference fps on the same clip (BASELINE_MEASURED.json, produced by
``python bench.py --measure-reference``). The reference publishes no numbers
(BASELINE.md), so the measured baseline is the parity denominator; until one
is recorded, the north-star target (300 frames / 5 s = 60 fps) is used.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
CACHE = REPO / ".cache"
BASELINE_MEASURED = REPO / "BASELINE_MEASURED.json"

N_FRAMES = 300
SIZE = (1920, 1080)


def get_scene():
    from meatmodeler_tpu.io.synthetic import TurntableScene

    return TurntableScene(image_size=SIZE, focal=1500.0, noise_sigma=1.5)


def load_or_render_clip() -> np.ndarray:
    CACHE.mkdir(exist_ok=True)
    clip_path = CACHE / f"bench_{SIZE[0]}x{SIZE[1]}_{N_FRAMES}.npy"
    if clip_path.exists():
        return np.load(clip_path, mmap_mode="r")
    from meatmodeler_tpu.io.synthetic import render_sequence

    print(f"rendering {N_FRAMES}-frame {SIZE[0]}x{SIZE[1]} clip (cached after)...", file=sys.stderr)
    frames, _, _ = render_sequence(get_scene(), N_FRAMES, seed=0, backend="jax")
    np.save(clip_path, frames)
    return frames


def bench_config():
    from meatmodeler_tpu.config import (
        DEFAULT_CONFIG,
        KeyframeConfig,
        MatcherConfig,
        OrbConfig,
        TrackConfig,
    )

    return dataclasses.replace(
        DEFAULT_CONFIG,
        # Denser keyframes than the reference's 0.1 rule: at 1080p the ~27
        # frames between 0.1-threshold keyframes starve ORB matching, and
        # point density drives the volume estimate (the capability the
        # reference never shipped).
        keyframe=dataclasses.replace(KeyframeConfig(), threshold=0.05),
        orb=OrbConfig(num_features=4096, num_levels=4),
        matcher=MatcherConfig(max_matches=2048),
        # nview: init from ALL observations — tighter cloud, better volume
        # (+7% vs truth against +16% for the endpoints policy), same RMSE.
        tracks=TrackConfig(max_tracks=8192, max_keyframes=64, triangulation="nview"),
        frame_chunk=32,
        # Keyframes ship as full-res grey (one byte/px): CLAHE on BT.601
        # luma instead of LAB lightness — equivalent on this clip (tinted
        # grey) and 3x fewer bytes over the burst-throttled link.
        pass2_enhance="grey",
    )


def run_ours(frames) -> dict:
    from meatmodeler_tpu.pipeline import process

    config = bench_config()
    frames = np.ascontiguousarray(frames)

    t0 = time.perf_counter()
    result = process(frames, path=str(CACHE / "bench"), config=config)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    result = process(frames, path=str(CACHE / "bench"), config=config)
    warm = time.perf_counter() - t0

    return {
        "cold_s": cold,
        "warm_s": warm,
        "fps": len(frames) / warm,
        "keyframes": int(result.metrics["counters"]["keyframes"]),
        "points": int(len(result.points)),
        "rmse_px": result.reprojection_rmse,
        "volume": result.volume,
    }


def measure_reference(frames) -> dict:
    """Run the OpenCV/SciPy reference pipeline on a prefix of the same clip.

    The reference needs a video file (cv2.VideoCapture) and pyntcloud (not
    installed) — the clip is written to MJPG AVI and pyntcloud is stubbed.
    Per-frame cost is extrapolated from the prefix; the reference's terminal
    global BA grows superlinearly with frames, so this favors the baseline.
    """
    import cv2
    import types

    prefix = min(120, len(frames))
    avi = CACHE / "bench_ref.avi"
    writer = cv2.VideoWriter(
        str(avi), cv2.VideoWriter_fourcc(*"MJPG"), 30, SIZE
    )
    if not writer.isOpened():
        raise RuntimeError("cv2.VideoWriter unavailable; cannot measure reference")
    for f in frames[:prefix]:
        writer.write(np.ascontiguousarray(f))
    writer.release()

    # Stub pyntcloud (unused output stage) before importing the reference.
    fake = types.ModuleType("pyntcloud")

    class _PC:
        def __init__(self, df):
            self.df = df

        def to_file(self, name):
            Path(name).write_text("stub")

    fake.PyntCloud = _PC
    sys.modules.setdefault("pyntcloud", fake)
    sys.path.insert(0, "/root/reference")
    try:
        import processor  # the reference pipeline

        lk_params = dict(
            winSize=(21, 21),
            maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
        )
        feature_params = dict(maxCorners=512, qualityLevel=0.01, minDistance=7, blockSize=7)
        flann_params = dict(
            algorithm=6, table_number=6, key_size=12, multi_probe_level=1
        )
        t0 = time.perf_counter()
        processor.process(str(avi), str(CACHE / "ref"), lk_params, feature_params, flann_params)
        elapsed = time.perf_counter() - t0
    finally:
        sys.path.remove("/root/reference")

    return {"frames": prefix, "seconds": elapsed, "fps": prefix / elapsed}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--measure-reference", action="store_true")
    args = parser.parse_args(argv)

    frames = load_or_render_clip()

    if args.measure_reference:
        ref = measure_reference(frames)
        BASELINE_MEASURED.write_text(json.dumps(ref, indent=2))
        print(json.dumps(ref), file=sys.stderr)
        return 0

    ours = run_ours(frames)

    if BASELINE_MEASURED.exists():
        ref_fps = json.loads(BASELINE_MEASURED.read_text())["fps"]
    else:
        ref_fps = 60.0  # north-star proxy: 300 frames / 5 s

    print(
        json.dumps(
            {
                "metric": "e2e_sfm_volume_fps_1080p",
                "value": round(ours["fps"], 3),
                "unit": "frames/sec",
                "vs_baseline": round(ours["fps"] / ref_fps, 3),
                "detail": ours,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
