"""Command-line driver — the ``main.py`` the reference gitignored.

The reference's driver script (which constructed ``lk_params``,
``feature_params``, ``flann_params`` and called ``process``) was deliberately
excluded from the repo (``.gitignore:131-132``, SURVEY.md §0.5). This CLI
replaces it: ``meatmodeler VIDEO -o OUT_PREFIX`` runs the full pipeline and
prints the volume estimate and per-stage metrics.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="meatmodeler",
        description="TPU-native SfM: turntable video -> point cloud + volume",
    )
    parser.add_argument("video", help="video file, .npy frame stack, or .y4m")
    parser.add_argument("-o", "--output", default="out", help="output prefix (writes <prefix>Cloud.ply)")
    parser.add_argument("--pattern", type=int, nargs=2, default=None, metavar=("W", "H"), help="chessboard inner corners")
    parser.add_argument("--side-length", type=float, default=None, help="board square size (world units)")
    parser.add_argument("--max-features", type=int, default=None, help="ORB feature budget per keyframe")
    parser.add_argument("--keyframe-threshold", type=float, default=None, help="keyframe accumulation threshold (reference default 0.1; smaller = denser)")
    parser.add_argument("--incremental", action="store_true", help="online BA after every keyframe (the reference's intended design)")
    parser.add_argument("--detector", choices=("auto", "device", "host"), default=None, help="chessboard detector: on-device saddle+grid-fit, host cv2, or auto (device with host fallback)")
    parser.add_argument("--checkpoint-dir", default=None, help="persist per-stage artifacts; re-runs resume")
    parser.add_argument("--json", action="store_true", help="print metrics as JSON")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING, format="%(message)s")

    import dataclasses

    from meatmodeler_tpu.config import DEFAULT_CONFIG
    from meatmodeler_tpu.pipeline import process

    config = DEFAULT_CONFIG
    if args.pattern:
        config = dataclasses.replace(
            config, chessboard=dataclasses.replace(config.chessboard, pattern=tuple(args.pattern))
        )
    if args.side_length:
        config = dataclasses.replace(
            config, chessboard=dataclasses.replace(config.chessboard, side_length=args.side_length)
        )
    if args.max_features:
        config = dataclasses.replace(
            config, orb=dataclasses.replace(config.orb, num_features=args.max_features)
        )
    if args.keyframe_threshold:
        config = dataclasses.replace(
            config, keyframe=dataclasses.replace(config.keyframe, threshold=args.keyframe_threshold)
        )
    if args.incremental:
        config = dataclasses.replace(config, incremental_ba=True)
    if args.detector:
        config = dataclasses.replace(
            config, chessboard=dataclasses.replace(config.chessboard, detector=args.detector)
        )

    result = process(
        args.video, path=args.output, config=config, checkpoint_dir=args.checkpoint_dir
    )

    if args.json:
        print(
            json.dumps(
                {
                    "points": int(len(result.points)),
                    "keyframes": int(len(result.extrinsics)),
                    "volume": result.volume,
                    "volume_carved": result.volume_carved,
                    "reprojection_rmse": result.reprojection_rmse,
                    "ply": result.ply_path,
                    **result.metrics,
                }
            )
        )
    else:
        print(f"keyframes:          {len(result.extrinsics)}")
        print(f"points:             {len(result.points)}")
        print(f"reprojection RMSE:  {result.reprojection_rmse:.3f} px")
        print(f"volume (hull):      {result.volume:.3f}")
        print(f"volume (carved):    {result.volume_carved:.3f}")
        if result.ply_path:
            print(f"cloud written to:   {result.ply_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
