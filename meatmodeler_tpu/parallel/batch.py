"""Multi-video reconstruction with mesh-sharded bundle adjustment.

BASELINE config 5: "batched multi-object pipeline: concurrent videos sharded
across a v5e-8 with per-core BA solves". The reference is strictly one video
per process with zero parallelism (SURVEY.md §2.5); here ``process_batch``
reconstructs a batch of videos and runs every video's Schur BA solve
concurrently — one per mesh ``data`` core via ``shard_map``
(``sharded.solve_ba_batch``), with NO cross-device communication (the solves
are independent).

The host-driven phases (video decode, keyframe selection, board detection)
are inherently per-video and run sequentially; all device-heavy geometry
(BA, volume) is batched. Problems are padded to common static capacities so
one compiled program serves every video.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from meatmodeler_tpu.config import DEFAULT_CONFIG, PipelineConfig
from meatmodeler_tpu.geometry import projection
from meatmodeler_tpu.io import ply as ply_mod
from meatmodeler_tpu.parallel import sharded
from meatmodeler_tpu.pipeline import (
    _volume_confidence,
    ProcessResult,
    _estimate_volume,
    _reconstruct_to_ba,
)
from meatmodeler_tpu.solvers import bundle_adjust
from meatmodeler_tpu.utils import Metrics
from meatmodeler_tpu.utils.checkpoint import StageCheckpointer

__all__ = ["process_batch"]


def _pad_to(arr: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


def process_batch(
    videos: Sequence,
    config: PipelineConfig = DEFAULT_CONFIG,
    mesh: Optional[Mesh] = None,
    paths: Optional[Sequence[Optional[str]]] = None,
    known_corners: Optional[Sequence[Optional[np.ndarray]]] = None,
) -> List[ProcessResult]:
    """Reconstruct several videos with their BA solves sharded over a mesh.

    Args:
      videos: sequence of video sources (paths or (T, H, W, 3) uint8 arrays).
      config: shared config tree.
      mesh: a ('data', 'model') Mesh; the video batch shards over 'data'
        (``sharded.make_mesh()``). None solves the batch on one device
        (still a single compiled vmap over videos).
      paths: optional per-video output prefixes (``<path>Cloud.ply``).
      known_corners: optional per-video ground-truth board corners.

    Returns:
      One ProcessResult per video, in input order.
    """
    n_videos = len(videos)
    paths = paths if paths is not None else [None] * n_videos
    known_corners = (
        known_corners if known_corners is not None else [None] * n_videos
    )

    from meatmodeler_tpu.utils.profiling import profile_run

    with profile_run():  # MEATMODELER_PROFILE=<dir> captures the whole batch
        return _process_batch_inner(videos, config, mesh, paths, known_corners)


def _process_batch_inner(videos, config, mesh, paths, known_corners):
    n_videos = len(videos)
    # ---- per-video host-driven phases (decode, keyframes, features) ----
    # Two workers overlap video i+1's host-bound work (decode + C++ keyframe
    # scan, which release the GIL) with video i's device-bound stages; more
    # workers only add contention since a single chip serializes the device
    # programs anyway. Results stay in input order.
    from concurrent.futures import ThreadPoolExecutor

    metrics_list = [Metrics() for _ in range(n_videos)]
    with ThreadPoolExecutor(max_workers=min(2, max(n_videos, 1))) as pool:
        pres = list(
            pool.map(
                lambda args: _reconstruct_to_ba(
                    args[0], config, args[1], args[2], StageCheckpointer(None)
                ),
                list(zip(videos, known_corners, metrics_list)),
            )
        )

    # ---- pad every video's BA problem to shared static capacities ----
    f_max = max(p.n_kf for p in pres)
    p_max = max(len(p.points) for p in pres)
    o_max = max(len(p.obs) for p in pres)

    def problem(pre) -> bundle_adjust.BAProblem:
        cams = np.asarray(projection.params_from_extrinsics(pre.ext_refined))
        n_obs = len(pre.obs)
        return bundle_adjust.BAProblem(
            cam_params=jnp.asarray(_pad_to(cams, f_max)),
            points=jnp.asarray(_pad_to(np.asarray(pre.points, np.float32), p_max)),
            intrinsics=jnp.asarray(pre.intrinsics),
            obs=jnp.asarray(_pad_to(np.asarray(pre.obs, np.float32), o_max)),
            frame_idx=jnp.asarray(_pad_to(np.asarray(pre.fidx, np.int32), o_max)),
            point_idx=jnp.asarray(_pad_to(np.asarray(pre.pidx, np.int32), o_max)),
            mask=jnp.arange(o_max) < n_obs,
            weight=jnp.asarray(_pad_to(np.asarray(pre.obs_weight, np.float32), o_max)),
        )

    problems = [problem(p) for p in pres]
    # The data axis must divide the batch: pad with copies of the last
    # problem (their results are discarded).
    n_solve = n_videos
    if mesh is not None:
        data = mesh.shape["data"]
        while n_solve % data:
            problems.append(problems[-1])
            n_solve += 1
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)

    # ---- per-core independent Schur solves ----
    if mesh is not None:
        result = sharded.solve_ba_batch(mesh, batched, config=config.solver)
    else:
        result = jax.vmap(
            lambda pr: bundle_adjust.solve_ba(pr, config=config.solver)
        )(batched)

    # ---- unpack, volume, PLY per video ----
    # Dispatch every video's volume program FIRST (device arrays in, no
    # forced syncs), then fetch everything the host loop needs in TWO
    # device_get batches — the previous per-video np.asarray pattern paid a
    # full link round trip per video per readback (~0.1 s each over a
    # tunneled backend, ~1.6 s of an 8-video warm batch).
    ext4_dev = [
        projection.extrinsics_from_params(
            result.cam_params[i, : pres[i].n_kf], homogeneous=True
        )
        for i in range(n_videos)
    ]
    fused_handles = [
        _estimate_volume(
            result.points[i, : len(pres[i].points)],
            pres[i].intrinsics,
            ext4_dev[i],
            pres[i].n_kf,
            pres[i].image_size,
            config,
            point_sigma=pres[i].point_sigma,
            point_parallax=pres[i].point_parallax,
            use_plane=not pres[i].markerless,
            kf_scale=pres[i].kf_scale,
        )
        for i in range(n_videos)
    ]
    pts_np, rmse_np, iters_np, ext4_np, fused_np = jax.device_get(
        (
            [result.points[i, : len(pres[i].points)] for i in range(n_videos)],
            result.rmse[:n_videos],
            result.iterations[:n_videos],
            ext4_dev,
            fused_handles,
        )
    )
    fused_np = [np.asarray(f) for f in fused_np]

    out: List[ProcessResult] = []
    for i, (pre, metrics, path) in enumerate(zip(pres, metrics_list, paths)):
        pts = np.asarray(pts_np[i])
        rmse = float(rmse_np[i])
        metrics.count("ba_rmse_px", rmse)
        metrics.count("ba_iterations", int(iters_np[i]))
        metrics.count("points", len(pts))

        fused = fused_np[i]
        n_item = int(fused[2])
        if n_item >= 8:
            vol_hull, vol_carve = float(fused[0]), float(fused[1])
        else:
            vol_hull = vol_carve = float("nan")
        metrics.count("item_points", n_item)
        # Same regime check as the single-video path — the sparse-cloud
        # criterion was MEASURED on exactly this shape of input (short batch
        # clips with few-hundred-point clouds), so batch callers must see it.
        volume_confidence = _volume_confidence(
            float(fused[4]), float(fused[5]), n_item, config
        )
        metrics.count("volume_low_confidence", volume_confidence["low_confidence"])

        ply_path = None
        if path is not None:
            ply_path = ply_mod.write_ply(str(path) + "Cloud.ply", pts)

        out.append(
            ProcessResult(
                points=pts,
                extrinsics=np.asarray(ext4_np[i]),
                intrinsics=np.asarray(pre.intrinsics),
                distortion=np.asarray(pre.dist),
                volume=vol_hull,
                volume_carved=vol_carve,
                ply_path=ply_path,
                reprojection_rmse=rmse,
                metrics=metrics.as_dict(),
                volume_confidence=volume_confidence,
            )
        )
    return out
