"""End-to-end SfM + volume pipeline — the ``process`` entry point.

Mirrors the reference's only public entry point
``process(video, path, lk_params, feature_params, flann_params)``
(``processor.py:294-489``) but inverts the architecture for TPU (SURVEY.md
§7.1): instead of a per-frame Python loop ping-ponging into OpenCV, the work
runs in two device passes plus one batched geometry phase:

  PASS 1 (keyframe selection): frames stream to device in chunks; a
    ``lax.scan`` carries the KLT state (pyramid, tracked points, accumulated
    error) across frames and emits a keyframe flag per frame — the logic of
    ``keyframeTracking`` (``processor.py:61-110``) including the NaN/negative
    error clamps (``:95-97``) and the ``err > threshold * width`` rule
    (``:100``).
  PASS 2 (keyframe batch): accepted keyframes (those with a visible
    chessboard, host-detected like ``processor.py:369-371``) are processed
    *all at once*: ORB detect+describe vmapped over keyframes, consecutive-
    pair matching as batched Hamming matmuls, SoA track-store updates.
  GEOMETRY: corner subpix refine (batched) -> Zhang calibration ->
    undistort -> planar PnP (batched) -> pose-only BA -> widest-baseline
    triangulation (batched DLT) -> full Schur BA -> volume -> PLY.

``process`` returns the cloud, poses, intrinsics, volume, and metrics —
fixing the reference's broken promise of a return value
(``processor.py:303`` documents one; the code returns None).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the axon/Mosaic backend takes minutes to
# compile the gather-heavy kernels (ORB ~8 min cold); caching makes every
# run after the first start warm.
try:  # pragma: no cover - trivially environment-dependent
    import os as _os

    if jax.default_backend() not in ("cpu",):
        _cache_dir = _os.path.join(_os.path.dirname(__file__), "..", ".cache", "jax")
        jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from meatmodeler_tpu import tracks as tracks_mod
from meatmodeler_tpu import volume as volume_mod
from meatmodeler_tpu.config import DEFAULT_CONFIG, PipelineConfig
from meatmodeler_tpu.geometry import calibration, distortion, pnp, projection, triangulation
from meatmodeler_tpu.io import ply as ply_mod
from meatmodeler_tpu.io import video as video_mod
from meatmodeler_tpu.ops import chessboard, clahe, features, klt, matching, orb
from meatmodeler_tpu.solvers import bundle_adjust
from meatmodeler_tpu.utils import Metrics

__all__ = ["ProcessResult", "process"]


class ProcessResult(NamedTuple):
    points: np.ndarray  # (P, 3) bundle-adjusted cloud
    extrinsics: np.ndarray  # (F, 4, 4) refined keyframe extrinsics
    intrinsics: np.ndarray  # (3, 3)
    distortion: np.ndarray  # (5,)
    volume: float  # convex-hull volume of the item
    volume_carved: float  # voxel-carved volume
    ply_path: Optional[str]
    reprojection_rmse: float
    metrics: Dict[str, Any]


def _config_from_param_dicts(config, lk_params, feature_params):
    """Fold the reference's cv2 param dicts (``processor.py:294-301``) into
    the config tree for API compatibility."""
    kf = config.keyframe
    if lk_params:
        if "winSize" in lk_params:
            kf = dataclasses.replace(kf, window=int(lk_params["winSize"][0]))
        if "maxLevel" in lk_params:
            kf = dataclasses.replace(kf, pyramid_levels=int(lk_params["maxLevel"]) + 1)
        if "criteria" in lk_params:
            _, iters, eps = lk_params["criteria"]
            kf = dataclasses.replace(kf, max_iters=int(iters), eps=float(eps))
    if feature_params:
        if "maxCorners" in feature_params:
            kf = dataclasses.replace(kf, max_corners=int(feature_params["maxCorners"]))
        if "qualityLevel" in feature_params:
            kf = dataclasses.replace(kf, quality_level=float(feature_params["qualityLevel"]))
        if "minDistance" in feature_params:
            kf = dataclasses.replace(kf, min_distance=int(feature_params["minDistance"]))
        if "blockSize" in feature_params:
            kf = dataclasses.replace(kf, block_size=int(feature_params["blockSize"]))
    return dataclasses.replace(config, keyframe=kf)


# --------------------------------------------------------------------------
# PASS 1: scan-based keyframe selection
# --------------------------------------------------------------------------


def _make_keyframe_scan(config: PipelineConfig):
    """Build the jitted (greys_chunk, carry) -> (carry, is_kf flags) scan."""
    kf = config.keyframe

    def seed_points(grey):
        c = features.good_features(
            grey,
            max_corners=kf.max_corners,
            quality_level=kf.quality_level,
            min_distance=kf.min_distance,
            block_size=kf.block_size,
        )
        return c.xy, c.mask

    @jax.jit
    def init_carry(grey):
        pyr = tuple(klt.build_pyramid(grey, kf.pyramid_levels))
        pts, mask = seed_points(grey)
        return (pyr, pts, mask, jnp.float32(0.0))

    @jax.jit
    def scan_chunk(carry, greys):
        width = greys.shape[2]

        def step(carry, grey):
            prev_pyr, pts, mask, acc = carry
            cur_pyr = tuple(klt.build_pyramid(grey, kf.pyramid_levels))
            flow = klt.lucas_kanade(
                prev_pyr,
                cur_pyr,
                pts,
                win=kf.window,
                levels=kf.pyramid_levels,
                max_iters=kf.max_iters,
                eps=kf.eps,
                point_mask=mask,
            )
            # Reference error accumulation (processor.py:95-97): NaN -> 0,
            # negatives -> 0, then the average.
            err = jnp.nan_to_num(flow.error)
            err = jnp.maximum(err, 0.0)
            n_valid = jnp.maximum(jnp.sum(mask), 1)
            acc = acc + jnp.sum(jnp.where(mask, err, 0.0)) / n_valid

            is_kf = acc > kf.threshold * width

            # On keyframe: reset error. Deviation from the reference
            # (processor.py:104-106 reseeds immediately): detection is NOT
            # inside the scan — keyframes are rare and running Shi-Tomasi
            # every frame would dominate the hot loop. Tracking continues on
            # the existing (still valid) features; the host reseeds at the
            # next chunk boundary (see `process`).
            new_mask = mask & flow.status
            acc = jnp.where(is_kf, 0.0, acc)
            return (cur_pyr, flow.points, new_mask, acc), is_kf

        return jax.lax.scan(step, carry, greys)

    @jax.jit
    def reseed(carry, grey):
        pyr, _, _, acc = carry
        pts, mask = seed_points(grey)
        return (pyr, pts, mask, acc)

    return init_carry, scan_chunk, reseed


@jax.jit
def _enhanced_grey_batch(bgr_chunk):
    return clahe.enhanced_grey(bgr_chunk)


@jax.jit
def _downsample_u8(grey):
    """Half-res uint8 view for host board detection: device->host transfers
    through the remote-TPU tunnel run at ~0.01 GB/s (measured), so the host
    only ever receives 1/16th of the pixel bytes; sub-pixel corner
    refinement happens back on device at full resolution."""
    return jnp.clip(grey[..., ::2, ::2], 0, 255).astype(jnp.uint8)


def _board_fit_residual(corners: np.ndarray, pattern) -> float:
    """Max residual (px) of a planar-homography fit of the board grid.

    A genuine chessboard is exactly planar, so correctly detected corners fit
    a homography to sub-pixel residual; a mis-detection (a corner snapped to
    a neighboring saddle — the half-res detector's failure mode on oblique
    views) shows up as a multi-pixel outlier.
    """
    cols, rows = pattern
    gx, gy = np.meshgrid(np.arange(cols, dtype=np.float64), np.arange(rows, dtype=np.float64))
    obj = np.stack([gx.ravel(), gy.ravel()], axis=1)
    img = np.asarray(corners, np.float64)
    n = len(obj)
    a = np.zeros((2 * n, 9))
    a[0::2, 0:2] = obj
    a[0::2, 2] = 1.0
    a[0::2, 6:8] = -obj * img[:, :1]
    a[0::2, 8] = -img[:, 0]
    a[1::2, 3:5] = obj
    a[1::2, 5] = 1.0
    a[1::2, 6:8] = -obj * img[:, 1:2]
    a[1::2, 8] = -img[:, 1]
    h = np.linalg.svd(a)[2][-1].reshape(3, 3)
    den = obj @ h[2, :2] + h[2, 2]
    proj = (obj @ h[:2, :2].T + h[:2, 2]) / den[:, None]
    return float(np.abs(proj - img).max())


def _detect_board_host(grey_dev, pattern):
    """Detect the chessboard, minimizing device->host pixel traffic.

    Large frames first try a half-res host copy (the remote-TPU tunnel runs
    at ~0.01 GB/s, so this cuts transfer bytes 4x); the result is validated
    with a planar-homography fit and falls back to full resolution when the
    coarse detection snapped a corner to the wrong saddle. Sub-pixel
    refinement happens later on device at full resolution either way.
    """
    h, w = grey_dev.shape
    if min(h, w) >= 512:
        small = np.asarray(_downsample_u8(grey_dev))
        c = chessboard.find_chessboard(small, pattern)
        if c is not None:
            c = chessboard.canonicalize_corners(np.asarray(c, np.float32) * 2.0, pattern)
            if _board_fit_residual(c, pattern) < 3.0:
                return c
    full = np.clip(np.asarray(grey_dev), 0, 255).astype(np.uint8)
    c = chessboard.find_chessboard(full, pattern)
    if c is None:
        return None
    c = chessboard.canonicalize_corners(np.asarray(c, np.float32), pattern)
    # Same physical gate at full res: reject non-planar "boards" (spurious
    # grids in texture) instead of letting them corrupt calibration.
    if _board_fit_residual(c, pattern) > 6.0:
        return None
    return c


def _run_pass1(video, config, pattern, known_corners, metrics, init_carry, scan_chunk, reseed):
    """PASS 1 driver: stream chunks, run the keyframe scan, detect boards.

    Returns (kf_greys, kf_corners, frames_total).
    """
    source = video_mod.FrameSource(video)
    with metrics.stage("pass1_keyframes"):
        carry = None
        frame_idx = 0
        kf_greys = []  # DEVICE-resident keyframe greys (float32)
        kf_corners = []  # detected board corners per accepted keyframe

        def detect(grey_dev, global_idx):
            if known_corners is not None:
                return chessboard.canonicalize_corners(
                    np.asarray(known_corners[global_idx], np.float32), pattern
                )
            return _detect_board_host(grey_dev, pattern)

        for chunk in source.chunks(config.frame_chunk):
            # Pad ragged chunks up front so every device op sees one shape.
            real_len = len(chunk)
            if real_len < config.frame_chunk:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], config.frame_chunk - real_len, axis=0)]
                )
            greys = _enhanced_grey_batch(jnp.asarray(chunk))  # stays on device

            offset = 0
            if carry is None:
                # Discard leading frames until the chessboard is visible
                # (processor.py:315-319) — but without crashing on
                # board-free videos (the reference loops forever, SURVEY §5.3).
                start = None
                for i in range(real_len):
                    c = detect(greys[i], frame_idx + i)
                    if c is not None:
                        start = i
                        kf_greys.append(greys[i])
                        kf_corners.append(c)
                        break
                if start is None:
                    frame_idx += real_len
                    continue
                carry = init_carry(greys[start])
                frame_idx += start + 1
                offset = start + 1
                if offset >= real_len:
                    continue

            carry, flags = scan_chunk(carry, greys)
            flags = np.array(flags)[:real_len]
            # Frames before the scan start (pre-board) must not fire.
            flags[:offset] = False
            if flags.any():
                # A keyframe fired in this chunk: re-seed the tracked points
                # from the chunk's final frame (amortized replacement for the
                # reference's immediate in-loop reseed, processor.py:104-106).
                carry = reseed(carry, greys[real_len - 1])
            for i in np.nonzero(flags)[0]:
                c = detect(greys[i], frame_idx + int(i) - offset)
                if c is not None:  # boardless keyframes dropped (processor.py:369-371)
                    kf_greys.append(greys[i])
                    kf_corners.append(c)
            frame_idx += real_len - offset

        metrics.count("frames_total", frame_idx)
        metrics.count("keyframes", len(kf_greys))
    return kf_greys, kf_corners, frame_idx


# --------------------------------------------------------------------------
# main entry point
# --------------------------------------------------------------------------


def process(
    video,
    path: Optional[str] = None,
    lk_params: Optional[dict] = None,
    feature_params: Optional[dict] = None,
    flann_params: Optional[dict] = None,
    config: PipelineConfig = DEFAULT_CONFIG,
    known_corners: Optional[np.ndarray] = None,
    checkpoint_dir: Optional[str] = None,
) -> ProcessResult:
    """Video -> bundle-adjusted point cloud + volume (+ ``<path>Cloud.ply``).

    Args:
      video: path (video/.npy/.y4m) or (T, H, W[, 3]) uint8 array.
      path: output prefix; writes ``<path>Cloud.ply`` like ``processor.py:480``
        (skipped if None).
      lk_params / feature_params / flann_params: reference-compatible cv2
        param dicts (``processor.py:294-301``); folded into `config`.
        ``flann_params`` is accepted and ignored — matching is exact here.
      config: the full config tree.
      known_corners: optional (T, N, 2) ground-truth board corners per frame
        (synthetic benchmarks; skips host detection).
      checkpoint_dir: if set, per-stage artifacts persist there and a re-run
        resumes after the last completed stage (SURVEY.md §5.4 — the
        reference has no checkpointing of any kind).

    Returns:
      ProcessResult — including the point cloud the reference promised but
      never returned (``processor.py:303``).
    """
    from meatmodeler_tpu.utils.checkpoint import StageCheckpointer

    del flann_params  # exact MXU matching needs no FLANN tuning
    config = _config_from_param_dicts(config, lk_params, feature_params)
    metrics = Metrics()
    pattern = config.chessboard.pattern
    n_corners = pattern[0] * pattern[1]
    ckpt = StageCheckpointer(checkpoint_dir)

    init_carry, scan_chunk, reseed = _make_keyframe_scan(config)

    # ---- PASS 1: stream chunks, select keyframes ----
    if ckpt.has("keyframes"):
        data = ckpt.load("keyframes")
        kf_greys = list(data["greys"].astype(np.float32))
        kf_corners = list(data["corners"])
        frame_idx = int(data["frames_total"])
        metrics.count("frames_total", frame_idx)
        metrics.count("keyframes", len(kf_greys))
    else:
        kf_greys, kf_corners, frame_idx = _run_pass1(
            video, config, pattern, known_corners, metrics,
            init_carry, scan_chunk, reseed,
        )
        if kf_greys:
            ckpt.save(
                "keyframes",
                # float32: the CLAHE-enhanced greys are float; any rounding
                # here would make resumed runs differ from fresh ones
                # (top-k ties in the detectors flip on 0.1-level changes).
                greys=np.stack([np.asarray(g) for g in kf_greys]).astype(np.float32),
                corners=np.stack(kf_corners),
                frames_total=frame_idx,
            )

    n_kf = len(kf_greys)
    if n_kf < 3:
        raise ValueError(
            f"only {n_kf} keyframes with a visible chessboard; need >= 3 "
            "(check the video shows the calibration target)"
        )

    # Device-side stack: kf_greys holds device arrays from pass 1 (or host
    # arrays on checkpoint resume); no host round-trip either way.
    kf_stack = jnp.stack([jnp.asarray(g, jnp.float32) for g in kf_greys])

    # ---- PASS 2: batched keyframe processing ----
    with metrics.stage("pass2_orb"):
        orb_batch = jax.vmap(
            lambda g: orb.detect_and_compute(
                g,
                max_features=config.orb.num_features,
                num_levels=config.orb.num_levels,
                scale_factor=config.orb.scale_factor,
                fast_threshold=config.orb.fast_threshold,
            )
        )(kf_stack)

    with metrics.stage("pass2_matching"):
        pair_matches = jax.vmap(
            lambda q, t, qm, tm: matching.match_descriptors(
                q,
                t,
                qm,
                tm,
                ratio=config.matcher.ratio,
                max_distance=config.matcher.max_distance,
                max_matches=config.matcher.max_matches,
                cross_check=config.matcher.cross_check,
            )
        )(
            orb_batch.descriptors[:-1],
            orb_batch.descriptors[1:],
            orb_batch.mask[:-1],
            orb_batch.mask[1:],
        )
        metrics.count(
            "matches_per_pair",
            [int(x) for x in np.asarray(jnp.sum(pair_matches.mask, axis=1))],
        )

    with metrics.stage("pass2_tracks"):
        store = tracks_mod.make_store(config.tracks.max_tracks, max(n_kf, 2))
        for k in range(n_kf - 1):
            store = tracks_mod.update_tracks(
                store,
                jnp.asarray(k),
                jnp.asarray(k + 1),
                pair_matches.query_idx[k],
                pair_matches.train_idx[k],
                pair_matches.mask[k],
                orb_batch.xy[k],
                orb_batch.xy[k + 1],
            )
        store = tracks_mod.finalize_tracks(store)
        metrics.count("tracks", int(np.asarray(store.used).sum()))

    # ---- GEOMETRY ----
    with metrics.stage("corner_refine"):
        corners = jnp.asarray(np.stack(kf_corners))  # (F, N, 2)
        corners = jax.vmap(
            lambda g, c: chessboard.refine_corners_subpix(
                g, c, win=config.chessboard.subpix_window, iters=config.chessboard.subpix_iters
            )
        )(kf_stack, corners)

    with metrics.stage("calibration"):
        h, w = kf_greys[0].shape
        obj_z0 = calibration.chessboard_object_points(pattern, corners.dtype)
        calib = calibration.calibrate(
            corners,
            obj_z0,
            jnp.asarray([w, h], corners.dtype),
            num_dist=config.chessboard.calib_num_dist,
            fix_principal_point=config.chessboard.calib_fix_principal_point,
            single_focal=config.chessboard.calib_single_focal,
        )
        metrics.count("calibration_rms_px", float(calib.rms))

    with metrics.stage("pose_estimation"):
        und_corners = jax.vmap(
            lambda c: distortion.undistort_pixels(c, calib.intrinsics, calib.dist)
        )(corners)
        # The reference's pose board: X-Z plane scaled by side_length
        # (processor.py:162-166).
        side = config.chessboard.side_length
        board_xz = jnp.zeros((n_corners, 3), corners.dtype)
        board_xz = board_xz.at[:, 0].set(obj_z0[:, 0] * side)
        board_xz = board_xz.at[:, 2].set(obj_z0[:, 1] * side)
        poses = pnp.solve_pnp_batch(
            board_xz[:, [0, 2]], (0, 2), board_xz, und_corners, calib.intrinsics
        )

    with metrics.stage("pose_ba"):
        ext0 = projection.extrinsics_from_params(poses)
        ext_refined, pose_ba_res = bundle_adjust.adjust_pose(
            ext0,
            calib.intrinsics,
            und_corners.reshape(-1, 2),
            pattern=pattern,
            side_length=side,
            config=config.solver,
        )
        metrics.count("pose_ba_rmse_px", float(pose_ba_res.rmse))
        projections = projection.projection_from_extrinsic(calib.intrinsics, ext_refined)

    with metrics.stage("triangulation"):
        # Undistort all track coordinates once; BA/triangulation are pinhole.
        # (undistort_pixels broadcasts over any leading dims.)
        coords_und = distortion.undistort_pixels(store.coords, calib.intrinsics, calib.dist)
        store = store._replace(coords=coords_und)

        first_kf, last_kf, first_xy, last_xy, tri_valid = tracks_mod.triangulation_endpoints(store)
        pts3d = triangulation.triangulate_pairs(
            projections[first_kf], projections[last_kf], first_xy, last_xy
        )
        # Outlier gating the reference lacks entirely: drop tracks whose
        # initial reprojection (triangulated point vs every observation)
        # exceeds a few pixels — mismatched ORB pairs would otherwise drag
        # the global BA (the role RANSAC plays in the north-star design).
        finite = jnp.all(jnp.isfinite(pts3d), axis=1)
        cam_params_ref = projection.params_from_extrinsics(ext_refined)
        proj_all = projection.project_points(
            pts3d[:, None, :],
            cam_params_ref[None, :, :],
            calib.intrinsics,
        )  # (T, F, 2)
        resid = jnp.linalg.norm(proj_all - store.coords, axis=-1)
        resid = jnp.where(store.obs_mask, resid, 0.0)
        max_resid = jnp.max(resid, axis=1)
        inlier = max_resid < 4.0
        store = store._replace(points=jnp.where(finite[:, None], pts3d, 0.0))
        tri_valid = tri_valid & finite & inlier
        metrics.count("triangulated", int(np.asarray(tri_valid).sum()))
        metrics.count(
            "outlier_tracks_dropped", int(np.asarray(finite & ~inlier).sum())
        )

    with metrics.stage("bundle_adjustment"):
        points, obs, fidx, pidx, track_ids = tracks_mod.to_ba_arrays(store)
        tri_valid_np = np.asarray(tri_valid)[track_ids]
        obs_keep = tri_valid_np[pidx]
        points = points[tri_valid_np]
        # Reindex after filtering.
        remap = -np.ones(len(tri_valid_np), np.int32)
        remap[np.nonzero(tri_valid_np)[0]] = np.arange(tri_valid_np.sum(), dtype=np.int32)
        obs, fidx, pidx = obs[obs_keep], fidx[obs_keep], remap[pidx[obs_keep]]

        new_pts, new_ext, ba_res = bundle_adjust.adjust_points(
            ext_refined,
            calib.intrinsics,
            points,
            obs,
            fidx,
            pidx,
            config=config.solver,
        )
        metrics.count("ba_rmse_px", float(ba_res.rmse))
        metrics.count("ba_iterations", int(ba_res.iterations))
        metrics.count("points", int(len(np.asarray(new_pts))))
        ckpt.save(
            "cloud",
            points=np.asarray(new_pts),
            extrinsics=np.asarray(new_ext),
            intrinsics=np.asarray(calib.intrinsics),
            distortion=np.asarray(calib.dist),
            rmse=float(ba_res.rmse),
        )

    with metrics.stage("volume"):
        pts_j = jnp.asarray(new_pts)
        pmask = jnp.ones(pts_j.shape[0], bool)
        item_mask = volume_mod.split_item_points(pts_j, pmask)
        have_item = bool(np.asarray(item_mask).sum() >= 8)
        if have_item:
            vol_hull = float(
                volume_mod.convex_hull_volume(
                    pts_j, item_mask, resolution=config.volume.voxel_resolution
                )
            )
            proj_new = projection.projection_from_extrinsic(
                calib.intrinsics, jnp.asarray(new_ext)[:, :3, :]
            )
            vol_carve = float(
                volume_mod.carved_volume(
                    pts_j,
                    item_mask,
                    proj_new,
                    jnp.ones(n_kf, bool),
                    image_size=(w, h),
                    resolution=config.volume.voxel_resolution,
                    dilation=config.volume.carve_dilation,
                )
            )
        else:
            vol_hull = vol_carve = float("nan")
        metrics.count("item_points", int(np.asarray(item_mask).sum()))
        metrics.count("volume_hull", vol_hull)
        metrics.count("volume_carved", vol_carve)

    ply_path = None
    if path is not None:
        with metrics.stage("ply_export"):
            ply_path = ply_mod.write_ply(str(path) + "Cloud.ply", np.asarray(new_pts))

    return ProcessResult(
        points=np.asarray(new_pts),
        extrinsics=np.asarray(new_ext),
        intrinsics=np.asarray(calib.intrinsics),
        distortion=np.asarray(calib.dist),
        volume=vol_hull,
        volume_carved=vol_carve,
        ply_path=ply_path,
        reprojection_rmse=float(ba_res.rmse),
        metrics=metrics.as_dict(),
    )
