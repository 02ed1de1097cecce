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
import functools
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
from meatmodeler_tpu.io import native_ops
from meatmodeler_tpu.io import ply as ply_mod
from meatmodeler_tpu.io import video as video_mod
from meatmodeler_tpu.ops import board_detect, chessboard, clahe, features, klt, matching, orb
from meatmodeler_tpu.solvers import bundle_adjust
from meatmodeler_tpu.utils import Metrics
from meatmodeler_tpu.utils import numerics
from meatmodeler_tpu.utils.profiling import logger

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


@functools.lru_cache(maxsize=8)
def _make_keyframe_scan(config: PipelineConfig):
    """Build the jitted (greys_chunk, carry) -> (carry, is_kf flags) scan.

    Cached per config: ``process()`` may be called many times and a fresh
    ``jax.jit`` wrapper per call would re-trace the whole scan every run.
    """
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

    @functools.partial(jax.jit, static_argnames=("width_scale",))
    def scan_chunk(carry, greys, width_scale=1):
        # The keyframe rule compares an *intensity* residual (resolution-
        # independent) against threshold * width (processor.py:100). When
        # pass 1 runs on downscaled frames, the threshold must use the
        # FULL-resolution width or keyframes fire ~scale-times too often.
        width = greys.shape[2] * width_scale

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

            # On keyframe: reset error and reseed with Shi-Tomasi exactly at
            # the keyframe, matching the reference (processor.py:104-106).
            # The cond executes its taken branch only, so the detector runs
            # on the handful of keyframe frames, not all of them — and the
            # scan stays free of host feedback, letting the driver pipeline
            # chunk uploads against device compute.
            new_mask = mask & flow.status
            pts2, mask2 = jax.lax.cond(
                is_kf,
                lambda g: seed_points(g),
                lambda g: (flow.points, new_mask),
                grey,
            )
            acc = jnp.where(is_kf, 0.0, acc)
            return (cur_pyr, pts2, mask2, acc), is_kf

        return jax.lax.scan(step, carry, greys)

    return init_carry, scan_chunk


@jax.jit
def _enhanced_grey_batch(bgr_chunk):
    return clahe.enhanced_grey(bgr_chunk)


@jax.jit
def _clahe_grey_batch(grey_chunk):
    """CLAHE on uploaded grey frames — pass 1's transfer-optimal path.

    Pass 1 only needs enhanced greys for the keyframe DECISION and coarse
    board detection. The host->device link burst-throttles on sustained
    volume (measured: ~GB/s for the first couple of GB, then two-to-three
    orders slower), so the stream ships ONE uint8 byte per downscaled pixel:
    the BGR->grey decimation runs on host in native C++
    (``io/native_ops.bgr_to_grey_down`` — NumPy is ~200x slower on a weak
    host core, and shipping raw BGR is 12x the bytes). Keyframes are
    re-processed at full resolution through the exact reference path
    (CLAHE-on-LAB-L then grey — ``enhance_contrast_bgr``) in pass 2."""
    return clahe.clahe(grey_chunk.astype(jnp.float32)).astype(jnp.float32)


_ORB_MINIBATCH = 4


@functools.lru_cache(maxsize=8)
def _make_orb_minibatch(orb_cfg):
    """One jitted ORB program over a fixed (_ORB_MINIBATCH, H, W) stack."""

    @jax.jit
    def run(stack):
        return jax.vmap(
            lambda g: orb.detect_and_compute(
                g,
                max_features=orb_cfg.num_features,
                num_levels=orb_cfg.num_levels,
                scale_factor=orb_cfg.scale_factor,
                fast_threshold=orb_cfg.fast_threshold,
            )
        )(stack)

    return run


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


def _detect_board_host(grey_small, pattern, scale):
    """Detect the chessboard on a (possibly downscaled) host grey image.

    Returns full-resolution corner estimates or None. The result is
    validated with a planar-homography fit — a genuine board is exactly
    planar, so a corner snapped to a neighboring saddle (the half-res
    detector's failure mode on oblique views) shows up as a multi-pixel
    outlier and the detection is rejected rather than corrupting
    calibration. Sub-pixel refinement happens later on device at full
    resolution.
    """
    c = chessboard.find_chessboard(grey_small, pattern)
    if c is None:
        return None
    c = chessboard.canonicalize_corners(np.asarray(c, np.float32) * scale, pattern)
    if _board_fit_residual(c, pattern) > 3.0 * scale:
        return None
    return c


def _detect_board_device(grey_dev, pattern, scale, cb_cfg):
    """On-device detection (ops/board_detect.py) on the device-resident grey.

    Replaces the host ``cv2.findChessboardCorners`` round trip: the image
    never leaves HBM; only the 12-corner result and an ok flag come back.
    Validated by the same planar-homography gate as the host path.
    """
    det = board_detect.find_chessboard_device(
        grey_dev,
        pattern=pattern,
        max_candidates=cb_cfg.detect_candidates,
        tol=cb_cfg.detect_tol,
    )
    if not bool(det.ok):
        return None
    c = chessboard.canonicalize_corners(np.asarray(det.corners, np.float32) * scale, pattern)
    if _board_fit_residual(c, pattern) > 3.0 * scale:
        return None
    return c


def _run_pass1(video, config, pattern, known_corners, metrics, init_carry, scan_chunk):
    """PASS 1 driver: stream chunks, run the keyframe scan, detect boards.

    Pipelined: chunk k+1's upload + CLAHE + scan are dispatched before chunk
    k's keyframe flags are read back, so the slow host->device link streams
    continuously instead of stalling on every round trip. The scan reseeds
    itself on device (see ``_make_keyframe_scan``), so the only host feedback
    is board detection — which lags one chunk behind without affecting the
    scan. Pass-1 frames are downscaled by ``config.pass1_downscale`` (auto:
    4x for >=1080p, 2x for >=720p); keyframes upload at full resolution for
    pass 2 (BGR, or native-converted grey in ``pass2_enhance="grey"`` mode).

    Returns (kf_frames DEVICE arrays, kf_corners, frames_total).
    """
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    source = video_mod.FrameSource(video)
    scale = config.pass1_downscale
    with metrics.stage("pass1_keyframes"):
        carry = None
        frame_idx = 0  # global index of the next chunk's first frame
        kf_frames = []  # DEVICE full-res uint8 keyframes (BGR, or grey in "grey" mode)
        kf_corners = []  # detected board corners (full-res px) per keyframe

        # The caller's default device, captured HERE: uploads below may run
        # on the detection worker thread, and jax.default_device is
        # thread-local — without pinning, a pipelined ingest stage's
        # keyframes would land on the wrong device and re-transfer later.
        target_device = jax.default_device.value

        def retain_keyframe(frame_host):
            """Upload one full-res keyframe; in "grey" pass-2 mode it ships
            as one byte per pixel (native host conversion)."""
            frame_host = np.asarray(frame_host)
            if config.pass2_enhance == "grey" and frame_host.ndim == 3:
                frame_host = native_ops.bgr_to_grey_down(frame_host[None], 1)[0]
            return jax.device_put(np.ascontiguousarray(frame_host), target_device)

        def detect(grey_dev, chunk_host_frame, global_idx):
            if known_corners is not None:
                c = chessboard.canonicalize_corners(
                    np.asarray(known_corners[global_idx], np.float32), pattern
                )
            else:
                mode = config.chessboard.detector
                c = None
                # In auto mode a pattern larger than the configured candidate
                # budget falls through to the host detector (which handles any
                # pattern) instead of tripping find_chessboard_device's
                # ValueError; detector='device' keeps the hard error.
                device_fits = (
                    pattern[0] * pattern[1] <= config.chessboard.detect_candidates
                )
                if mode == "device" or (mode == "auto" and device_fits):
                    c = _detect_board_device(grey_dev, pattern, scale, config.chessboard)
                device_missed = c is None and mode == "auto" and device_fits
                if c is None and mode in ("host", "auto"):
                    g = np.clip(np.asarray(grey_dev), 0, 255).astype(np.uint8)
                    c = _detect_board_host(g, pattern, scale)
                    if c is None and scale > 1:
                        # Full-res fallback from the retained host frame (rare).
                        frame = np.asarray(chunk_host_frame)
                        grey_full = (
                            native_ops.bgr_to_grey_down(frame[None], 1)[0]
                            if frame.ndim == 3
                            else frame
                        )
                        c = _detect_board_host(grey_full, pattern, 1)
                if device_missed and c is not None:
                    # Count only genuine device-detector misses: the host
                    # found a board the device did not (board-free frames
                    # are not fallbacks — both detectors agree there).
                    metrics.add("board_detect_host_fallbacks", 1)
            if c is None:
                return None
            # Detectors flip the symmetric grid 180 degrees between frames;
            # anchor to the previous keyframe to keep 2D-3D assignments
            # consistent across the whole orbit.
            return chessboard.orient_corners_to(c, kf_corners[-1] if kf_corners else None)

        def resolve(flags_dev, greys_dev, chunk_host, idx0, real_len, offset):
            t0 = _time.perf_counter()
            flags = np.array(flags_dev)[:real_len]
            flags[:offset] = False  # pre-board frames must not fire
            t1 = _time.perf_counter()
            for i in np.nonzero(flags)[0]:
                c = detect(greys_dev[i], chunk_host[i], idx0 + int(i))
                if c is not None:  # boardless keyframes dropped (processor.py:369-371)
                    # Upload the full-res keyframe NOW: the link is idle
                    # while the detector runs, and pass 2 then starts with
                    # everything already device-resident. Only keyframes
                    # ship at full resolution (the link burst-throttles).
                    kf_frames.append(retain_keyframe(chunk_host[i]))
                    kf_corners.append(c)
            logger.debug(
                "pass1 resolve@%d: sync %.3fs detect %.3fs (%d kf)",
                idx0,
                t1 - t0,
                _time.perf_counter() - t1,
                int(flags.sum()),
            )

        # Board detection runs on a single worker thread: cv2 releases the
        # GIL, so detection of chunk k's keyframes overlaps the upload and
        # device compute of chunk k+1 (the single worker keeps detections —
        # and the orientation anchor — strictly ordered).
        executor = ThreadPoolExecutor(max_workers=1)
        futures = []

        for chunk in source.chunks(config.frame_chunk):
            if scale == 0:  # auto (resolve on first chunk)
                min_dim = min(chunk.shape[1], chunk.shape[2])
                scale = 4 if min_dim >= 1060 else 2 if min_dim >= 720 else 1
            # Pad ragged chunks up front so every device op sees one shape.
            real_len = len(chunk)
            if real_len < config.frame_chunk:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], config.frame_chunk - real_len, axis=0)]
                )
            # Native host BGR->grey decimation, then ship one byte per
            # downscaled pixel (see _clahe_grey_batch for the link economics).
            if chunk.ndim == 4:
                grey_host = native_ops.bgr_to_grey_down(chunk, scale)
            else:  # already-grey source
                grey_host = chunk[:, ::scale, ::scale]
            greys = _clahe_grey_batch(jnp.asarray(grey_host))

            idx0 = frame_idx
            offset = 0
            if carry is None:
                # Discard leading frames until the chessboard is visible
                # (processor.py:315-319) — but without crashing on
                # board-free videos (the reference loops forever, SURVEY §5.3).
                start = None
                for i in range(real_len):
                    c = detect(greys[i], chunk[i], idx0 + i)
                    if c is not None:
                        start = i
                        kf_frames.append(retain_keyframe(chunk[i]))
                        kf_corners.append(c)
                        break
                if start is None:
                    frame_idx += real_len
                    continue
                carry = init_carry(greys[start])
                offset = start + 1
                frame_idx += real_len
                if offset >= real_len:
                    continue
            else:
                frame_idx += real_len

            carry, flags = scan_chunk(carry, greys, width_scale=scale)
            futures.append(
                executor.submit(resolve, flags, greys, chunk, idx0, real_len, offset)
            )

        executor.shutdown(wait=True)
        for fut in futures:
            fut.result()  # surface worker exceptions

        metrics.count("frames_total", frame_idx)
        metrics.count("keyframes", len(kf_frames))
    return kf_frames, kf_corners, frame_idx


# --------------------------------------------------------------------------
# main entry point
# --------------------------------------------------------------------------


class PreBA(NamedTuple):
    """Everything ``process`` computes before the global bundle adjustment —
    the per-video unit that ``parallel.batch.process_batch`` pads, stacks,
    and solves across a device mesh (BASELINE config 5)."""

    ext_refined: jax.Array  # (F, 3, 4) pose-BA-refined extrinsics
    intrinsics: jax.Array  # (3, 3)
    dist: jax.Array  # (5,)
    points: np.ndarray  # (P, 3) triangulated points (inliers only)
    obs: np.ndarray  # (O, 2) undistorted observations
    fidx: np.ndarray  # (O,) frame indices
    pidx: np.ndarray  # (O,) point indices
    obs_weight: np.ndarray  # (O,) inverse-octave-sigma BA weights
    point_sigma: np.ndarray  # (P,) per-point octave sigma (px at level 0)
    n_kf: int
    image_size: Tuple[int, int]  # (w, h)
    frames_total: int


def _reconstruct_to_ba(video, config, known_corners, metrics, ckpt) -> PreBA:
    """PASS 1 + PASS 2 + geometry up to (but excluding) the global BA."""
    pattern = config.chessboard.pattern
    n_corners = pattern[0] * pattern[1]
    init_carry, scan_chunk = _make_keyframe_scan(config)

    # ---- PASS 1: stream chunks, select keyframes ----
    kf_stack = None
    if ckpt.has("keyframes"):
        data = ckpt.load("keyframes")
        # float32 enhanced greys: any rounding here would make resumed runs
        # differ from fresh ones (top-k ties in the detectors flip on
        # 0.1-level changes).
        kf_stack = jnp.asarray(data["greys"], jnp.float32)
        kf_corners = list(data["corners"])
        n_kf = len(kf_corners)
        frame_idx = int(data["frames_total"])
        metrics.count("frames_total", frame_idx)
        metrics.count("keyframes", n_kf)
    else:
        kf_frames, kf_corners, frame_idx = _run_pass1(
            video, config, pattern, known_corners, metrics, init_carry, scan_chunk
        )
        n_kf = len(kf_frames)

    if n_kf < 3:
        raise ValueError(
            f"only {n_kf} keyframes with a visible chessboard; need >= 3 "
            "(check the video shows the calibration target)"
        )
    if n_kf > config.tracks.max_keyframes:
        raise ValueError(
            f"{n_kf} keyframes exceed tracks.max_keyframes="
            f"{config.tracks.max_keyframes}; raise the capacity or the "
            "keyframe threshold"
        )

    if kf_stack is None:
        # Upload the full-res keyframe BGR frames, then the exact reference
        # preprocessing (increaseContrast + grey, processor.py:314,357) at
        # full resolution on device — in fixed minibatches so the program
        # compiles once, not once per keyframe count.
        with metrics.stage("pass2_preprocess"):
            # kf_frames are already device-resident (uploaded by the pass-1
            # detection worker while the link was otherwise idle).
            mb = _ORB_MINIBATCH
            frames_p = list(kf_frames) + [kf_frames[-1]] * ((-n_kf) % mb)
            enhance = (
                _clahe_grey_batch
                if (config.pass2_enhance == "grey" or kf_frames[0].ndim == 2)
                else _enhanced_grey_batch
            )
            kf_stack = jnp.concatenate(
                [
                    enhance(jnp.stack(frames_p[i : i + mb]))
                    for i in range(0, len(frames_p), mb)
                ]
            )[:n_kf]
            if ckpt.enabled:
                ckpt.save(
                    "keyframes",
                    greys=np.asarray(kf_stack, np.float32),
                    corners=np.stack(kf_corners),
                    frames_total=frame_idx,
                )

    # ---- PASS 2: batched keyframe processing ----
    with metrics.stage("pass2_orb"):
        # Fixed-size minibatches: one compiled program regardless of the
        # video's keyframe count (n_kf varies per video and a vmap over all
        # of it both recompiles every time and, at 1080p, can exceed HBM at
        # compile time).
        run_orb = _make_orb_minibatch(config.orb)
        mb = _ORB_MINIBATCH
        pads = (-n_kf) % mb
        stack_p = jnp.concatenate([kf_stack, kf_stack[-1:].repeat(pads, 0)]) if pads else kf_stack
        parts = [run_orb(stack_p[i : i + mb]) for i in range(0, len(stack_p), mb)]
        orb_batch = jax.tree.map(lambda *xs: jnp.concatenate(xs)[:n_kf], *parts)

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
        store = tracks_mod.update_tracks_scan(
            store,
            pair_matches.query_idx,
            pair_matches.train_idx,
            pair_matches.mask,
            orb_batch.xy,
            orb_batch.octave,
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
        h, w = kf_stack.shape[1:]
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
        numerics.check_finite("calibration", intrinsics=calib.intrinsics, dist=calib.dist)

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
        numerics.check_finite("pose_ba", extrinsics=ext_refined)
        projections = projection.projection_from_extrinsic(calib.intrinsics, ext_refined)

    with metrics.stage("triangulation"):
        # Undistort all track coordinates once; BA/triangulation are pinhole.
        # (undistort_pixels broadcasts over any leading dims.)
        coords_und = distortion.undistort_pixels(store.coords, calib.intrinsics, calib.dist)
        store = store._replace(coords=coords_und)

        first_kf, last_kf, first_xy, last_xy, tri_valid = tracks_mod.triangulation_endpoints(store)
        if config.tracks.triangulation == "nview":
            pts3d = triangulation.triangulate_nview(
                projections, store.coords, store.obs_mask
            )
        else:
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
        # Scale-aware gate: a keypoint detected at pyramid octave o carries
        # ~scale_factor**o px of positional uncertainty, so its legitimate
        # residual is proportionally larger (ORB-SLAM's per-octave sigma) —
        # applied per OBSERVATION, each against its own detection octave.
        sigma_obs = jnp.float32(config.orb.scale_factor) ** store.octaves.astype(jnp.float32)
        resid_norm = jnp.where(store.obs_mask, resid / sigma_obs, 0.0)
        inlier = jnp.max(resid_norm, axis=1) < 4.0
        # Minimum-parallax gate: at near-zero baseline the depth is
        # unconstrained while the reprojection stays small, so the residual
        # gate above cannot catch these — they are the points that blow up
        # the hull volume.
        min_par = config.tracks.min_parallax_deg
        if min_par > 0:
            rot = ext_refined[:, :3, :3]
            centers = -jnp.einsum("fij,fi->fj", rot, ext_refined[:, :3, 3])  # (F, 3)
            r1 = pts3d - centers[first_kf]
            r2 = pts3d - centers[last_kf]
            cosang = jnp.sum(r1 * r2, axis=1) / jnp.maximum(
                jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12
            )
            inlier &= cosang < jnp.cos(jnp.deg2rad(min_par))
        store = store._replace(points=jnp.where(finite[:, None], pts3d, 0.0))
        tri_valid = tri_valid & finite & inlier
        metrics.count("triangulated", int(np.asarray(tri_valid).sum()))
        metrics.count(
            "outlier_tracks_dropped", int(np.asarray(finite & ~inlier).sum())
        )

    points, obs, fidx, pidx, track_ids, obs_octave = tracks_mod.to_ba_arrays(store)
    tri_valid_np = np.asarray(tri_valid)[track_ids]
    obs_keep = tri_valid_np[pidx]
    obs_sigma = np.float32(config.orb.scale_factor) ** obs_octave.astype(np.float32)
    obs_weight = (1.0 / obs_sigma)[obs_keep].astype(np.float32)
    points = points[tri_valid_np]
    # Per-point sigma for the volume gate: the track's MEAN observation
    # sigma (its typical, not worst-case, measurement precision).
    n_per = np.bincount(pidx, minlength=len(tri_valid_np))
    sum_per = np.bincount(pidx, weights=obs_sigma, minlength=len(tri_valid_np))
    sigma_mean = np.where(n_per > 0, sum_per / np.maximum(n_per, 1), np.inf)
    point_sigma = sigma_mean[tri_valid_np].astype(np.float32)
    # Reindex after filtering.
    remap = -np.ones(len(tri_valid_np), np.int32)
    remap[np.nonzero(tri_valid_np)[0]] = np.arange(tri_valid_np.sum(), dtype=np.int32)
    obs, fidx, pidx = obs[obs_keep], fidx[obs_keep], remap[pidx[obs_keep]]

    return PreBA(
        ext_refined=ext_refined,
        intrinsics=calib.intrinsics,
        dist=calib.dist,
        points=points,
        obs=obs,
        fidx=fidx,
        pidx=pidx,
        obs_weight=obs_weight,
        point_sigma=point_sigma,
        n_kf=n_kf,
        image_size=(int(w), int(h)),
        frames_total=frame_idx,
    )



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
    from meatmodeler_tpu.utils.profiling import profile_run

    del flann_params  # exact MXU matching needs no FLANN tuning
    config = _config_from_param_dicts(config, lk_params, feature_params)
    metrics = Metrics()
    ckpt = StageCheckpointer(checkpoint_dir)

    with profile_run():  # MEATMODELER_PROFILE=<dir> captures an XProf trace
        pre = _reconstruct_to_ba(video, config, known_corners, metrics, ckpt)
        return _solve_and_finish(pre, config, metrics, ckpt, path)


def _solve_and_finish(
    pre: PreBA,
    config: PipelineConfig,
    metrics: Metrics,
    ckpt,
    path: Optional[str],
) -> ProcessResult:
    """Global BA + volume + PLY from a PreBA — the back half of ``process``
    (split out so ``parallel.pipelined`` can run it as its own pipeline
    stage on a different device)."""
    n_kf = pre.n_kf
    w, h = pre.image_size

    with metrics.stage("bundle_adjustment"):
        if config.incremental_ba:
            # Online refinement — the reference's intended incremental design
            # (commented out at processor.py:395-408): after each keyframe,
            # re-solve the BA on the observation prefix. One compiled masked
            # solve is reused for every prefix (shapes never change); the
            # final prefix IS the global problem.
            ext_cur, pts_cur = pre.ext_refined, pre.points
            fidx_j = jnp.asarray(pre.fidx)
            rmse_steps = []
            for k in range(3, n_kf + 1):
                pts_cur, ext4, ba_res = bundle_adjust.adjust_points(
                    ext_cur,
                    pre.intrinsics,
                    pts_cur,
                    pre.obs,
                    pre.fidx,
                    pre.pidx,
                    mask=fidx_j < k,
                    weights=pre.obs_weight,
                    config=config.solver,
                )
                ext_cur = ext4[:, :3, :]
                rmse_steps.append(float(ba_res.rmse))
            new_pts, new_ext = pts_cur, ext4
            metrics.count("ba_rmse_px_steps", rmse_steps)
        else:
            new_pts, new_ext, ba_res = bundle_adjust.adjust_points(
                pre.ext_refined,
                pre.intrinsics,
                pre.points,
                pre.obs,
                pre.fidx,
                pre.pidx,
                weights=pre.obs_weight,
                config=config.solver,
            )
        metrics.count("ba_rmse_px", float(ba_res.rmse))
        metrics.count("ba_iterations", int(ba_res.iterations))
        numerics.check_finite("bundle_adjustment", points=new_pts, extrinsics=new_ext)
        metrics.count("points", int(len(np.asarray(new_pts))))
        if ckpt.enabled:
            ckpt.save(
                "cloud",
                points=np.asarray(new_pts),
                extrinsics=np.asarray(new_ext),
                intrinsics=np.asarray(pre.intrinsics),
                distortion=np.asarray(pre.dist),
                rmse=float(ba_res.rmse),
            )

    with metrics.stage("volume"):
        vol_hull, vol_carve, n_item = _estimate_volume(
            jnp.asarray(new_pts), pre.intrinsics, jnp.asarray(new_ext), n_kf, (w, h), config,
            point_sigma=pre.point_sigma,
        )
        metrics.count("item_points", n_item)
        metrics.count("volume_hull", vol_hull)
        metrics.count("volume_carved", vol_carve)

    ply_path = None
    if path is not None:
        with metrics.stage("ply_export"):
            ply_path = ply_mod.write_ply(str(path) + "Cloud.ply", np.asarray(new_pts))

    return ProcessResult(
        points=np.asarray(new_pts),
        extrinsics=np.asarray(new_ext),
        intrinsics=np.asarray(pre.intrinsics),
        distortion=np.asarray(pre.dist),
        volume=vol_hull,
        volume_carved=vol_carve,
        ply_path=ply_path,
        reprojection_rmse=float(ba_res.rmse),
        metrics=metrics.as_dict(),
    )


def _estimate_volume(pts_j, intrinsics, ext4, n_kf, image_size, config, point_sigma=None):
    """Hull + carved volume of the item points; NaNs when too few points.

    ``point_sigma``: per-point positional uncertainty (octave sigma). The
    hull/carve estimators are set entirely by extreme points, so
    coarse-octave points (uncertainty of several px -> large depth noise)
    are excluded from the volume point set — they still served pose/BA.
    """
    w, h = image_size
    pmask = jnp.ones(pts_j.shape[0], bool)
    if point_sigma is not None and config.volume.max_point_sigma > 0:
        precise = jnp.asarray(point_sigma) <= config.volume.max_point_sigma
        # Fall back to all points if the precise subset is too thin.
        pmask = jnp.where(jnp.sum(precise) >= 32, precise, pmask)
    item_mask = volume_mod.split_item_points(pts_j, pmask)
    have_item = bool(np.asarray(item_mask).sum() >= 8)
    if have_item:
        vol_hull = float(
            volume_mod.convex_hull_volume(
                pts_j, item_mask, resolution=config.volume.voxel_resolution
            )
        )
        proj_new = projection.projection_from_extrinsic(intrinsics, ext4[:, :3, :])
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
    return vol_hull, vol_carve, int(np.asarray(item_mask).sum())
