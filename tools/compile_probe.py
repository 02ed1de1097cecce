"""Compile-time probe: which sub-programs dominate the cold-start compiles.

Times ``jit(...).lower(...).compile()`` for the pass-2 ORB minibatch's
sub-stages and the board detector at the headline-bench shapes, against a
throwaway compilation cache (so every timing is a true cold compile on the
backend). Run on the real TPU backend:

    python tools/compile_probe.py [stage ...]

Stages: fast harris detect orientation describe gauss orb board board4096
(default: all the cheap ones; 'orb' = the full 390 s program, opt-in).
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

from meatmodeler_tpu.ops import board_detect, features, orb  # noqa: E402

H, W = 540, 960  # bench pass-2 working resolution (1080p / 2)
MB = 4  # pipeline._ORB_MINIBATCH
NFEAT = 4096
NLEV = 4
BH, BW = 180, 320  # bench pass-1 small resolution (1080p / 6)
BMB = 8  # pipeline._DETECT_MINIBATCH


def clock(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"{name:<28} lower {t_lower:7.2f}s   compile {t_compile:7.2f}s", flush=True)


def main(argv):
    stages = set(argv) or {
        "fast", "harris", "detect", "orientation", "describe", "gauss", "board",
    }
    img = jnp.zeros((MB, H, W), jnp.float32)
    xy = jnp.zeros((MB, NFEAT, 2), jnp.float32)
    mask = jnp.ones((MB, NFEAT), bool)
    ang = jnp.zeros((MB, NFEAT), jnp.float32)

    if "fast" in stages:
        clock("fast_score", jax.vmap(orb.fast_score), img)
    if "harris" in stages:
        clock(
            "harris",
            jax.vmap(lambda g: features.harris_response(g, block_size=7)),
            img,
        )
    if "detect" in stages:

        def det(g):
            corner = orb.fast_score(g, 20.0)
            harris = features.harris_response(g, block_size=7)
            resp = jnp.where(corner > 0, harris, -jnp.inf)
            neigh = jax.lax.reduce_window(
                resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
            )
            flat = jnp.where(resp >= neigh, resp, -jnp.inf).reshape(-1)
            return jax.lax.top_k(flat, NFEAT)

        clock("detect(no desc) 1 level", jax.vmap(det), img)
    if "orientation" in stages:
        clock("orientation n=4096", jax.vmap(orb._orientation), img, xy, mask)
    if "gauss" in stages:
        clock("gauss7", jax.vmap(orb._gauss7), img)
    if "describe" in stages:
        clock(
            "describe n=4096",
            jax.vmap(orb._describe, in_axes=(0, 0, 0, 0, None)),
            img, xy, ang, mask, orb.brief_bin_weights(),
        )
    if "orb" in stages:
        clock(
            "FULL orb minibatch",
            jax.vmap(
                lambda g, w: orb.detect_and_compute(
                    g, max_features=NFEAT, num_levels=NLEV, bin_weights=w
                ),
                in_axes=(0, None),
            ),
            img,
            orb.brief_bin_weights(),
        )
    if "orb1" in stages:
        clock(
            "orb single img 4 lvl",
            lambda g, w: orb.detect_and_compute(
                g, max_features=NFEAT, num_levels=NLEV, bin_weights=w
            ),
            img[0],
            orb.brief_bin_weights(),
        )
    if "orb1_l1" in stages:
        clock(
            "orb single img 1 lvl",
            lambda g, w: orb.detect_and_compute(
                g, max_features=NFEAT, num_levels=1, bin_weights=w
            ),
            img[0],
            orb.brief_bin_weights(),
        )
    if "resize" in stages:

        def chain(g):
            outs = []
            h, w = g.shape
            for _ in range(3):
                nh, nw = int(round(h / 1.2)), int(round(w / 1.2))
                g = jax.image.resize(g, (nh, nw), "linear")
                outs.append(jnp.sum(g))
                h, w = nh, nw
            return jnp.stack(outs)

        clock("resize chain x3", chain, img[0])
    if "detect4" in stages:

        def det4(g):
            outs = []
            h, w = g.shape
            for lvl in range(4):
                corner = orb.fast_score(g, 20.0)
                harris = features.harris_response(g, block_size=7)
                resp = jnp.where(corner > 0, harris, -jnp.inf)
                neigh = jax.lax.reduce_window(
                    resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
                )
                flat = jnp.where(resp >= neigh, resp, -jnp.inf).reshape(-1)
                v, i = jax.lax.approx_max_k(flat, 1024)
                outs.append(jnp.sum(v))
                if lvl < 3:
                    nh, nw = int(round(h / 1.2)), int(round(w / 1.2))
                    g = jax.image.resize(g, (nh, nw), "linear")
                    h, w = nh, nw
            return jnp.stack(outs)

        clock("detect x4 levels", det4, img[0])
    if "describe4" in stages:

        def desc4(g, w_):
            outs = []
            h, w = g.shape
            xy1 = jnp.zeros((1024, 2), jnp.float32)
            m1 = jnp.ones(1024, bool)
            a1 = jnp.zeros(1024, jnp.float32)
            for lvl in range(4):
                blurred = orb._gauss7(g)
                outs.append(orb._describe(blurred, xy1, a1, m1, w_))
                if lvl < 3:
                    nh, nw = int(round(h / 1.2)), int(round(w / 1.2))
                    g = jax.image.resize(g, (nh, nw), "linear")
                    h, w = nh, nw
            return jnp.concatenate(outs)

        clock("describe x4 levels", desc4, img[0], orb.brief_bin_weights())
    if "ba_pose" in stages or "ba_global" in stages:
        from meatmodeler_tpu.solvers import bundle_adjust

        def ba_case(name, f_, p_, n_, fix_points):
            r = np.random.default_rng(0)
            prob = bundle_adjust.BAProblem(
                cam_params=jnp.asarray(r.normal(size=(f_, 6)), jnp.float32),
                points=jnp.asarray(r.normal(size=(p_, 3)), jnp.float32),
                intrinsics=jnp.eye(3, dtype=jnp.float32) * 500,
                obs=jnp.asarray(r.normal(size=(n_, 2)), jnp.float32),
                frame_idx=jnp.asarray(r.integers(0, f_, n_), jnp.int32),
                point_idx=jnp.asarray(r.integers(0, p_, n_), jnp.int32),
                mask=jnp.ones(n_, bool),
            )
            t0 = time.perf_counter()
            lowered = bundle_adjust.solve_ba.lower(prob, fix_points=fix_points)
            t_lower = time.perf_counter() - t0
            t0 = time.perf_counter()
            lowered.compile()
            print(
                f"{name:<28} lower {t_lower:7.2f}s   "
                f"compile {time.perf_counter() - t0:7.2f}s", flush=True
            )

        if "ba_pose" in stages:
            ba_case("solve_ba pose F=20", 20, 12, 240, True)
        if "ba_global" in stages:
            ba_case("solve_ba global 600pt", 20, 600, 3600, False)
    if "board" in stages:
        small = jnp.zeros((BMB, BH, BW), jnp.float32)
        clock(
            "board_detect mb=8",
            jax.vmap(
                lambda g: board_detect.find_chessboard_device(
                    g, pattern=(4, 3), max_candidates=24
                )
            ),
            small,
        )
    if "board1" in stages:
        small1 = jnp.zeros((BH, BW), jnp.float32)
        clock(
            "board_detect single",
            lambda g: board_detect.find_chessboard_device(
                g, pattern=(4, 3), max_candidates=24
            ),
            small1,
        )

    # ---- variants under test ----
    if "describe_arg" in stages:
        # Hypothesis: the 52 MB _BIN_WEIGHTS module constant is embedded as
        # an HLO literal; passing it as an argument should collapse the 68 s
        # lowering.
        wts = jnp.asarray(orb._BIN_WEIGHTS_NP, jnp.bfloat16)

        def describe_arg(blur, xy_, ang_, m_, w_):
            n = xy_.shape[0]
            padded = jnp.pad(blur, orb._DHALF + 1, mode="edge")
            h, wd = blur.shape

            def patch(pt):
                x0 = jnp.clip(pt[0].astype(jnp.int32), 0, wd - 1) + 1
                y0 = jnp.clip(pt[1].astype(jnp.int32), 0, h - 1) + 1
                return jax.lax.dynamic_slice(
                    padded, (y0, x0), (orb._DPATCH, orb._DPATCH)
                )

            patches = jax.vmap(patch)(xy_).reshape(n, -1)
            sampled = jax.lax.dot_general(
                w_.astype(jnp.bfloat16),
                patches.astype(jnp.bfloat16).T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(orb._NBINS, 512, n)
            bin_idx = (
                jnp.round(ang_ / (2.0 * jnp.pi / orb._NBINS)).astype(jnp.int32)
                % orb._NBINS
            )
            vals = sum(
                sampled[b] * (bin_idx == b).astype(jnp.float32)[None, :]
                for b in range(orb._NBINS)
            ).T
            bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.int8)
            return jnp.where(m_[:, None], bits, 0)

        clock(
            "describe(weights as arg)",
            jax.vmap(describe_arg, in_axes=(0, 0, 0, 0, None)),
            img, xy, ang, mask, wts,
        )
    if "detect_approx" in stages:

        def det_approx(g):
            corner = orb.fast_score(g, 20.0)
            harris = features.harris_response(g, block_size=7)
            resp = jnp.where(corner > 0, harris, -jnp.inf)
            neigh = jax.lax.reduce_window(
                resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
            )
            flat = jnp.where(resp >= neigh, resp, -jnp.inf).reshape(-1)
            return jax.lax.approx_max_k(flat, NFEAT)

        clock("detect approx_max_k", jax.vmap(det_approx), img)
    if "board_noscatter" in stages:
        small1 = jnp.zeros((BH, BW), jnp.float32)

        def board_ns(grey):
            # find_chessboard_device with the injectivity scatter replaced by
            # one-hot reductions (d2 is only (G, K) = (12, 24)).
            from meatmodeler_tpu.ops.board_detect import (
                _basis_homography, _grid_constants, saddle_candidates,
            )

            pattern, max_candidates, hyp_candidates, tol = (4, 3), 24, 16, 3.0
            cols, rows = pattern
            g = cols * rows
            cand = saddle_candidates(grey, max_candidates=max_candidates)
            inv_dom, grid = _grid_constants(pattern)
            inv_dom = jnp.asarray(inv_dom, jnp.float32)
            grid = jnp.asarray(grid, jnp.float32)
            m = hyp_candidates
            hyp = jnp.arange(m**4, dtype=jnp.int32)
            idx4 = jnp.stack(
                [hyp // (m**3), (hyp // (m**2)) % m, (hyp // m) % m, hyp % m], axis=1
            )
            cand_xy, cand_valid = cand.xy, cand.mask
            norm_score = cand.score / jnp.maximum(jnp.max(cand.score), 1e-12)
            big = jnp.float32(1e9)
            park = big * (1.0 + jnp.arange(max_candidates, dtype=jnp.float32))[:, None]
            cand_pos = jnp.where(cand_valid[:, None], cand_xy, park)

            def score_hyp(ids):
                p4 = cand_pos[ids]
                distinct = (
                    (ids[0] != ids[1]) & (ids[0] != ids[2]) & (ids[0] != ids[3])
                    & (ids[1] != ids[2]) & (ids[1] != ids[3]) & (ids[2] != ids[3])
                )
                usable = distinct & jnp.all(cand_valid[ids])
                p4c = jnp.clip(p4, -1e6, 1e6)
                hb, hok = _basis_homography(p4c)
                h = hb @ inv_dom
                proj = grid @ h.T
                z = proj[:, 2]
                zok = jnp.all(jnp.abs(z) > 1e-8)
                pts = proj[:, :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1.0)[:, None]
                d2 = jnp.sum((pts[:, None, :] - cand_pos[None, :, :]) ** 2, axis=-1)
                md2 = jnp.min(d2, axis=1)
                nearest = jnp.argmin(d2, axis=1)
                dmin = jnp.sqrt(md2)
                matched = dmin < tol
                # Scatter-free injectivity: candidate k is hit iff it is the
                # argmin of some matched grid point.
                is_near = d2 <= md2[:, None]
                first = jnp.cumsum(is_near, axis=1) == 1
                hit = jnp.any(is_near & first & matched[:, None], axis=0)
                injective = jnp.sum(hit) == g
                full = jnp.sum(matched) == g
                ok = usable & hok & zok & full & injective
                total = jnp.sum(jnp.where(matched, dmin, tol))
                strength = jnp.sum(jnp.where(matched, norm_score[nearest], 0.0))
                objective = total + (g - strength) * (8.0 * tol)
                return jnp.where(ok, objective, jnp.inf), total, nearest

            chunk = 1024
            objectives, totals, nearests = jax.lax.map(
                jax.vmap(score_hyp), idx4.reshape(-1, chunk, 4)
            )
            objectives = objectives.reshape(-1)
            best = jnp.argmin(objectives)
            return cand_xy[nearests.reshape(-1, g)[best]], jnp.isfinite(
                objectives[best]
            )

        clock("board no-scatter single", board_ns, small1)


if __name__ == "__main__":
    main(sys.argv[1:])
