"""CLAHE as Pallas TPU kernels.

The XLA implementation (``clahe.py``) materializes a (H*W, 256) one-hot in
HBM for the LUT apply and builds histograms with a full-image scatter-add —
roughly 2 GB of HBM traffic per 1080p frame. These kernels keep everything
in VMEM: each image-band grid step reads its band from HBM once, computes
the 256-bin tile histograms, the clip/redistribute and the CDF LUT on-chip
(kernel 1), then applies the bilinear-interpolated LUTs with an on-MXU
one-hot matmul (kernel 2). HBM traffic drops to ~3 image passes.

Replaces ``cv2.createCLAHE(clipLimit, tileGridSize).apply``
(``processor.py:22-23``) on the TPU backend; numerics match ``clahe.py``
(same integer clip arithmetic, same interpolation weights) to float
rounding. The pure-XLA path remains the CPU/test oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["clahe_pallas"]

_ROWS_HIST = 8  # image rows per histogram inner step
_ROWS_APPLY = 4  # image rows per LUT-apply inner step (bounds one-hot VMEM)


def _hist_contrib(rows, bins, tx, tw):
    """(R, Wp) integer-valued rows -> (tx, 256) histogram contribution.

    The per-pixel one-hot is rank-expanded only at LANE-ALIGNED column
    offsets (512-wide chunks): slicing each tile column at ``c * tw`` and
    expanding there trips Mosaic's unsupported-reshape path at some widths
    (measured: tw=50 fails, tw=40/60/120/240 compile), and tile widths are
    set by the image, not by us. Pixels are attributed to their tile column
    by a (tx, Wp) 0/1 selector matmul instead — an MXU dot, no unaligned
    slices. bf16 one-hot halves the chunk's VMEM (exact: values 0/1, row
    sums <= R, counts accumulate in f32 on the MXU).
    """
    r, wp = rows.shape
    tile_of = jax.lax.broadcasted_iota(jnp.int32, (tx, wp), 1) // tw
    sel = (
        tile_of == jax.lax.broadcasted_iota(jnp.int32, (tx, wp), 0)
    ).astype(jnp.bfloat16)
    wc = 512  # chunk width: multiple of the 128-lane register, bounds VMEM
    out = jnp.zeros((tx, 256), jnp.float32)
    for c0 in range(0, wp, wc):
        chunk = rows[:, c0 : min(c0 + wc, wp)]
        eq = (chunk[:, :, None] == bins).astype(jnp.bfloat16)  # (R, wc, 256)
        colhist = eq.sum(0)  # (wc, 256); exact in bf16 (<= R)
        out = out + jax.lax.dot_general(
            sel[:, c0 : min(c0 + wc, wp)],
            colhist,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out


def _lut_kernel(img_ref, lut_ref, hist_ref, *, tx, tw, th, clip_limit):
    """One (band, 8-row block) step: accumulate tile histograms in scratch;
    on the band's last block, clip/redistribute + CDF -> write the LUTs."""
    r = pl.program_id(1)
    nblk = pl.num_programs(1)
    blk = img_ref.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2).astype(jnp.float32)

    @pl.when(r == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    raw = img_ref[0]
    # The tail block may read past the band: poison those rows so they hit
    # no histogram bin (out-of-bounds block reads are unspecified values).
    row_ok = (jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + r * blk) < th
    vals = jnp.where(row_ok, jnp.round(jnp.clip(raw, 0.0, 255.0)), -1.0)
    hist_ref[...] += _hist_contrib(vals, bins, tx, tw)

    @pl.when(r == nblk - 1)
    def _():
        hist = hist_ref[...]
        # Clip + redistribute with OpenCV's integer arithmetic (see clahe.py).
        area = float(th * tw)
        clip = max(1.0, float(int(clip_limit * area / 256.0)))
        excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=1, keepdims=True)
        hist = jnp.minimum(hist, clip)
        redist = jnp.floor(excess / 256.0)
        residual = excess - redist * 256.0
        step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
        binsr = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1).astype(jnp.float32)
        bonus = ((binsr % step == 0) & (binsr / step < residual)).astype(jnp.float32)
        hist = hist + redist + bonus

        # CDF via an upper-triangular ones matmul (exact in f32 for counts).
        row = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
        tri = (row <= col).astype(jnp.float32)
        cdf = jax.lax.dot_general(
            hist,
            tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lut_ref[0] = jnp.clip(jnp.round(cdf * (255.0 / area)), 0.0, 255.0)


def _apply_kernel(img_ref, lut_ref, out_ref, *, ty, tx, th, tw):
    """One (band, 8-row, col-block) step: one-hot matmul + bilinear mixing."""
    i32 = (pl.program_id(0) % ty).astype(jnp.int32)  # tile row within image
    r0 = pl.program_id(1).astype(jnp.int32) * img_ref.shape[1]
    c0 = pl.program_id(2).astype(jnp.int32) * img_ref.shape[2]
    n, wb = img_ref.shape[1], img_ref.shape[2]
    luts_ref = lut_ref.at[0]

    lut_prev = luts_ref[pl.ds(jnp.maximum(i32 - 1, 0) * tx, tx), :]
    lut_cur = luts_ref[pl.ds(i32 * tx, tx), :]
    lut_next = luts_ref[pl.ds(jnp.minimum(i32 + 1, ty - 1) * tx, tx), :]
    lutcat = jnp.concatenate([lut_prev, lut_cur, lut_next], 0).astype(jnp.bfloat16)

    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2).astype(jnp.float32)

    # Horizontal interpolation weights to each tile column (matches clahe.py:
    # fx = x / tw - 0.5; borders absorb the out-of-range weight). x is the
    # GLOBAL column index of this block's pixels.
    x = (
        jax.lax.broadcasted_iota(jnp.int32, (wb, tx), 0).astype(jnp.float32)
        + c0.astype(jnp.float32)
    )
    j = jax.lax.broadcasted_iota(jnp.int32, (wb, tx), 1).astype(jnp.float32)
    fx = x / tw - 0.5
    wx = jnp.clip(1.0 - jnp.abs(fx - j), 0.0, 1.0)
    wx = wx + jnp.clip(-fx, 0.0, 1.0) * (j == 0) + jnp.clip(fx - (tx - 1), 0.0, 1.0) * (
        j == tx - 1
    )

    vals = jnp.round(jnp.clip(img_ref[0], 0.0, 255.0))
    onehot = (vals[:, :, None] == bins).astype(jnp.bfloat16)  # (n, wb, 256)
    v = jax.lax.dot_general(
        onehot,
        lutcat,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n, wb, 3*tx)

    y = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
        + i32.astype(jnp.float32) * th
        + r0.astype(jnp.float32)
    )
    t = y / th - 0.5 - i32.astype(jnp.float32)  # fy - i in [-0.5, 0.5)
    w_prev = jnp.maximum(-t, 0.0)
    w_cur = 1.0 - jnp.abs(t)
    w_next = jnp.maximum(t, 0.0)

    wx3 = wx[None, :, :]
    h_prev = (v[:, :, 0:tx] * wx3).sum(2)  # (n, wb)
    h_cur = (v[:, :, tx : 2 * tx] * wx3).sum(2)
    h_next = (v[:, :, 2 * tx : 3 * tx] * wx3).sum(2)
    out_ref[0] = h_prev * w_prev + h_cur * w_cur + h_next * w_next


@functools.partial(jax.jit, static_argnames=("clip_limit", "tiles", "interpret"))
def clahe_pallas(
    img: jax.Array,
    clip_limit: float = 3.5,
    tiles: Tuple[int, int] = (8, 8),
    interpret: bool = False,
) -> jax.Array:
    """CLAHE on (..., H, W) images in [0, 255]; returns float32. TPU-only."""
    img = jnp.asarray(img, jnp.float32)
    batch_shape = img.shape[:-2]
    h, w = img.shape[-2], img.shape[-1]
    flat = img.reshape((-1, h, w))
    b = flat.shape[0]
    ty, tx = tiles
    th = -(-h // ty)
    tw = -(-w // tx)
    pad_y = th * ty - h
    pad_x = tw * tx - w
    padded = jnp.pad(flat, ((0, 0), (0, pad_y), (0, pad_x)), mode="reflect")
    hp, wp = th * ty, tw * tx
    # Bands on the leading axis so every block's trailing dims EQUAL the
    # array dims (Mosaic's block-shape rule; th is rarely a multiple of 8).
    bands = padded.reshape(b * ty, th, wp)

    rblk = 8
    luts = pl.pallas_call(
        functools.partial(_lut_kernel, tx=tx, tw=tw, th=th, clip_limit=clip_limit),
        grid=(b * ty, -(-th // rblk)),
        in_specs=[
            pl.BlockSpec((1, rblk, wp), lambda g, r: (g, r, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, tx, 256), lambda g, r: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * ty, tx, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tx, 256), jnp.float32)],
        interpret=interpret,
    )(bands)
    luts = luts.reshape(b, ty * tx, 256)

    rapply, wapply = 8, min(512, wp)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, ty=ty, tx=tx, th=th, tw=tw),
        grid=(b * ty, -(-th // rapply), -(-wp // wapply)),
        in_specs=[
            pl.BlockSpec(
                (1, rapply, wapply), lambda g, r, c: (g, r, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ty * tx, 256), lambda g, r, c: (g // ty, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rapply, wapply), lambda g, r, c: (g, r, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * ty, th, wp), jnp.float32),
        interpret=interpret,
    )(bands, luts)

    return out.reshape(b, hp, wp)[:, :h, :w].reshape(*batch_shape, h, w)
