"""Trace-time matmul-precision pinning for numerics-critical code.

On TPU, float32 ``jnp.dot``/``@``/``einsum`` default to reduced-precision
MXU passes (bfloat16 mantissas). That is the right trade for the image
path (CLAHE LUT application, ORB matching's Hamming matmul — large,
precision-insensitive), but it is catastrophic for the GEOMETRY path:
Gauss-Newton normal equations square the condition number, so the ~3
decimal digits a bf16-pass matmul keeps turn LM solves into random walks
(caught by tests/test_tpu_device.py::TestSolversOnDevice — on exact
observations the pose solver stalled at 0.33 px residual with the damping
railed at 1e12; with HIGHEST it reaches ~0 like the CPU backend).

``matmul_highp`` wraps a function so that every jnp operation created
while its Python body runs — i.e. while it is being TRACED, standalone or
inlined inside any outer ``jit`` — defaults to
``lax.Precision.HIGHEST`` (full f32 via multi-pass bf16 on the MXU).
The geometry matrices are tiny (3x3 blocks, 8-point systems, reduced
camera systems of tens of rows), so the extra MXU passes are free at the
pipeline scale while restoring ~7 significant digits.

CPU/GPU backends already run full f32; there the wrapper is a no-op in
effect (the config still participates in jit cache keys, which is why the
wrapper is applied at function level, not flipped globally: the image-path
programs must keep compiling at DEFAULT).
"""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["matmul_highp"]

# Debug escape hatch: MEATMODELER_NO_HIGHP=1 makes the wrapper a no-op, so
# a numeric difference can be A/B'd against the backend's default matmul
# precision without touching call sites. Read once at import.
_DISABLED = os.environ.get("MEATMODELER_NO_HIGHP", "") == "1"


def matmul_highp(fn):
    """Run ``fn`` (and anything it inlines) under HIGHEST matmul precision.

    The context is entered whenever the Python body executes, which for
    jitted callers is exactly trace time — nested application is harmless.
    """
    if _DISABLED:
        return fn

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
