"""Perspective-n-Point pose solving, batched over frames with ``vmap``.

Replaces the per-frame ``cv2.solvePnP(..., SOLVEPNP_ITERATIVE)`` loop
(``processor.py:175-179`` driven by the loop at ``:429-442``) with:

  1. a closed-form planar initialization from a homography (the calibration
     target is the planar 4x3 chessboard laid in the X-Z plane,
     ``processor.py:162-166``), and
  2. Gauss-Newton refinement of the 6-dof pose minimizing reprojection error
     — the same functional ``SOLVEPNP_ITERATIVE`` minimizes — with analytic
     Jacobians via ``jax.jacfwd`` and a fixed iteration count so the whole
     thing stays one compiled XLA program per batch of frames.

All functions take points already in *undistorted* pixel coordinates; the
caller undistorts once (``meatmodeler_tpu.geometry.distortion``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meatmodeler_tpu.utils.precision import matmul_highp

from meatmodeler_tpu.geometry import projection

__all__ = ["solve_pnp_planar", "refine_pose", "solve_pnp_batch"]


def _orthonormalize(r: jax.Array) -> jax.Array:
    """Project a near-rotation 3x3 onto SO(3) via SVD (Procrustes)."""
    u, _, vt = jnp.linalg.svd(r)
    d = jnp.linalg.det(u @ vt)
    fix = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    return u @ fix @ vt


@matmul_highp
def solve_pnp_planar(
    plane_uv: jax.Array,
    obj_cols: jax.Array,
    img_pts: jax.Array,
    intrinsics: jax.Array,
) -> jax.Array:
    """Closed-form pose for a planar target from a homography.

    The target plane is spanned by two world axes selected by ``obj_cols``
    (e.g. ``(0, 2)`` for the reference's X-Z chessboard plane,
    ``processor.py:164-166``). The image-to-plane homography decomposes as
    H = s * K [r_a r_b t] with (a, b) = obj_cols, the missing column recovered
    by the cross product.

    Args:
      plane_uv: (N, 2) target coordinates in the plane basis.
      obj_cols: static pair of world-axis indices spanning the plane.
      img_pts: (N, 2) observed pixel coordinates (undistorted).
      intrinsics: (3, 3) K.

    Returns:
      (6,) pose parameters [rvec, tvec].
    """
    from meatmodeler_tpu.geometry.homography import find_homography

    h = find_homography(plane_uv, img_pts)
    m = jnp.linalg.solve(intrinsics, h)  # K^-1 H = s [r_a r_b t]
    scale = 0.5 * (jnp.linalg.norm(m[:, 0]) + jnp.linalg.norm(m[:, 1]))
    m = m / jnp.maximum(scale, 1e-12)
    # The target must sit in front of the camera: t_z > 0.
    m = m * jnp.where(m[2, 2] < 0, -1.0, 1.0)

    r_a = m[:, 0]
    r_b = m[:, 1]
    tvec = m[:, 2]

    a, b = obj_cols
    c = 3 - a - b  # the remaining axis index
    # Right-handed completion: r_c = r_a x r_b gives det +1 ordering for the
    # cyclic cases; the parity of (a, b, c) decides the sign.
    perm_sign = 1.0 if (a, b, c) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)) else -1.0

    from meatmodeler_tpu.geometry import so3

    def complete(ra, rb):
        cols = [None, None, None]
        cols[a] = ra
        cols[b] = rb
        cols[c] = perm_sign * jnp.cross(ra, rb)
        return _orthonormalize(jnp.stack(cols, axis=1))

    rot = complete(r_a, r_b)
    # Planar pose is two-fold ambiguous (Schweighofer-Pinz): the twin tilts
    # the board the other way — mirror the in-plane basis vectors through
    # the camera's z = const plane. Noisy/oblique views make the homography
    # decomposition land on the WRONG one, and reprojection Gauss-Newton
    # cannot cross between the two basins; callers refine both and keep the
    # lower-error pose.
    flip = jnp.array([1.0, 1.0, -1.0], m.dtype)
    rot2 = complete(r_a * flip, r_b * flip)
    return (
        jnp.concatenate([so3.log(rot), tvec]),
        jnp.concatenate([so3.log(rot2), tvec]),
    )


@matmul_highp
def refine_pose(
    pose: jax.Array,
    obj_pts: jax.Array,
    img_pts: jax.Array,
    intrinsics: jax.Array,
    iters: int = 10,
    damping: float = 1e-8,
) -> jax.Array:
    """Gauss-Newton refinement of a single 6-dof pose.

    Minimizes sum ||project(X_i, pose) - x_i||^2 — the functional of
    ``SOLVEPNP_ITERATIVE`` — with a Levenberg fallback (tiny constant damping
    keeps the 6x6 normal system well-posed without a trust-region loop; the
    planar init is already close).
    """

    def residual(p):
        proj = projection.project_points(obj_pts, p[None, :], intrinsics)
        return (proj - img_pts).reshape(-1)

    def step(_, p):
        r = residual(p)
        jac = jax.jacfwd(residual)(p)  # (2N, 6)
        jtj = jac.T @ jac + damping * jnp.eye(6, dtype=p.dtype)
        jtr = jac.T @ r
        return p - jnp.linalg.solve(jtj, jtr)

    return jax.lax.fori_loop(0, iters, step, pose)


@partial(jax.jit, static_argnames=("obj_cols", "iters"))
@matmul_highp
def solve_pnp_batch(
    plane_uv: jax.Array,
    obj_cols,
    obj_pts: jax.Array,
    img_pts: jax.Array,
    intrinsics: jax.Array,
    iters: int = 10,
) -> jax.Array:
    """Planar init + GN refine for a batch of frames in one program.

    Args:
      plane_uv: (N, 2) planar target coordinates (shared across frames).
      obj_cols: static world-axis pair spanning the plane.
      obj_pts: (N, 3) full 3D target points (shared across frames).
      img_pts: (F, N, 2) per-frame observed pixels (undistorted).
      intrinsics: (3, 3) K.

    Returns:
      (F, 6) per-frame pose parameters.
    """

    def one(img):
        init_a, init_b = solve_pnp_planar(plane_uv, obj_cols, img, intrinsics)
        pose_a = refine_pose(init_a, obj_pts, img, intrinsics, iters=iters)
        pose_b = refine_pose(init_b, obj_pts, img, intrinsics, iters=iters)

        def cost(p):
            proj = projection.project_points(obj_pts, p[None, :], intrinsics)
            return jnp.sum((proj - img) ** 2)

        return jnp.where(cost(pose_a) <= cost(pose_b), pose_a, pose_b)

    return jax.vmap(one)(img_pts)
