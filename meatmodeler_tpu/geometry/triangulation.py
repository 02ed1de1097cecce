"""Batched DLT triangulation.

Replaces the reference's per-track Python loop over ``cv2.triangulatePoints``
(``processor.py:246-261`` — HOT LOOP #3 in SURVEY.md §3.1) with a single
``vmap``-batched linear solve: all tracks triangulate in one XLA program.

The reference triangulates each track from its first and last observations
only (widest baseline, ``track.py:30-32``); ``triangulate_pairs`` reproduces
that two-view DLT. ``triangulate_tracks`` additionally supports masked N-view
triangulation over the SoA track store, which uses *every* observation (the
reference only folds middle observations in via bundle adjustment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meatmodeler_tpu.utils.precision import matmul_highp

__all__ = ["triangulate_pairs", "triangulate_nview"]


@matmul_highp
def _dlt_solve(design: jax.Array) -> jax.Array:
    """Solve the homogeneous system ``design @ X = 0`` for unit X, batched.

    ``design`` is (..., M, 4); returns (..., 4) — the smallest right singular
    vector, computed via the eigenvector of the 4x4 normal matrix A^T A (a
    fixed-size symmetric eigenproblem: far friendlier to XLA than a tall SVD,
    and exact for this use).
    """
    ata = jnp.einsum("...mi,...mj->...ij", design, design)
    # eigh returns ascending eigenvalues; smallest eigenvector is column 0.
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[..., :, 0]


@matmul_highp
def triangulate_pairs(
    proj1: jax.Array,
    proj2: jax.Array,
    pts1: jax.Array,
    pts2: jax.Array,
) -> jax.Array:
    """Two-view DLT triangulation (semantics of ``cv2.triangulatePoints``).

    Args:
      proj1: (..., 3, 4) projection matrix of the first observation.
      proj2: (..., 3, 4) projection matrix of the second observation.
      pts1: (..., 2) pixel coordinates in the first view.
      pts2: (..., 2) pixel coordinates in the second view.

    Returns:
      (..., 3) dehomogenized 3D points (the ``point[:, :3] / point[:, -1]``
      step of ``processor.py:260``).
    """
    def two_rows(proj, pt):
        # x * P[2] - P[0] = 0 ; y * P[2] - P[1] = 0
        r0 = pt[..., 0:1] * proj[..., 2, :] - proj[..., 0, :]
        r1 = pt[..., 1:2] * proj[..., 2, :] - proj[..., 1, :]
        return jnp.stack([r0, r1], axis=-2)

    design = jnp.concatenate([two_rows(proj1, pts1), two_rows(proj2, pts2)], axis=-2)
    homog = _dlt_solve(design)
    return homog[..., :3] / homog[..., 3:4]


@matmul_highp
def triangulate_nview(
    projections: jax.Array,
    coords: jax.Array,
    obs_mask: jax.Array,
) -> jax.Array:
    """Masked N-view DLT over the SoA track store.

    Args:
      projections: (F, 3, 4) per-keyframe projection matrices.
      coords: (T, F, 2) per-track pixel coordinate at each keyframe.
      obs_mask: (T, F) bool — True where the track was observed.

    Returns:
      (T, 3) triangulated points. Tracks with < 2 observations produce
      garbage; callers must gate on ``obs_mask.sum(-1) >= 2``.
    """
    # Rows for every (track, frame): (T, F, 2, 4), zeroed where unobserved so
    # they do not perturb A^T A.
    r0 = coords[..., 0:1] * projections[None, :, 2, :] - projections[None, :, 0, :]
    r1 = coords[..., 1:2] * projections[None, :, 2, :] - projections[None, :, 1, :]
    rows = jnp.stack([r0, r1], axis=-2)
    rows = rows * obs_mask[..., None, None]
    design = rows.reshape(coords.shape[0], -1, 4)
    homog = _dlt_solve(design)
    return homog[..., :3] / homog[..., 3:4]
