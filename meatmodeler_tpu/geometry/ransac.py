"""Massively-batched RANSAC for fundamental/essential matrices.

A north-star capability (BASELINE.json): "RANSAC essential-matrix estimation
and DLT triangulation run as massively-batched hypothesis solves in a single
XLA program". The reference has no RANSAC at all — its geometry leans
entirely on the chessboard; this module provides marker-free two-view
geometry and robust match filtering.

Design: classic RANSAC's sequential hypothesize-test loop is replaced by a
fully parallel sweep — thousands of 8-point hypotheses drawn with
``jax.random``, each solved by the normalized 8-point algorithm (a batched
9x9 symmetric eigenproblem), all scored against all matches by Sampson
distance (one batched matmul pipeline), best-by-inlier-count selected with
an ``argmax``. No data-dependent control flow: one XLA program, MXU-heavy.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from meatmodeler_tpu.geometry import so3

__all__ = ["RansacResult", "find_fundamental", "find_essential", "recover_pose"]


class RansacResult(NamedTuple):
    matrix: jax.Array  # (3, 3) best F or E
    inliers: jax.Array  # (N,) bool
    num_inliers: jax.Array  # scalar int
    residuals: jax.Array  # (N,) Sampson distances under the best model


def _normalize(pts: jax.Array, mask: jax.Array):
    """Hartley normalization over the valid points only."""
    n = jnp.maximum(jnp.sum(mask), 1)
    centroid = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / n
    centered = pts - centroid
    dist = jnp.where(mask, jnp.linalg.norm(centered, axis=1), 0.0)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(dist) / n, 1e-12)
    t = jnp.array(
        [
            [scale, 0.0, -scale * centroid[0]],
            [0.0, scale, -scale * centroid[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    return centered * scale, t


def _eight_point(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Normalized 8-point solve for one hypothesis: (8, 2) x 2 -> (3, 3).

    Operates on already-normalized coordinates; rank-2 enforcement via SVD.
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    one = jnp.ones_like(x1)
    a = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )  # (8, 9)
    ata = a.T @ a
    _, vecs = jnp.linalg.eigh(ata)
    f = vecs[:, 0].reshape(3, 3)
    # Enforce rank 2.
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt


def _sampson(f: jax.Array, p1h: jax.Array, p2h: jax.Array) -> jax.Array:
    """Sampson distance of each correspondence under F. p*h are (N, 3)."""
    fp1 = p1h @ f.T  # (N, 3) = F @ p1
    ftp2 = p2h @ f  # (N, 3) = F^T @ p2
    num = jnp.sum(p2h * fp1, axis=1) ** 2
    den = fp1[:, 0] ** 2 + fp1[:, 1] ** 2 + ftp2[:, 0] ** 2 + ftp2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def find_fundamental(
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    threshold: float = 1.5,
    num_hypotheses: int = 2048,
) -> RansacResult:
    """Batched-RANSAC fundamental matrix.

    Args:
      pts1 / pts2: (N, 2) matched pixel coordinates (padded slots allowed).
      mask: (N,) validity.
      key: PRNG key.
      threshold: inlier Sampson distance in (squared) pixels.
      num_hypotheses: hypotheses solved in parallel.

    Returns:
      RansacResult; ``matrix`` maps pts1 -> epipolar lines in image 2.
    """
    n = pts1.shape[0]
    n1, t1 = _normalize(pts1, mask)
    n2, t2 = _normalize(pts2, mask)

    # Sample 8-subsets biased to valid entries: draw from valid indices via
    # categorical over the mask (duplicates possible but harmless — a
    # degenerate hypothesis simply scores poorly).
    logits = jnp.where(mask, 0.0, -jnp.inf)
    idx = jax.random.categorical(
        key, logits[None, :], shape=(num_hypotheses, 8)
    )  # (H, 8)

    h1 = n1[idx]  # (H, 8, 2)
    h2 = n2[idx]
    fs = jax.vmap(_eight_point)(h1, h2)  # (H, 3, 3)

    p1h = jnp.concatenate([n1, jnp.ones((n, 1), n1.dtype)], axis=1)
    p2h = jnp.concatenate([n2, jnp.ones((n, 1), n2.dtype)], axis=1)

    # Normalized-space threshold: Sampson in normalized units scales ~ by the
    # normalization scale; score in pixel units by unnormalizing each F.
    def pixel_f(fn):
        return t2.T @ fn @ t1

    fs_px = jax.vmap(pixel_f)(fs)
    p1px = jnp.concatenate([pts1, jnp.ones((n, 1), pts1.dtype)], axis=1)
    p2px = jnp.concatenate([pts2, jnp.ones((n, 1), pts2.dtype)], axis=1)
    d = jax.vmap(lambda f: _sampson(f, p1px, p2px))(fs_px)  # (H, N)
    inl = (d < threshold * threshold) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    f_best = fs_px[best]
    res = _sampson(f_best, p1px, p2px)
    inliers = (res < threshold * threshold) & mask
    return RansacResult(
        matrix=f_best / jnp.where(jnp.abs(f_best[2, 2]) > 1e-12, f_best[2, 2], 1.0),
        inliers=inliers,
        num_inliers=jnp.sum(inliers),
        residuals=jnp.where(mask, res, jnp.inf),
    )


@partial(jax.jit, static_argnames=("num_hypotheses",))
def find_essential(
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    intrinsics: jax.Array,
    key: jax.Array,
    threshold: float = 1.5,
    num_hypotheses: int = 2048,
) -> RansacResult:
    """Essential matrix via RANSAC on normalized rays: E = K2^T F K1 with the
    singular-value structure (s, s, 0) enforced on the winner."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    norm1 = (pts1 - jnp.stack([cx, cy])) / jnp.stack([fx, fy])
    norm2 = (pts2 - jnp.stack([cx, cy])) / jnp.stack([fx, fy])

    # Threshold converts from pixels to normalized units by the mean focal.
    thr_norm = threshold / (0.5 * (fx + fy))
    res = find_fundamental(
        norm1, norm2, mask, key, threshold=thr_norm, num_hypotheses=num_hypotheses
    )
    e = res.matrix
    u, s, vt = jnp.linalg.svd(e)
    s_mean = 0.5 * (s[0] + s[1])
    e_fixed = u @ jnp.diag(jnp.array([s_mean, s_mean, 0.0])) @ vt
    return res._replace(matrix=e_fixed)


def recover_pose(
    essential: jax.Array,
    pts1: jax.Array,
    pts2: jax.Array,
    mask: jax.Array,
    intrinsics: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Disambiguate E into (R, t) by cheirality voting (cv2.recoverPose).

    Returns (rvec (3,), t unit (3,), votes (4,)) — the winning decomposition
    among the four candidates, scored by how many inlier points land in
    front of both cameras.
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    n1 = (pts1 - jnp.stack([cx, cy])) / jnp.stack([fx, fy])
    n2 = (pts2 - jnp.stack([cx, cy])) / jnp.stack([fx, fy])

    u, _, vt = jnp.linalg.svd(essential)
    # Proper rotations.
    d1 = jnp.linalg.det(u) * jnp.linalg.det(vt)
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    r1 = u @ w @ vt * jnp.where(d1 < 0, -1.0, 1.0)
    r2 = u @ w.T @ vt * jnp.where(d1 < 0, -1.0, 1.0)
    t = u[:, 2]

    eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def depths(r, tv):
        p2 = jnp.concatenate([r, tv[:, None]], axis=1)
        # Midpoint-free linear triangulation in normalized coords.
        from meatmodeler_tpu.geometry.triangulation import triangulate_pairs

        x = triangulate_pairs(eye34, p2, n1, n2)
        z1 = x[:, 2]
        x2 = (r @ x.T).T + tv
        z2 = x2[:, 2]
        return jnp.sum((z1 > 0) & (z2 > 0) & mask)

    cands = [(r1, t), (r1, -t), (r2, t), (r2, -t)]
    votes = jnp.stack([depths(r, tv) for r, tv in cands])
    best = jnp.argmax(votes)
    rs = jnp.stack([so3.log(r) for r, _ in cands])
    ts = jnp.stack([tv for _, tv in cands])
    return rs[best], ts[best], votes
