"""Two-view geometry: batched 8-point essential matrix RANSAC + pose recovery.

SURVEY.md C5. The reference family calls OpenCV's `findEssentialMat` /
`recoverPose` (C++, data-dependent early-exit RANSAC). The TPU-native
reformulation runs a *fixed* number of hypotheses fully batched: all minimal
samples solved with one batched SVD, all hypotheses scored against all
correspondences with one einsum — the argmax is the winner. No early exit,
no host sync; the whole routine is one jit program.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from laneslam.geometry import se3, so3
from laneslam.geometry.camera import Camera, pixel_bearing


class TwoViewResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) rotation (frame a -> frame b): x_b = R x_a + t
    t: jnp.ndarray  # (3,) unit translation
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # scalar int32
    E: jnp.ndarray  # (3, 3) essential matrix


def _essential_8pt(xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point algorithm on normalized coords.

    Args: xa, xb: (H, 8, 2). Returns E: (H, 3, 3) projected onto the
    essential manifold (singular values (1, 1, 0)).
    """
    ua, va = xa[..., 0], xa[..., 1]
    ub, vb = xb[..., 0], xb[..., 1]
    one = jnp.ones_like(ua)
    # Epipolar constraint x_b^T E x_a = 0, row per correspondence.
    A = jnp.stack(
        [ub * ua, ub * va, ub, vb * ua, vb * va, vb, ua, va, one], axis=-1
    )  # (H, 8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    e = Vt[..., 8, :]
    E = e.reshape(e.shape[:-1] + (3, 3))
    U, _, Vt2 = jnp.linalg.svd(E)
    # Keep det(U)=det(V)=+1 so the decomposition below yields rotations.
    d = jnp.linalg.det(U)
    U = U * jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)[..., None, :]
    d2 = jnp.linalg.det(Vt2)
    Vt2 = Vt2 * jnp.stack([jnp.ones_like(d2), jnp.ones_like(d2), d2], axis=-1)[..., :, None]
    S = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ S @ Vt2


def _sampson_sq(E: jnp.ndarray, xa: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance. E: (H, 3, 3); xa, xb: (N, 3). -> (H, N)."""
    Ex = jnp.einsum("hij,nj->hni", E, xa)
    Etx = jnp.einsum("hji,nj->hni", E, xb)
    xEx = jnp.einsum("ni,hni->hn", xb, Ex)
    denom = Ex[..., 0] ** 2 + Ex[..., 1] ** 2 + Etx[..., 0] ** 2 + Etx[..., 1] ** 2
    return xEx**2 / jnp.maximum(denom, 1e-12)


def _decompose_E(E: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E -> 4 candidate (R, t): (R1, t), (R1, -t), (R2, t), (R2, -t)."""
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U)
    U = U * jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)[..., None, :]
    d2 = jnp.linalg.det(Vt)
    Vt = Vt * jnp.stack([jnp.ones_like(d2), jnp.ones_like(d2), d2], axis=-1)[..., :, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    return Rs, ts


def _cheirality_depths(
    R: jnp.ndarray, t: jnp.ndarray, xa: jnp.ndarray, xb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint-style depths of bearings xa (in frame a) and xb for pose (R, t).

    x_b ~ R x_a + t. Solve per-correspondence 2x2 least squares for depths
    (za, zb) minimizing || za R xa + t - zb xb ||.
    """
    Rxa = jnp.einsum("ij,nj->ni", R, xa)
    # Least squares for [za, zb] in || [Rxa, -xb] [za, zb]^T + t ||^2.
    a11 = jnp.sum(Rxa * Rxa, axis=-1)
    a12 = -jnp.sum(Rxa * xb, axis=-1)
    a22 = jnp.sum(xb * xb, axis=-1)
    b1 = -jnp.sum(Rxa * t[None, :], axis=-1)
    b2 = jnp.sum(xb * t[None, :], axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    za = (b1 * a22 - a12 * b2) / det
    zb = (a11 * b2 - a12 * b1) / det
    return za, zb


def estimate_relative_pose(
    cam: Camera,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    num_hypotheses: int = 256,
    inlier_px: float = 1.0,
) -> TwoViewResult:
    """Essential-matrix RANSAC + cheirality pose recovery, fully batched.

    Args:
      uv_a, uv_b: (N, 2) matched pixels (frame a -> frame b).
      valid: (N,) bool mask (fixed-capacity padding).
      num_hypotheses: static hypothesis count (all solved batched).
      inlier_px: Sampson threshold in pixels.

    Returns pose of frame b relative to a: x_b = R x_a + t (|t| = 1, mono
    scale is unobservable).
    """
    N = uv_a.shape[0]
    xa = pixel_bearing(cam, uv_a)  # (N, 3) z=1
    xb = pixel_bearing(cam, uv_b)
    w = valid.astype(jnp.float32)

    # Sample 8-tuples ∝ validity (invalid entries get ~zero probability).
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(8,), replace=False, p=jax.nn.softmax(logits))
    )(keys)  # (H, 8)
    E = _essential_8pt(xa[idx][..., :2], xb[idx][..., :2])  # (H, 3, 3)

    # Score every hypothesis against every correspondence.
    # Sampson distance in normalized coords; convert pixel threshold.
    f = 0.5 * (cam.fx + cam.fy)
    thr = (inlier_px / f) ** 2
    d2 = _sampson_sq(E, xa, xb)  # (H, N)
    inlier_mat = (d2 < thr) & valid[None, :]
    scores = jnp.sum(inlier_mat, axis=-1)
    best = jnp.argmax(scores)
    E_best = E[best]
    inliers = inlier_mat[best]

    # Refit on inliers: weighted 8-point over all N (weights = inlier mask).
    def _weighted_refit(E0, weight):
        ua, va = xa[:, 0], xa[:, 1]
        ub, vb = xb[:, 0], xb[:, 1]
        A = jnp.stack(
            [ub * ua, ub * va, ub, vb * ua, vb * va, vb, ua, va, jnp.ones_like(ua)], axis=-1
        )
        Aw = A * weight[:, None]
        _, _, Vt = jnp.linalg.svd(Aw, full_matrices=True)
        e = Vt[8, :]
        Ef = e.reshape(3, 3)
        U, _, Vt2 = jnp.linalg.svd(Ef)
        U = U * jnp.stack([1.0, 1.0, jnp.linalg.det(U)])[None, :]  # scale 3rd column
        Vt2 = Vt2 * jnp.stack([1.0, 1.0, jnp.linalg.det(Vt2)])[:, None]  # 3rd row
        S = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=Ef.dtype))
        return U @ S @ Vt2

    E_best = _weighted_refit(E_best, inliers.astype(jnp.float32))
    d2r = _sampson_sq(E_best[None], xa, xb)[0]
    inliers = (d2r < thr) & valid

    # Pose recovery: 4 candidates, pick the one with most positive depths.
    Rs, ts = _decompose_E(E_best)

    def count_pos(Rt):
        R, t = Rt
        za, zb = _cheirality_depths(R, t, xa, xb)
        return jnp.sum((za > 0) & (zb > 0) & inliers)

    votes = jax.vmap(count_pos)((Rs, ts))
    k = jnp.argmax(votes)
    return TwoViewResult(
        R=Rs[k], t=ts[k], inliers=inliers, num_inliers=jnp.sum(inliers), E=E_best
    )
