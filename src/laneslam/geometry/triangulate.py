"""Batched triangulation of points (DLT) and lines (plane-plane meet).

SURVEY.md C6. Everything is batched over landmarks so the whole window
triangulates as one XLA program (batched solves on the MXU).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from laneslam.geometry import se3
from laneslam.geometry.camera import Camera, pixel_bearing
from laneslam.geometry.lines import plucker_from_planes, plucker_normalize


def triangulate_points_dlt(
    cam: Camera,
    T_wc_a: jnp.ndarray,
    T_wc_b: jnp.ndarray,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-view midpoint-free DLT triangulation.

    Args:
      T_wc_a/b: (4, 4) or (N, 4, 4) camera-to-world poses.
      uv_a/b: (N, 2) pixel observations.

    Returns:
      X_w: (N, 3) world points; valid: (N,) bool (positive depth in both views
      and finite solve).
    """
    T_cw_a = se3.inverse(T_wc_a)
    T_cw_b = se3.inverse(T_wc_b)
    K = cam.K()
    P_a = jnp.einsum("ij,...jk->...ik", K, T_cw_a[..., :3, :])  # (..., 3, 4)
    P_b = jnp.einsum("ij,...jk->...ik", K, T_cw_b[..., :3, :])
    P_a = jnp.broadcast_to(P_a, uv_a.shape[:-1] + (3, 4))
    P_b = jnp.broadcast_to(P_b, uv_b.shape[:-1] + (3, 4))

    def rows(P, uv):
        r1 = uv[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r2 = uv[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r1, r2

    a1, a2 = rows(P_a, uv_a)
    b1, b2 = rows(P_b, uv_b)
    A = jnp.stack([a1, a2, b1, b2], axis=-2)  # (N, 4, 4)
    # Smallest right singular vector of A == eigenvector of A^T A with the
    # smallest eigenvalue. jnp.linalg.svd on (N, 4, 4) lowers to a
    # scalar-unit-serial kernel on TPU (measured: it dominated the fused
    # keyframe branch); instead run inverse-power iteration with the
    # CLOSED-FORM symmetric 4x4 inverse (kernels/schur.py) — pure batched
    # arithmetic, VPU-friendly. Rows are normalized first (doesn't change
    # the nullspace, conditions A^T A for float32).
    from laneslam.kernels.schur import inv_sym_batched

    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("...ka,...kb->...ab", A, A)
    eps = 1e-6 * jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] + 1e-12
    Minv = inv_sym_batched(AtA + eps * jnp.eye(4, dtype=A.dtype))
    x = jnp.ones(A.shape[:-2] + (4,), A.dtype)
    for _ in range(8):
        x = jnp.einsum("...ab,...b->...a", Minv, x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-20)
    Xh = x
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]
    # Cheirality: positive depth in both cameras.
    za = se3.transform_points(T_cw_a, X)[..., 2]
    zb = se3.transform_points(T_cw_b, X)[..., 2]
    valid = (za > 1e-4) & (zb > 1e-4) & jnp.all(jnp.isfinite(X), axis=-1)
    return X, valid


def parallax_deg(T_wc_a: jnp.ndarray, T_wc_b: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Triangulation angle (deg) subtended at X by the two camera centers."""
    ca = T_wc_a[..., :3, 3]
    cb = T_wc_b[..., :3, 3]
    d1 = X - ca
    d2 = X - cb
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-12)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.clip(jnp.sum(d1 * d2, axis=-1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cosang))


def backprojection_plane(
    cam: Camera, T_wc: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """World plane (..., 4) through the camera center and an observed segment.

    The plane contains the optical center and the two endpoint bearings.
    """
    d1 = pixel_bearing(cam, uv1)
    d2 = pixel_bearing(cam, uv2)
    n_c = jnp.cross(d1, d2)  # plane normal in camera frame (passes through origin)
    R = T_wc[..., :3, :3]
    t = T_wc[..., :3, 3]
    n_w = jnp.einsum("...ij,...j->...i", R, n_c)
    d = -jnp.sum(n_w * t, axis=-1)
    return jnp.concatenate([n_w, d[..., None]], axis=-1)


def triangulate_lines(
    cam: Camera,
    T_wc_a: jnp.ndarray,
    T_wc_b: jnp.ndarray,
    seg_a: jnp.ndarray,
    seg_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-view line triangulation as the meet of two back-projection planes.

    Args:
      seg_a/b: (N, 4) segments [x1, y1, x2, y2] in each view.

    Returns: (N, 6) world Plücker lines (unit direction), (N,) validity
    (planes not near-parallel => well-conditioned meet).
    """
    pa = backprojection_plane(cam, T_wc_a, seg_a[..., :2], seg_a[..., 2:])
    pb = backprojection_plane(cam, T_wc_b, seg_b[..., :2], seg_b[..., 2:])
    L = plucker_from_planes(pa, pb)
    v = L[..., 3:]
    na = pa[..., :3] / jnp.maximum(jnp.linalg.norm(pa[..., :3], axis=-1, keepdims=True), 1e-12)
    nb = pb[..., :3] / jnp.maximum(jnp.linalg.norm(pb[..., :3], axis=-1, keepdims=True), 1e-12)
    # Degenerate when the planes are near-parallel (baseline along the line).
    sin_angle = jnp.linalg.norm(jnp.cross(na, nb), axis=-1)
    valid = (sin_angle > 1e-3) & (jnp.linalg.norm(v, axis=-1) > 1e-9)
    return plucker_normalize(L), valid
