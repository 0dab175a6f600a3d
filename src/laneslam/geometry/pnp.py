"""Batched PnP RANSAC: camera pose from 2D-3D correspondences.

SURVEY.md C5 (tracking against the map). TPU-native reformulation of the
reference family's `cv2.solvePnPRansac`: a fixed count of 6-point DLT
hypotheses solved with one batched SVD, scored densely, then Gauss-Newton
refinement on inlier-weighted reprojection error — all inside one jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from laneslam.geometry import se3, so3
from laneslam.geometry.camera import Camera, project_points


class PnPResult(NamedTuple):
    T_cw: jnp.ndarray  # (4, 4) world->camera pose
    inliers: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # scalar int32


def _dlt_p6p(X_in: jnp.ndarray, uvn: jnp.ndarray) -> jnp.ndarray:
    """Batched DLT from 6 correspondences in *normalized* image coords.

    Args: X_in: (H, 6, 3) world points, uvn: (H, 6, 2) normalized coords.
    Returns T_cw: (H, 4, 4) with R projected onto SO(3).

    Hartley-normalizes the 3D points per hypothesis (centroid + isotropic
    scale) — without it the 12x12 SVD in float32 is noise-fragile when
    point depths span an order of magnitude (corridor scenes).
    """
    c = jnp.mean(X_in, axis=-2, keepdims=True)  # (H, 1, 3)
    s = jnp.maximum(
        jnp.mean(jnp.linalg.norm(X_in - c, axis=-1), axis=-1), 1e-6
    )  # (H,)
    X = (X_in - c) / s[..., None, None]
    x, y = uvn[..., 0], uvn[..., 1]
    Xh = jnp.concatenate([X, jnp.ones(X.shape[:-1] + (1,), X.dtype)], axis=-1)  # (H,6,4)
    z = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, z, -x[..., None] * Xh], axis=-1)  # (H,6,12)
    r2 = jnp.concatenate([z, Xh, -y[..., None] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (H,12,12)
    # Nullvector = eigenvector of A^T A with the smallest eigenvalue.
    # jnp.linalg.svd on batched 12x12 lowers to a scalar-serial TPU kernel
    # (measured 8.9 ms for 256 hypotheses — it dominated the whole tracking
    # step); batched eigh is ~0.05 ms for the same shapes.
    AtA = jnp.einsum("...ka,...kb->...ab", A, A)
    _, V = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    p = V[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    # Fix sign so points end up in front: use first point's depth.
    depth0 = jnp.einsum("...j,...j->...", P[..., 2, :], Xh[..., 0, :])
    P = P * jnp.where(depth0 < 0, -1.0, 1.0)[..., None, None]
    M = P[..., :3]
    # Orthonormalize (polar factor) via eigh of M^T M: M = U Sig V^T =>
    # M^T M = V Sig^2 V^T, U = M V Sig^-1, R = U V^T (with det fix).
    MtM = jnp.einsum("...ka,...kb->...ab", M, M)
    w2, Vm = jnp.linalg.eigh(MtM)
    sig = jnp.sqrt(jnp.maximum(w2, 1e-20))
    U = jnp.einsum("...ij,...jk->...ik", M, Vm) / sig[..., None, :]
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik", U, Vm))
    # Flip the SMALLEST singular direction (eigh sorts ascending: column 0).
    Dk = jnp.concatenate(
        [det[..., None], jnp.ones(det.shape + (2,), det.dtype)], axis=-1
    )
    R = jnp.einsum("...ij,...j,...kj->...ik", U, Dk, Vm)
    scale = jnp.mean(sig, axis=-1)
    t_n = P[..., 3] / jnp.maximum(scale, 1e-12)[..., None]
    # Undo the Hartley normalization: X = s X' + c  =>  t = s t' - R c.
    Rc = jnp.einsum("...ij,...j->...i", R, c[..., 0, :])
    t = s[..., None] * t_n - Rc
    return se3.make(R, t)


def _reproj_err_sq(cam: Camera, T_cw: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Squared pixel reprojection error. T_cw: (H, 4, 4) or (4, 4)."""
    Xc = se3.transform_points(T_cw[..., None, :, :] if T_cw.ndim == 3 else T_cw, X)
    pix, z = project_points(cam, Xc)
    err = jnp.sum((pix - uv) ** 2, axis=-1)
    return jnp.where(z > 1e-4, err, jnp.inf)


def _gn_refine(
    cam: Camera,
    T_cw: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,
    iters: int = 8,
) -> jnp.ndarray:
    """Gauss-Newton on se(3) for weighted reprojection error (fixed iters)."""

    def residual(xi, T):
        T2 = se3.retract(T, xi)
        Xc = se3.transform_points(T2, X)
        pix, _ = project_points(cam, Xc)
        return ((pix - uv) * w[:, None]).reshape(-1)

    def step(T, _):
        xi0 = jnp.zeros(6, dtype=T.dtype)
        J = jax.jacfwd(residual)(xi0, T)  # (2N, 6)
        r = residual(xi0, T)
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=T.dtype)
        g = J.T @ r
        dx = -jnp.linalg.solve(H, g)
        return se3.retract(T, dx), None

    T_out, _ = jax.lax.scan(step, T_cw, None, length=iters)
    return T_out


def solve_pnp_ransac(
    cam: Camera,
    X_w: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    num_hypotheses: int = 128,
    inlier_px: float = 3.0,
) -> PnPResult:
    """Pose of the camera seeing world points X_w at pixels uv.

    Args:
      X_w: (N, 3); uv: (N, 2); valid: (N,) mask over fixed capacity.
    Returns T_cw (world->camera).
    """
    N = X_w.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(6,), replace=False, p=jax.nn.softmax(logits))
    )(keys)
    uvn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    T_h = _dlt_p6p(X_w[idx], uvn[idx])  # (H, 4, 4)
    err = _reproj_err_sq(cam, T_h, X_w, uv)  # (H, N)
    # Generous selection threshold: minimal-solver hypotheses are noisy; the
    # GN refinement + final re-gate below recovers the tight inlier set.
    inlier_mat = (err < (2.0 * inlier_px) ** 2) & valid[None, :]
    scores = jnp.sum(inlier_mat, axis=-1)
    best = jnp.argmax(scores)
    T_best = T_h[best]
    inliers = inlier_mat[best]
    T_ref = _gn_refine(cam, T_best, X_w, uv, inliers.astype(jnp.float32))
    err_r = _reproj_err_sq(cam, T_ref, X_w, uv)
    inliers = (err_r < inlier_px**2) & valid
    T_ref = _gn_refine(cam, T_ref, X_w, uv, inliers.astype(jnp.float32), iters=4)
    return PnPResult(T_cw=T_ref, inliers=inliers, num_inliers=jnp.sum(inliers))
