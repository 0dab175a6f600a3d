"""Radial-tangential undistortion + stereo rectification of FEATURE
coordinates (SURVEY.md C16/C17; config 4 real-EuRoC readiness).

TPU-native design decision: the images are never warped. Features are
detected on the RAW frames; only their pixel coordinates are mapped into an
ideal rectified pinhole model (undistort -> rotate -> reproject). That is a
few hundred 2-vectors per frame — negligible next to an image warp, exactly
the work the MXU/VPU wants, and it keeps the LSD/LBD kernels operating on
untouched input data. (Descriptors are computed on the raw image; the local
appearance distortion across a patch is sub-pixel for EuRoC's lenses.)

Pipeline per camera:
  uv_raw --K^-1--> normalized --iterative radtan inverse--> ideal ray
         --R_rect--> rectified ray --K_new--> uv_rect

After this, both cameras are exact pinholes with identical K_new, row-
aligned epipolar lines, and baseline along +x: the rectified-stereo row
gate in frontend/stereo.py is valid on real (unrectified) datasets.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class RectifyParams(NamedTuple):
    """Static per-camera rectification bundle (pytree of small arrays)."""

    K: jnp.ndarray  # (3, 3) raw intrinsics
    dist: jnp.ndarray  # (4,) radial-tangential [k1, k2, p1, p2]
    R_rect: jnp.ndarray  # (3, 3) raw-camera -> rectified-camera rotation
    K_new: jnp.ndarray  # (3, 3) rectified intrinsics (shared across the pair)


def radtan_distort(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply [k1,k2,p1,p2] to normalized coords (..., 2) (forward model)."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(xy_d: jnp.ndarray, dist: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Invert the radtan model by fixed-point iteration (jit-friendly,
    fixed trip count; converges in <5 iters for EuRoC-magnitude coeffs)."""
    xy = xy_d
    for _ in range(iters):
        delta = radtan_distort(xy, dist) - xy
        xy = xy_d - delta
    return xy


def rectify_uv(uv: jnp.ndarray, p: RectifyParams) -> jnp.ndarray:
    """Map raw distorted pixels (..., 2) to rectified pinhole pixels."""
    fx, fy = p.K[0, 0], p.K[1, 1]
    cx, cy = p.K[0, 2], p.K[1, 2]
    xy_d = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    xy = radtan_undistort(xy_d, p.dist)
    ray = jnp.stack([xy[..., 0], xy[..., 1], jnp.ones_like(xy[..., 0])], axis=-1)
    ray_r = jnp.einsum("ij,...j->...i", p.R_rect, ray)
    z = jnp.where(jnp.abs(ray_r[..., 2]) < 1e-9, 1e-9, ray_r[..., 2])
    u = p.K_new[0, 0] * ray_r[..., 0] / z + p.K_new[0, 2]
    v = p.K_new[1, 1] * ray_r[..., 1] / z + p.K_new[1, 2]
    return jnp.stack([u, v], axis=-1)


def rectify_segments(xyxy: jnp.ndarray, p: RectifyParams) -> jnp.ndarray:
    """Rectify segment endpoint pairs (..., 4)."""
    e1 = rectify_uv(xyxy[..., :2], p)
    e2 = rectify_uv(xyxy[..., 2:], p)
    return jnp.concatenate([e1, e2], axis=-1)


def stereo_rectify(
    K0: np.ndarray, d0: np.ndarray, K1: np.ndarray, d1: np.ndarray,
    T_c1_c0: np.ndarray, width: int, height: int,
) -> Tuple[RectifyParams, RectifyParams, float]:
    """Bouguet-style rectification from the calibrated pair (host/numpy).

    T_c1_c0: maps cam0 coords into cam1 (x1 = R x0 + t). Returns
    (params_cam0, params_cam1, baseline) with a shared K_new whose image
    plane is perpendicular to the mean optical axis and whose x-axis is the
    baseline direction — afterwards matching rows correspond.
    """
    R = T_c1_c0[:3, :3]
    t = T_c1_c0[:3, 3]
    # Rectified axes expressed in cam0 coordinates:
    #   x = baseline direction (cam0 -> cam1 center) => disparity positive,
    #   z = mean optical axis projected orthogonal to x,
    #   y = z cross x.
    c1_in_c0 = -R.T @ t  # cam1 center in cam0 frame
    # (No sign flip: +x MUST point at cam1 so that disparity u0-u1 = f*b/Z
    # stays positive, matching frontend/stereo.py's gate.)
    e1 = c1_in_c0 / max(np.linalg.norm(c1_in_c0), 1e-12)
    z_mean = np.array([0.0, 0.0, 1.0]) + R.T @ np.array([0.0, 0.0, 1.0])
    e2 = np.cross(z_mean, e1)
    e2 = e2 / max(np.linalg.norm(e2), 1e-12)
    e3 = np.cross(e1, e2)
    R_rect0 = np.stack([e1, e2, e3], axis=0)  # rows = rectified axes in cam0
    # For rays at infinity d1 = R d0; rectified coords must agree:
    # R_rect1 (R d0) = R_rect0 d0  =>  R_rect1 = R_rect0 R^T.
    R_rect1 = R_rect0 @ R.T

    # Shared rectified intrinsics: mean focal, principal point at center.
    f_new = 0.5 * (K0[0, 0] + K1[0, 0])
    K_new = np.array(
        [[f_new, 0, width / 2.0], [0, f_new, height / 2.0], [0, 0, 1.0]]
    )
    baseline = float(np.linalg.norm(t))
    p0 = RectifyParams(
        K=jnp.asarray(K0, jnp.float32), dist=jnp.asarray(d0, jnp.float32),
        R_rect=jnp.asarray(R_rect0, jnp.float32), K_new=jnp.asarray(K_new, jnp.float32),
    )
    p1 = RectifyParams(
        K=jnp.asarray(K1, jnp.float32), dist=jnp.asarray(d1, jnp.float32),
        R_rect=jnp.asarray(R_rect1, jnp.float32), K_new=jnp.asarray(K_new, jnp.float32),
    )
    return p0, p1, baseline
