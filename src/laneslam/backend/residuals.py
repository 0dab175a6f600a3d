"""Reprojection residuals + Jacobians for point and line observations.

SURVEY.md C8 / arXiv:1711.08654 §III-C:
  point residual (2,): pi(T_cw X) - uv
  line residual  (2,): normalized distances of both observed segment
                       endpoints to the projected infinite line
                       l = K_L n_c,  L_c = G(T_cw) L_w.

Update conventions (must match the retractions used by the solver):
  pose:  T_cw <- exp(xi) @ T_cw          (left-multiplicative, xi in R^6)
  point: X <- X + dX                      (Euclidean, dX in R^3)
  line:  L_w <- orthonormal retract       (4-dof delta)

Jacobians are produced by `jax.jacfwd` of the residual as a function of the
*increments at zero* — exactly the GN linearization point — vmapped over the
observation batch. XLA fuses the whole linearization into the GN step; a
hand-fused Pallas version is the kernels-layer optimization.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from laneslam.geometry import se3
from laneslam.geometry.camera import Camera, project_line, project_points
from laneslam.geometry.lines import plucker_retract, plucker_transform


def point_residual(T_cw: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray, cam: Camera):
    """r (2,), plus depth for cheirality masking."""
    Xc = se3.transform_points(T_cw, X)
    pix, z = project_points(cam, Xc)
    return pix - uv, z


def line_residual(T_cw: jnp.ndarray, L_w: jnp.ndarray, seg: jnp.ndarray, cam: Camera):
    """r (2,): endpoint distances to the projected line. seg = [x1,y1,x2,y2]."""
    L_c = plucker_transform(T_cw, L_w)
    l = project_line(cam, L_c)
    norm = jnp.sqrt(l[0] ** 2 + l[1] ** 2)
    inv = 1.0 / jnp.maximum(norm, 1e-9)
    e1 = seg[:2]
    e2 = seg[2:]
    d1 = (l[0] * e1[0] + l[1] * e1[1] + l[2]) * inv
    d2 = (l[0] * e2[0] + l[1] * e2[1] + l[2]) * inv
    return jnp.stack([d1, d2])


def point_obs_linearize(
    T_cw: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray, cam: Camera
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One point observation -> (r (2,), J_pose (2,6), J_point (2,3), depth)."""

    def f(xi, dX):
        r, _ = point_residual(se3.retract(T_cw, xi), X + dX, uv, cam)
        return r

    z6 = jnp.zeros(6, T_cw.dtype)
    z3 = jnp.zeros(3, T_cw.dtype)
    r, z = point_residual(T_cw, X, uv, cam)
    Jp, Jx = jax.jacfwd(f, argnums=(0, 1))(z6, z3)
    return r, Jp, Jx, z


def line_obs_linearize(
    T_cw: jnp.ndarray, L_w: jnp.ndarray, seg: jnp.ndarray, cam: Camera
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One line observation -> (r (2,), J_pose (2,6), J_line (2,4))."""

    def f(xi, dl):
        return line_residual(se3.retract(T_cw, xi), plucker_retract(L_w, dl), seg, cam)

    z6 = jnp.zeros(6, T_cw.dtype)
    z4 = jnp.zeros(4, T_cw.dtype)
    r = line_residual(T_cw, L_w, seg, cam)
    Jp, Jl = jax.jacfwd(f, argnums=(0, 1))(z6, z4)
    return r, Jp, Jl


def huber_weight(r: jnp.ndarray, k: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel on the residual 2-norm."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.minimum(1.0, k / jnp.maximum(n, 1e-12))
