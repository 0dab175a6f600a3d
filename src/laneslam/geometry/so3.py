"""SO(3) operations: hat/vee, exp/log, batched over leading dims.

Numerically-guarded small-angle branches use Taylor expansions selected with
``jnp.where`` (no data-dependent control flow — jit/TPU safe).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x for w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor guards.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Valid for rotation angle < pi (SLAM increments are always small). The
    angle comes from atan2(|skew|/2, (tr-1)/2) — NOT arccos — so the map is
    differentiable at the identity (jacfwd through arccos(1) yields NaN,
    which poisoned zero-weight padded pose-graph edges).
    """
    w = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w * w, axis=-1) + _EPS * _EPS)
    theta = jnp.arctan2(sin_t, cos_t)
    # theta / (2 sin(theta)) with Taylor guard around 0.
    small = theta * theta < 1e-8
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_t, _EPS),
    )
    return factor[..., None] * w


def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): integrates exp along the geodesic.

    J_l = I + (1-cos t)/t^2 [w]x + (t - sin t)/t^3 [w]x^2
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + b[..., None, None] * W + c[..., None, None] * (W @ W)


def normalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation matrix back onto SO(3) via SVD."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape).at[..., 2, 2].multiply(0.0)
    D = D + jnp.zeros_like(D).at[..., 2, 2].set(det)
    return U @ D @ Vt
