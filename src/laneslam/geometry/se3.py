"""SE(3) operations on homogeneous (..., 4, 4) matrices.

Convention: a pose ``T_wc`` maps camera-frame coordinates to world
coordinates (``X_w = T_wc @ X_c``); the trajectory is a stack of ``T_wc``.
Projection uses ``T_cw = inv(T_wc)``.

Twists are (..., 6) arrays ordered ``[rho (translation), phi (rotation)]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from laneslam.geometry import so3


def make(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from R (..., 3, 3) and t (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def identity(batch: tuple = (), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse using the rotation transpose (no linear solve)."""
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (..., 6) [rho, phi] -> SE(3) matrix (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3.exp(phi)
    V = so3.left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) (..., 4, 4) -> twist (..., 6) [rho, phi]."""
    phi = so3.log(rotation(T))
    V = so3.left_jacobian(phi)
    rho = jnp.linalg.solve(V, translation(T)[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def transform_points(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = rotation(T)
    t = translation(T)
    if X.ndim == R.ndim:  # (..., N, 3) with T (..., 4, 4): extra points axis
        return jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, X) + t


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: exp(xi) @ T (the BA update rule)."""
    return exp(xi) @ T


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """Adjoint (..., 6, 6) mapping twists between frames: Ad_T xi."""
    R = rotation(T)
    t = translation(T)
    batch = R.shape[:-2]
    A = jnp.zeros(batch + (6, 6), dtype=T.dtype)
    A = A.at[..., :3, :3].set(R)
    A = A.at[..., 3:, 3:].set(R)
    A = A.at[..., :3, 3:].set(so3.hat(t) @ R)
    return A
