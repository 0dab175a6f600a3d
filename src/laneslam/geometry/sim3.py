"""Sim(3) operations for mono scale-drift correction (SURVEY.md §7.3.5).

A Sim(3) element is stored as ``(T, s)``: ``T`` a (..., 4, 4) SE(3)-shaped
matrix holding the ROTATION and translation, plus a separate (...,) scalar
scale ``s``. The action on points is ``X' = s * R @ X + t``. Keeping scale
out of the matrix avoids re-orthonormalization churn and lets every SE(3)
helper (inverse of R, etc.) apply unchanged.

Tangent vectors are (..., 7) ordered ``[rho (3), phi (3), sigma (1)]``
(translation, rotation, log-scale) — the ordering used by ORB-SLAM-style
Sim(3) pose-graph optimization, which is the consumer of this module
(backend/pgo.py pgo_solve_sim3): mono odometry chains accumulate scale
drift that SE(3) edges cannot express; Sim(3) nodes let the optimizer
distribute the loop's observed scale error smoothly along the chain.

Closed forms follow Strasdat's "Scale Drift-Aware Large Scale Monocular
SLAM" (RSS 2010) appendix; the W matrix generalizes SO(3)'s left Jacobian
with scale terms.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from laneslam.geometry import se3, so3

Sim3 = Tuple[jnp.ndarray, jnp.ndarray]  # ((..., 4, 4) R|t, (...,) scale)


def identity(batch: tuple = (), dtype=jnp.float32) -> Sim3:
    return se3.identity(batch, dtype), jnp.ones(batch, dtype)


def from_se3(T: jnp.ndarray, s=None) -> Sim3:
    sc = jnp.ones(T.shape[:-2], T.dtype) if s is None else jnp.asarray(s)
    return T, sc


def inverse(S: Sim3) -> Sim3:
    """(s R, t)^-1 = (s^-1 R^T, -s^-1 R^T t)."""
    T, s = S
    R = se3.rotation(T)
    t = se3.translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    t_inv = -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return se3.make(Rt, t_inv), inv_s


def compose(A: Sim3, B: Sim3) -> Sim3:
    """A then B applied to camera-frame coords: (A @ B)(X) = A(B(X))."""
    Ta, sa = A
    Tb, sb = B
    Ra, ta = se3.rotation(Ta), se3.translation(Ta)
    Rb, tb = se3.rotation(Tb), se3.translation(Tb)
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return se3.make(R, t), sa * sb


def transform_points(S: Sim3, X: jnp.ndarray) -> jnp.ndarray:
    T, s = S
    R = se3.rotation(T)
    t = se3.translation(T)
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


def _W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'left Jacobian' W(phi, sigma): t = W @ rho in exp.

    W = A I + B Phi + C Phi^2 with the Strasdat closed-form coefficients;
    small-angle/small-scale branches via jnp.where keep it jit-safe and
    autodiff-safe (jacfwd through both branches is finite).
    """
    dtype = phi.dtype
    theta = jnp.linalg.norm(phi, axis=-1)
    eps = jnp.asarray(1e-6, dtype)
    small_s = jnp.abs(sigma) < eps
    small_t = theta < eps
    s_safe = jnp.where(small_s, 1.0, sigma)
    t_safe = jnp.where(small_t, 1.0, theta)
    es = jnp.exp(sigma)

    # A = (es - 1) / sigma  (-> 1 as sigma -> 0)
    A = jnp.where(small_s, 1.0 + sigma / 2.0, (es - 1.0) / s_safe)

    t2 = t_safe * t_safe
    s2 = s_safe * s_safe
    denom = s2 + t2
    cos_t = jnp.cos(t_safe)
    sin_t = jnp.sin(t_safe)
    # B = (sigma*(es*sin - ... )) closed form; limits:
    #   sigma->0: (1 - cos)/theta^2 ;  theta->0: (es(s-1)+1)/s^2 ... use
    # nested where over the four regimes.
    B_gen = (es * sin_t * s_safe + (1.0 - es * cos_t) * t_safe) / (
        t_safe * denom
    )
    B_s0 = (1.0 - cos_t) / t2
    B_t0 = ((s_safe - 1.0) * es + 1.0) / s2
    B_00 = jnp.full_like(t_safe, 0.5)
    B = jnp.where(
        small_s & small_t, B_00,
        jnp.where(small_s, B_s0, jnp.where(small_t, B_t0, B_gen)),
    )

    # C = (A - B_rot_part)/theta^2 with limits; general:
    # C = ( (es - 1)/sigma - ((es*cos - 1)*sigma + es*sin*theta)/denom ) / t2
    C_gen = (A - ((es * cos_t - 1.0) * s_safe + es * sin_t * t_safe) / denom) / t2
    C_s0 = (t_safe - sin_t) / (t2 * t_safe)
    C_t0 = (es * (0.5 * s2 - s_safe + 1.0) - 1.0) / (s2 * s_safe)
    C_00 = jnp.full_like(t_safe, 1.0 / 6.0)
    C = jnp.where(
        small_s & small_t, C_00,
        jnp.where(small_s, C_s0, jnp.where(small_t, C_t0, C_gen)),
    )

    Phi = so3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Phi.shape)
    return (
        A[..., None, None] * eye
        + B[..., None, None] * Phi
        + C[..., None, None] * (Phi @ Phi)
    )


def exp(xi: jnp.ndarray) -> Sim3:
    """sim(3) tangent (..., 7) [rho, phi, sigma] -> Sim(3)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3.exp(phi)
    t = jnp.einsum("...ij,...j->...i", _W(phi, sigma), rho)
    return se3.make(R, t), jnp.exp(sigma)


def log(S: Sim3) -> jnp.ndarray:
    """Sim(3) -> tangent (..., 7). Inverse of exp (W is invertible for
    |sigma|, theta in the convergence region; solved densely, 3x3)."""
    T, s = S
    phi = so3.log(se3.rotation(T))
    sigma = jnp.log(s)
    W = _W(phi, sigma)
    rho = jnp.linalg.solve(W, se3.translation(T)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def retract(S: Sim3, xi: jnp.ndarray) -> Sim3:
    """Right-multiplicative update S <- S o exp(xi), matching se3.retract."""
    return compose(S, exp(xi))
