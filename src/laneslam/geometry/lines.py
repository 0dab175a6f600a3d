"""3D line representations: Plücker coordinates + orthonormal 4-dof rep.

Plücker line L = (n, v): ``v`` is the (unnormalised) direction, ``n = p x v``
the moment for any point ``p`` on the line. Valid lines satisfy n.v = 0.

The orthonormal representation (Bartoli & Sturm; used throughout the PL-SLAM
family, e.g. arXiv:1711.08654 §III) factors (n|v) = U diag(w1, w2) with
U in SO(3), (w1, w2) on the unit circle (SO(2)): a minimal 4-dof
parametrization whose retraction is two rotations — exactly what batched GN
on TPU wants (fixed-size dense updates, no constraints to re-project).

Capability contract: BASELINE.json:5 ("point+line bundle adjustment").
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from laneslam.geometry import so3


def plucker_from_endpoints(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Two 3D points (..., 3) -> Plücker (..., 6) = [n, v]."""
    v = p2 - p1
    n = jnp.cross(p1, p2)  # = p1 x v (since p1 x p1 = 0)
    return jnp.concatenate([n, v], axis=-1)


def plucker_from_planes(pi1: jnp.ndarray, pi2: jnp.ndarray) -> jnp.ndarray:
    """Meet of two planes (..., 4) -> Plücker (..., 6) = [n, v].

    For planes pi = [a, b, c, d] (normal n_i, offset d_i; n_i.x + d_i = 0),
    the intersection has direction v = n1 x n2; the point on the line
    p0 = (-d1 (n2 x v) - d2 (v x n1)) / |v|^2 gives the moment n = p0 x v,
    consistent with the endpoint convention n = p x v.
    """
    n1, d1 = pi1[..., :3], pi1[..., 3:]
    n2, d2 = pi2[..., :3], pi2[..., 3:]
    v = jnp.cross(n1, n2)
    vv = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-12)
    p0 = (-d1 * jnp.cross(n2, v) - d2 * jnp.cross(v, n1)) / vv
    n = jnp.cross(p0, v)
    return jnp.concatenate([n, v], axis=-1)


def plucker_normalize(L: jnp.ndarray) -> jnp.ndarray:
    """Scale so the direction part has unit norm."""
    v = L[..., 3:]
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return L / jnp.maximum(s, 1e-12)


def plucker_transform(T: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Transform Plücker line by SE(3) T (maps frame a -> frame b).

    [n_b; v_b] = [[R, [t]x R], [0, R]] @ [n_a; v_a]
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n, v = L[..., :3], L[..., 3:]
    Rv = jnp.einsum("...ij,...j->...i", R, v)
    Rn = jnp.einsum("...ij,...j->...i", R, n)
    nb = Rn + jnp.cross(t, Rv)
    return jnp.concatenate([nb, Rv], axis=-1)


def closest_point_to_origin(L: jnp.ndarray) -> jnp.ndarray:
    """Point on the line closest to the origin: (v x n) / |v|^2."""
    n, v = L[..., :3], L[..., 3:]
    return jnp.cross(v, n) / jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-12)


# --- Orthonormal representation -------------------------------------------------


def orthonormal_from_plucker(L: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plücker (..., 6) -> (U (..., 3, 3) in SO(3), w (..., 2) on S^1).

    U's columns are [n/|n|, v/|v|, (n x v)/|n x v|]; w = (|n|, |v|)/|(n,v)|.
    """
    n, v = L[..., :3], L[..., 3:]
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    u1 = n / jnp.maximum(nn, 1e-12)
    u2 = v / jnp.maximum(nv, 1e-12)
    u3 = jnp.cross(u1, u2)
    u3 = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True), 1e-12)
    U = jnp.stack([u1, u2, u3], axis=-1)
    w = jnp.concatenate([nn, nv], axis=-1)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
    return U, w


def plucker_from_orthonormal(U: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(U, w) -> Plücker (..., 6), scaled so |(n, v)| = 1 overall.

    n = w1 * u1, v = w2 * u2. (The global scale of a Plücker line is
    unobservable; this fixes it to the unit sphere in R^6.)
    """
    n = w[..., 0:1] * U[..., :, 0]
    v = w[..., 1:2] * U[..., :, 1]
    return jnp.concatenate([n, v], axis=-1)


def orthonormal_retract(
    U: jnp.ndarray, w: jnp.ndarray, delta: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimal 4-dof update: delta = (..., 4) = [theta (3), phi (1)].

    U <- U @ exp_SO3([theta]x);  w <- Rot(phi) @ w.
    """
    theta = delta[..., :3]
    phi = delta[..., 3]
    U_new = U @ so3.exp(theta)
    c, s = jnp.cos(phi), jnp.sin(phi)
    w1 = c * w[..., 0] - s * w[..., 1]
    w2 = s * w[..., 0] + c * w[..., 1]
    return U_new, jnp.stack([w1, w2], axis=-1)


def plucker_retract(L: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Retract a Plücker line by a 4-dof orthonormal update (fused helper)."""
    U, w = orthonormal_from_plucker(L)
    U, w = orthonormal_retract(U, w, delta)
    return plucker_from_orthonormal(U, w)
