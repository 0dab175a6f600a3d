"""Umeyama closed-form alignment (SE(3) or Sim(3)) between point sets.

Used by the ATE evaluator (BASELINE.json:2 — judged metric), loop-closure
relative-pose estimation, and multi-session map alignment. Supports a weight
mask so fixed-capacity (padded) arrays align on valid entries only.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def umeyama_alignment(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve min_{s, R, t} sum_i w_i || dst_i - (s R src_i + t) ||^2.

    Args:
      src, dst: (N, 3) corresponding points.
      weights: optional (N,) non-negative weights (e.g. validity mask).
      with_scale: if True solve Sim(3) (monocular eval), else SE(3).

    Returns: (s, R, t) with s scalar, R (3, 3), t (3,).
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.einsum("n,ni->i", w, src)
    mu_d = jnp.einsum("n,ni->i", w, dst)
    xs = src - mu_s
    xd = dst - mu_d
    cov = jnp.einsum("n,ni,nj->ij", w, xd, xs)
    # 3x3 SVD via eigh of cov^T cov (TPU: batched/vmapped jnp.linalg.svd
    # lowers to a scalar-serial kernel — loop verification runs 1280 of
    # these per keyframe; eigh is ~200x faster at these shapes).
    # eigh returns ASCENDING eigenvalues: index 0 = smallest singular value.
    # Minimal 3-point fits are rank 2 by construction (centered points span
    # a plane), so U's smallest column is completed by a cross product —
    # the det-correction term absorbs the arbitrary sign (Umeyama's R is
    # invariant to it).
    CtC = cov.T @ cov
    ew, V = jnp.linalg.eigh(CtC)
    sig = jnp.sqrt(jnp.maximum(ew, 0.0))
    u2 = cov @ V[:, 2] / jnp.maximum(sig[2], 1e-12)
    u1r = cov @ V[:, 1]
    u1r = u1r - jnp.dot(u1r, u2) * u2
    u1 = u1r / jnp.maximum(jnp.linalg.norm(u1r), 1e-12)
    u0 = jnp.cross(u1, u2)  # det(U) = +1 by construction
    U = jnp.stack([u0, u1, u2], axis=-1)
    detV = jnp.linalg.det(V)
    d0 = jnp.where(detV < 0, -1.0, 1.0)  # = det(U) det(V), det(U) = +1
    Dv = jnp.stack([d0, jnp.ones_like(d0), jnp.ones_like(d0)])
    R = jnp.einsum("ij,j,kj->ik", U, Dv, V)
    var_s = jnp.einsum("n,ni->", w, xs * xs)
    if with_scale:
        s = jnp.sum(sig * Dv) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.asarray(1.0, dtype=src.dtype)
    t = mu_d - s * R @ mu_s
    return s, R, t
