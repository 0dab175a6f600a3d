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
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.einsum("n,ni->", w, xs * xs)
    if with_scale:
        s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.asarray(1.0, dtype=src.dtype)
    t = mu_d - s * R @ mu_s
    return s, R, t
