"""Trajectory accuracy metrics: ATE RMSE and RPE (SURVEY.md C19).

This is the judged metric (BASELINE.json:2 "ATE RMSE (m) on KITTI 00").
`evo` is absent in this environment, so the metrics are implemented here:
ATE = RMSE of translational error after Umeyama alignment (Sim(3) for
monocular — scale unobservable — SE(3) for stereo), matching the standard
KITTI/TUM evaluation conventions.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from laneslam.geometry.umeyama import umeyama_alignment


def ate_rmse(
    est_poses: jnp.ndarray,
    gt_poses: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    align_scale: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute trajectory error after Umeyama alignment.

    Args:
      est_poses, gt_poses: (N, 4, 4) T_wc stacks (only translations used).
      valid: optional (N,) mask over fixed-capacity padding.
      align_scale: Sim(3) alignment (True => monocular convention).

    Returns: (rmse, per-frame translational errors (N,), masked entries 0).
    """
    p_est = est_poses[:, :3, 3]
    p_gt = gt_poses[:, :3, 3]
    w = jnp.ones(p_est.shape[0], p_est.dtype) if valid is None else valid.astype(p_est.dtype)
    s, R, t = umeyama_alignment(p_est, p_gt, weights=w, with_scale=align_scale)
    p_al = s * p_est @ R.T + t
    err = jnp.linalg.norm(p_al - p_gt, axis=-1) * (w > 0)
    rmse = jnp.sqrt(jnp.sum(err**2) / jnp.maximum(jnp.sum(w > 0), 1))
    return rmse, err


def rpe(
    est_poses: jnp.ndarray,
    gt_poses: jnp.ndarray,
    delta: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relative pose error over a frame delta.

    Returns (translational RMSE, rotational RMSE in radians).
    """
    def rel(T):
        A = jnp.linalg.inv(T[:-delta]) @ T[delta:]
        return A

    E = jnp.linalg.inv(rel(gt_poses)) @ rel(est_poses)
    trans = jnp.linalg.norm(E[:, :3, 3], axis=-1)
    cos_t = jnp.clip((jnp.trace(E[:, :3, :3], axis1=-2, axis2=-1) - 1) / 2, -1, 1)
    rot = jnp.arccos(cos_t)
    return jnp.sqrt(jnp.mean(trans**2)), jnp.sqrt(jnp.mean(rot**2))
