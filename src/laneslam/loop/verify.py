"""Loop-closure geometric verification (SURVEY.md C13).

Candidate pair (current keyframe, old keyframe): match the *landmark
descriptors* of their observation sets (GEMM), giving 3D-3D landmark
correspondences in the (drifted) world frame; a batched fixed-trial RANSAC
over Umeyama SE(3) fits the relative correction; inlier count gates the
loop. Emits the measured relative pose T_ij = T_i^-1 T_j for the pose graph.

3D-3D alignment (instead of the reference family's PnP re-localization)
is the TPU-native choice: it reuses the batched Umeyama solve, needs no
per-keyframe image data, and runs entirely on device-resident map arrays.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laneslam.config import LoopConfig
from laneslam.features.match import match_descriptors
from laneslam.geometry import se3
from laneslam.geometry.umeyama import umeyama_alignment
from laneslam.map.map import MapState


class LoopResult(NamedTuple):
    accepted: jnp.ndarray  # bool scalar
    T_rel: jnp.ndarray  # (4, 4) measured T_cand^-1 @ T_cur (corrected)
    num_inliers: jnp.ndarray  # int32


@partial(jax.jit, static_argnames=("cfg",))
def verify_loop(
    m: MapState,
    kf_cur: jnp.ndarray,  # scalar id
    kf_cand: jnp.ndarray,  # scalar id
    key: jax.Array,
    cfg: LoopConfig = LoopConfig(),
) -> LoopResult:
    P = m.pt_xyz.shape[0]
    # Observation landmark sets of both keyframes.
    idx_a = m.obs_pt_idx[kf_cur]  # (Op,)
    idx_b = m.obs_pt_idx[kf_cand]
    va = idx_a >= 0
    vb = idx_b >= 0
    da = m.pt_desc[jnp.maximum(idx_a, 0)]
    db = m.pt_desc[jnp.maximum(idx_b, 0)]
    matches = match_descriptors(da, db, va, vb, ratio=0.9, cross_check=True)

    Xa = m.pt_xyz[jnp.maximum(idx_a, 0)]  # (Op, 3) world (drifted near cur)
    Xb = m.pt_xyz[jnp.maximum(idx_b, 0)][jnp.maximum(matches.idx, 0)]
    valid = matches.valid & m.pt_valid[jnp.maximum(idx_a, 0)]

    # Fixed-trial RANSAC on 3-point Umeyama SE(3).
    n = Xa.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, cfg.ransac_hypotheses)
    samp = jax.vmap(
        lambda k: jax.random.choice(k, n, (3,), replace=False, p=jax.nn.softmax(logits))
    )(keys)

    def fit(ids):
        s, R, t = umeyama_alignment(Xa[ids], Xb[ids], with_scale=False)
        return se3.make(R, t)

    T_h = jax.vmap(fit)(samp)  # (H, 4, 4): maps cur-side points onto cand-side
    d = se3.transform_points(T_h[:, None], Xa[None]) - Xb[None]
    err = jnp.linalg.norm(d, axis=-1)  # (H, Op)
    thr = 0.5  # meters in map scale
    inliers = (err < thr) & valid[None, :]
    scores = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(scores)
    inl = inliers[best]

    # Refit on all inliers.
    s, R, t = umeyama_alignment(Xa, Xb, weights=inl.astype(jnp.float32), with_scale=False)
    T_corr = se3.make(R, t)  # world correction aligning cur onto cand geometry
    num = jnp.sum((jnp.linalg.norm(se3.transform_points(T_corr, Xa) - Xb, axis=-1) < thr) & valid)

    # Loop edge measurement: corrected relative pose between the keyframes.
    # T_cur_corrected = T_corr @ T_wc[cur]; edge = inv(T_wc[cand]) @ T_cur_corrected.
    T_rel = se3.inverse(m.kf_T_wc[kf_cand]) @ (T_corr @ m.kf_T_wc[kf_cur])
    return LoopResult(
        accepted=num >= cfg.min_inliers,
        T_rel=T_rel,
        num_inliers=num,
    )
