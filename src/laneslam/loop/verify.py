"""Loop-closure geometric verification (SURVEY.md C13).

Candidate pair (current keyframe, old keyframe): match the *landmark
descriptors* of their observation sets (GEMM), giving 3D-3D landmark
correspondences expressed in each keyframe's LOCAL camera frame (locally
BA/PnP-consistent geometry — world frame would mix in spatially-varying
global drift that no rigid fit explains); a batched fixed-trial RANSAC
over Umeyama SE(3)/Sim(3) fits the relative pose; inlier count gates
the loop. Emits the measured relative pose T_ij = T_i^-1 T_j for the pose
graph, plus the fitted scale (Sim(3) mono path — monocular drift includes
scale, SURVEY.md §7.3.5).

3D-3D alignment (instead of the reference family's PnP re-localization)
is the TPU-native choice: it reuses the batched Umeyama solve, needs no
per-keyframe image data, and runs entirely on device-resident map arrays.

`verify_loops` is the production entry: one jit program that verifies ALL
top-k retrieval candidates via vmap and returns the best accepted one —
the round-2 host-side Python loop over candidates (one dispatch + one
device sync per candidate) is gone.
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


_Z0 = 5.0  # reference depth (m) for the depth-proportional inlier gate


class LoopResult(NamedTuple):
    accepted: jnp.ndarray  # bool scalar
    T_rel: jnp.ndarray  # (4, 4) measured T_cand^-1 @ T_cur (corrected)
    num_inliers: jnp.ndarray  # int32
    scale: jnp.ndarray  # float scalar: fitted cur->cand scale (1.0 for SE3)


def _verify_one(
    m: MapState,
    kf_cur: jnp.ndarray,
    kf_cand: jnp.ndarray,
    key: jax.Array,
    cfg: LoopConfig,
    with_scale: bool,
    cam=None,  # Camera (static); enables the pixel-refinement stage
) -> LoopResult:
    # Observation landmark sets of both keyframes.
    idx_a = m.obs_pt_idx[kf_cur]  # (Op,)
    idx_b = m.obs_pt_idx[kf_cand]
    va = idx_a >= 0
    vb = idx_b >= 0
    da = m.pt_desc[jnp.maximum(idx_a, 0)]
    db = m.pt_desc[jnp.maximum(idx_b, 0)]
    matches = match_descriptors(da, db, va, vb, ratio=0.9, cross_check=True,
                                allow_pallas=False)

    # Align in the two keyframes' LOCAL camera frames, not world frame:
    # world positions near cur carry spatially-varying global drift that no
    # single rigid transform explains (measured: world-frame fitting gave
    # edges 3.5-4.9 m off when the actual drift was 1.4 m — RANSAC locks
    # onto wrong consensus sets). Local geometry is BA/PnP-consistent with
    # each keyframe's own pose, and the fitted map cur-local -> cand-local
    # IS the loop edge T_cand^-1 T_cur directly.
    Xa = se3.transform_points(
        se3.inverse(m.kf_T_wc[kf_cur]), m.pt_xyz[jnp.maximum(idx_a, 0)]
    )  # (Op, 3) in cur camera frame
    Xb_all = se3.transform_points(
        se3.inverse(m.kf_T_wc[kf_cand]), m.pt_xyz[jnp.maximum(idx_b, 0)]
    )  # (Op, 3) every cand observation, in cand camera frame
    Xb = Xb_all[jnp.maximum(matches.idx, 0)]  # (Op, 3) matched to cur slots
    valid = matches.valid & m.pt_valid[jnp.maximum(idx_a, 0)]

    # --- stage 1: fixed-trial RANSAC on minimal Umeyama Sim(3)/SE(3).
    n = Xa.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, cfg.ransac_hypotheses)
    samp = jax.vmap(
        lambda k: jax.random.choice(k, n, (3,), replace=False, p=jax.nn.softmax(logits))
    )(keys)

    def fit(ids):
        s, R, t = umeyama_alignment(Xa[ids], Xb[ids], with_scale=with_scale)
        return s, se3.make(R, t)

    s_h, T_h = jax.vmap(fit)(samp)  # (H,), (H, 4, 4): cur-side -> cand-side
    # Sim(3) action: x -> s R x + t  (T_h packs R, t; scale applied to x).
    d = se3.transform_points(T_h[:, None], s_h[:, None, None] * Xa[None]) - Xb[None]
    err = jnp.linalg.norm(d, axis=-1)  # (H, Op)
    thr = 0.4  # meters in map scale
    scale_ok = (s_h > cfg.min_scale) & (s_h < cfg.max_scale)
    inliers = (err < thr) & valid[None, :] & scale_ok[:, None]
    scores = jnp.sum(inliers, axis=-1)

    # --- stage 2: greedy-diverse top-M hypotheses. Planar scenes admit
    # large FALSE rigid consensus sets (wall-sliding alignments between
    # different physical points matched by weak descriptors — measured on
    # the loop fixture: false consensus 15-17 vs true 13). Raw-inlier argmax
    # therefore cannot decide; we keep M translation-diverse hypotheses and
    # let guided re-matching (stage 3) arbitrate.
    M = 4
    t_h = T_h[:, :3, 3]

    def pick_step(avail, _):
        b = jnp.argmax(jnp.where(avail, scores, -1))
        near = jnp.linalg.norm(t_h - t_h[b], axis=-1) < 1.0
        return avail & ~near, b

    _, picks = jax.lax.scan(
        pick_step, jnp.ones((scores.shape[0],), bool), None, length=M
    )

    # --- stage 3: guided re-matching + refit per hypothesis. Under a pose
    # hypothesis the descriptor match repeats with a 3D proximity gate,
    # which resolves ratio-test ambiguity: the TRUE pose recovers the full
    # duplicated-landmark correspondence set (measured 31 vs 21 for the
    # false consensus above), so argmax-of-guided-support discriminates
    # where raw RANSAC support could not.
    valid_b = vb & m.pt_valid[jnp.maximum(idx_b, 0)]

    def guided_refine(T0, s0):
        def round_(carry, _):
            T, s = carry
            pa = se3.transform_points(T, s * Xa)  # (Op, 3) in cand frame
            d3 = jnp.linalg.norm(pa[:, None, :] - Xb_all[None, :, :], axis=-1)
            # Depth-proportional gate: a fixed metric threshold over a 5-20 m
            # depth spread either rejects all far points or admits sloppy
            # near-field fits; pixel error scales as metric_error / z, so
            # gate at thr * max(z/z0, 1) and refit with 1/z^2 weights —
            # a 3D proxy for reprojection-error minimization that removed
            # the 1 m / 4 deg edge-accuracy outliers.
            z = jnp.maximum(Xb_all[None, :, 2], 1.0)
            gate = d3 < 2 * thr * jnp.maximum(z / _Z0, 1.0)
            mm = match_descriptors(
                da, db, va, valid_b, gate=gate, ratio=0.9, cross_check=True,
                allow_pallas=False,
            )
            Xb_m = Xb_all[jnp.maximum(mm.idx, 0)]
            zm = jnp.maximum(Xb_m[:, 2], 1.0)
            e = jnp.linalg.norm(pa - Xb_m, axis=-1)
            inl = (e < thr * jnp.maximum(zm / _Z0, 1.0)) & mm.valid
            w = inl.astype(jnp.float32) / (zm * zm)
            s2, R2, t2 = umeyama_alignment(Xa, Xb_m, weights=w, with_scale=with_scale)
            cnt = jnp.sum(inl)
            return (se3.make(R2, t2), s2), cnt

        (T, s), cnts = jax.lax.scan(round_, (T0, s0), None, length=4)
        return T, s, cnts[-1]

    T_m, s_m, cnt_m = jax.vmap(guided_refine)(T_h[picks], s_h[picks])
    ok_m = (s_m > cfg.min_scale) & (s_m < cfg.max_scale)
    cnt_m = jnp.where(ok_m, cnt_m, -1)
    best = jnp.argmax(cnt_m)
    # The fitted local-frame map X_cand = s R X_cur + t IS the loop edge:
    # for true poses X_cand = (T_cand^-1 T_cur) X_cur, so T_rel = [R | t]
    # (scale reported separately for the mono renormalization path).
    T_rel, s_rel, num = T_m[best], s_m[best], cnt_m[best]

    if cam is not None:
        # --- stage 4: pixel-space refinement. 3D-3D Umeyama on stereo-depth
        # landmarks bottoms out around 1 m / 4 deg edge error (depth noise
        # grows as z^2); the precision instrument is reprojection. Project
        # the matched cand landmarks through the edge into cur's image and
        # GN against cur's OBSERVED pixels. Projection cancels any scale on
        # the cur side, so [R|t] refines identically for SE(3) and Sim(3);
        # the fitted s is kept from stage 3.
        from laneslam.geometry.pnp import _gn_refine, _reproj_err_sq

        uv_a = m.obs_pt_uv[kf_cur]  # (Op, 2) pixels where cur saw slot i
        pa = se3.transform_points(T_rel, s_rel * Xa)
        z = jnp.maximum(Xb_all[None, :, 2], 1.0)
        d3 = jnp.linalg.norm(pa[:, None, :] - Xb_all[None, :, :], axis=-1)
        gate = d3 < 2 * thr * jnp.maximum(z / _Z0, 1.0)
        mm = match_descriptors(
            da, db, va, valid_b, gate=gate, ratio=0.9, cross_check=True,
            allow_pallas=False,
        )
        Xb_m = Xb_all[jnp.maximum(mm.idx, 0)]
        px = 3.0
        T_cw = se3.inverse(T_rel)  # cand frame -> cur camera
        e0 = _reproj_err_sq(cam, T_cw, Xb_m, uv_a)
        w0 = (e0 < (2 * px) ** 2) & mm.valid & va
        T_cw = _gn_refine(cam, T_cw, Xb_m, uv_a, w0.astype(jnp.float32))
        e1 = _reproj_err_sq(cam, T_cw, Xb_m, uv_a)
        inl_px = (e1 < px**2) & mm.valid & va
        T_cw = _gn_refine(cam, T_cw, Xb_m, uv_a, inl_px.astype(jnp.float32), iters=4)
        e2 = _reproj_err_sq(cam, T_cw, Xb_m, uv_a)
        inl_px = (e2 < px**2) & mm.valid & va
        # Guard: keep the pixel solution only if it is finite and at least
        # as well-supported as the 3D stage (GN can diverge on degenerate
        # weight sets).
        T_px = se3.inverse(T_cw)
        good = jnp.isfinite(T_px).all() & (jnp.sum(inl_px) >= jnp.minimum(num, 12))
        T_rel = jnp.where(good, T_px, T_rel)
        num = jnp.where(good, jnp.sum(inl_px), num)

    # --- drift-consistency gate: the correction this edge implies against
    # the current pose estimate must be commensurate with drift accumulable
    # over the traversed arc. Wall-slide false consensus (the planar-scene
    # failure mode of stage 2) survives pixel refinement with marginal
    # support but implies corrections far beyond any plausible drift rate;
    # true closures measured ~4% of arc (round 4).
    t_all = m.kf_T_wc[:, :3, 3]
    dseg = jnp.linalg.norm(jnp.diff(t_all, axis=0), axis=-1)  # (K-1,)
    kk = jnp.arange(dseg.shape[0])
    arc = jnp.sum(jnp.where((kk >= kf_cand) & (kk < kf_cur), dseg, 0.0))
    T_est = se3.inverse(m.kf_T_wc[kf_cand]) @ m.kf_T_wc[kf_cur]
    D = se3.inverse(T_est) @ T_rel
    corr_t = jnp.linalg.norm(D[:3, 3])
    cos_r = jnp.clip((jnp.trace(D[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
    corr_deg = jnp.rad2deg(jnp.arccos(cos_r))
    consistent = (
        (corr_t <= jnp.maximum(cfg.max_correction_frac * arc, cfg.max_correction_m))
        & (corr_deg <= cfg.max_correction_deg)
    )
    # Scale leg of the same gate (round 5): mono scale drift accumulates a
    # few percent per lap, so an extreme fitted scale is evidence of a
    # false consensus, not a huge drift — unless the support is strong.
    # (Measured: a scale-1.82 edge at 21 inliers warped the rehearsal map
    # until tracking collapsed; true closures fit 0.92-1.05.)
    scale_sane = (jnp.abs(jnp.log(jnp.maximum(s_rel, 1e-6))) <= 0.25) | (
        num >= 2 * cfg.min_inliers
    )

    return LoopResult(
        accepted=(num >= cfg.min_inliers) & ok_m[best] & consistent & scale_sane,
        T_rel=T_rel,
        num_inliers=num,
        scale=s_rel,
    )


@partial(jax.jit, static_argnames=("cfg", "with_scale", "cam"))
def verify_loop(
    m: MapState,
    kf_cur: jnp.ndarray,  # scalar id
    kf_cand: jnp.ndarray,  # scalar id
    key: jax.Array,
    cfg: LoopConfig = LoopConfig(),
    with_scale: bool = False,
    cam=None,
) -> LoopResult:
    return _verify_one(m, kf_cur, kf_cand, key, cfg, with_scale, cam)


@partial(jax.jit, static_argnames=("cfg", "with_scale", "cam"))
def verify_loops(
    m: MapState,
    kf_cur: jnp.ndarray,  # scalar id
    cand_ids: jnp.ndarray,  # (k,) candidate ids, -1 = empty slot
    key: jax.Array,
    cfg: LoopConfig = LoopConfig(),
    with_scale: bool = False,
    cam=None,
) -> LoopResult:
    """Verify all top-k candidates in one dispatch; return the best accepted.

    Empty slots (-1) verify against keyframe 0 but are masked out of the
    result. Returns a LoopResult whose `accepted` says whether ANY candidate
    passed; T_rel/num_inliers/scale describe the best one, and num_inliers
    is -1 when nothing passed. `best_cand` rides in as an extra array via
    the _Batched wrapper below.
    """
    k = cand_ids.shape[0]
    keys = jax.random.split(key, k)
    res = jax.vmap(
        lambda c, kk: _verify_one(m, kf_cur, jnp.maximum(c, 0), kk, cfg, with_scale, cam)
    )(cand_ids, keys)
    ok = res.accepted & (cand_ids >= 0)
    score = jnp.where(ok, res.num_inliers, -1)
    best = jnp.argmax(score)
    return BatchedLoopResult(
        accepted=jnp.any(ok),
        T_rel=res.T_rel[best],
        num_inliers=jnp.where(jnp.any(ok), res.num_inliers[best], -1),
        scale=res.scale[best],
        best_cand=jnp.where(jnp.any(ok), cand_ids[best], -1),
        all_accepted=ok,
        all_T_rel=res.T_rel,
        all_inliers=jnp.where(ok, res.num_inliers, -1),
        all_cand=jnp.where(ok, cand_ids, -1),
        all_scale=jnp.where(ok, res.scale, 1.0),
    )


def empty_batched_result(k: int) -> "BatchedLoopResult":
    """All-rejected result with the same pytree structure as verify_loops —
    the skip branch of the chunk-level `lax.cond` that gates verification
    on retrieval (system.py _slam_chunk)."""
    return BatchedLoopResult(
        accepted=jnp.asarray(False),
        T_rel=jnp.eye(4, dtype=jnp.float32),
        num_inliers=jnp.asarray(-1, jnp.int32),
        scale=jnp.asarray(1.0, jnp.float32),
        best_cand=jnp.asarray(-1, jnp.int32),
        all_accepted=jnp.zeros((k,), bool),
        all_T_rel=jnp.tile(jnp.eye(4, dtype=jnp.float32), (k, 1, 1)),
        all_inliers=jnp.full((k,), -1, jnp.int32),
        all_cand=jnp.full((k,), -1, jnp.int32),
        all_scale=jnp.ones((k,), jnp.float32),
    )


class BatchedLoopResult(NamedTuple):
    """Best-candidate summary + per-candidate results.

    Simultaneous closures are common at multi-pass intersections (KITTI 00
    revisits the same junction on several passes): every candidate that
    survives geometric verification is a valid constraint, and the pose
    graph is strictly better-conditioned with all of them — the caller adds
    one edge per `all_accepted` slot, not just the best (VERDICT r3 #5)."""

    accepted: jnp.ndarray  # bool: any candidate passed
    T_rel: jnp.ndarray  # (4, 4) edge of the best candidate
    num_inliers: jnp.ndarray  # int32 of the best candidate (-1 if none)
    scale: jnp.ndarray  # fitted scale of the best candidate
    best_cand: jnp.ndarray  # int32 keyframe id (-1 if none)
    all_accepted: jnp.ndarray  # (k,) bool per candidate
    all_T_rel: jnp.ndarray  # (k, 4, 4) per-candidate fitted edges
    all_inliers: jnp.ndarray  # (k,) int32, -1 where not accepted
    all_scale: jnp.ndarray  # (k,) fitted scale per candidate (1.0 = none)
    all_cand: jnp.ndarray  # (k,) keyframe ids, -1 where not accepted
