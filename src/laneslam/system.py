"""SLAM system orchestrator (SURVEY.md C18): configs 2 and 3.

Keyframe-based tracking with a device-resident map:

  frame -> extract (jit) -> track vs last keyframe's landmarks (PnP, jit)
        -> keyframe decision -> [triangulate new landmarks + insert KF +
           window BA (jit) + loop query/verify (jit) + PGO (jit)]

Design notes:
- Observation rows are *feature-slot aligned*: obs slot i of a keyframe is
  feature slot i of the features extracted at that keyframe, so tracking
  matches map landmarks through descriptor slots with no re-association.
- The host only reads small scalars (inlier counts, decisions) and never
  touches feature/map arrays; every numeric phase is one jit program.
  (Full fusion of the decision logic into a single lax.cond step is the
  planned optimization; the phase boundaries here already match it.)
- Monocular bootstrap: two-view essential + triangulation at unit baseline;
  ATE is evaluated after Sim(3) alignment as is conventional.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.backend.ba import ba_solve
from laneslam.backend.pgo import (
    PgoProblem, PgoSim3Problem, pgo_solve, pgo_solve_sim3,
)
from laneslam.config import SlamConfig
from laneslam.features.match import match_descriptors, match_lines, match_points
from laneslam.frontend.extract import FrameFeatures, extract_features
from laneslam.geometry import se3
from laneslam.geometry.camera import Camera
from laneslam.geometry.pnp import solve_pnp_ransac
from laneslam.geometry.triangulate import triangulate_lines, triangulate_points_dlt
from laneslam.geometry.twoview import estimate_relative_pose
from laneslam.eval.metrics import MetricsRing, metrics_drain, metrics_init, metrics_push
from laneslam.loop.kfdb import aggregate_descriptor, codebook, query_kfdb
from laneslam.loop.verify import verify_loops
from laneslam.map.map import MapState, make_empty_map
from laneslam.map import ops


# --------------------------------------------------------------------------
# jit phases
# --------------------------------------------------------------------------

_METRICS_NAMES = ("inliers", "tracked", "fallback", "keyframe")
_METRICS_SCHEMA, _ = metrics_init(_METRICS_NAMES, capacity=256)


def _fresh_ring() -> MetricsRing:
    # Created per-system (not a module-level device array): device buffers
    # die across a tunnel-client reset (runtime/hostsync.py), so no module
    # global may hold one.
    return metrics_init(_METRICS_NAMES, capacity=256)[1]


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _bootstrap_pair(
    feats0: FrameFeatures, feats1: FrameFeatures, key: jax.Array,
    cfg: SlamConfig, cam: Camera,
):
    """Two-view initialization: relative pose + triangulated points/lines."""
    import dataclasses

    mcfg = dataclasses.replace(
        cfg.match,
        max_point_dist_px=cfg.match.bootstrap_dist_px,
        max_line_dist_px=cfg.match.bootstrap_dist_px,
    )
    pm = match_points(feats0.points, feats0.point_desc, feats1.points, feats1.point_desc, mcfg)
    lm = match_lines(feats0.segments, feats0.line_desc, feats1.segments, feats1.line_desc, mcfg)
    uv0 = feats0.points.uv
    uv1 = feats1.points.uv[jnp.maximum(pm.idx, 0)]
    tv = estimate_relative_pose(
        cam, uv0, uv1, pm.valid, key,
        num_hypotheses=cfg.frontend.essential_hypotheses,
        inlier_px=cfg.frontend.inlier_px,
    )
    # Pose of frame1: x_1 = R x_0 + t (unit baseline). T_wc1 = inv([R|t]).
    T_wc1 = se3.inverse(se3.make(tv.R, tv.t))
    T_wc0 = jnp.eye(4)
    X, okX = triangulate_points_dlt(cam, T_wc0, T_wc1, uv0, uv1)
    okX = okX & tv.inliers & pm.valid
    seg0 = feats0.segments.xyxy
    seg1 = feats1.segments.xyxy[jnp.maximum(lm.idx, 0)]
    L, okL = triangulate_lines(cam, T_wc0, T_wc1, seg0, seg1)
    okL = okL & lm.valid
    return T_wc1, pm, lm, X, okX, L, okL, tv.num_inliers


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _track(
    m: MapState,
    cur: FrameFeatures,
    T_pred: jnp.ndarray,
    key: jax.Array,
    cfg: SlamConfig,
    cam: Camera,
):
    """Local-map tracking: project landmarks into the motion-model
    predicted view, descriptor-GEMM match with a projection-radius gate,
    then PnP RANSAC. (One jit program; the (Kc, P) gate+GEMM is MXU work.)

    cfg.frontend.track_local_landmarks restricts candidates to the last two
    keyframes' observation rows (2*Op slots instead of the full landmark
    capacity) — 16x less gate/GEMM/top_k work for the fused chunk path.
    """
    from laneslam.geometry.camera import project_points

    if cfg.frontend.track_local_landmarks:
        kf_id = jnp.argmax(
            jnp.where(m.kf_valid, jnp.arange(m.kf_T_wc.shape[0]), -1)
        )
        row1 = m.obs_pt_idx[kf_id]
        row2 = m.obs_pt_idx[jnp.maximum(kf_id - 1, 0)]
        P = m.pt_xyz.shape[0]
        # Drop row2 entries already present in row1 (duplicate columns break
        # the mutual-nearest cross check: the reverse argmax may land on the
        # twin column).
        member = jnp.zeros((P + 1,), bool).at[
            jnp.where(row1 >= 0, row1, P + 1)
        ].set(True, mode="drop")
        dup2 = member[jnp.clip(row2, 0, P)] & (row2 >= 0)
        cand = jnp.concatenate([row1, jnp.where(dup2, -1, row2)])
        ci = jnp.maximum(cand, 0)
        cand_ok = (cand >= 0) & m.pt_valid[ci]
        pt_xyz, pt_desc = m.pt_xyz[ci], m.pt_desc[ci]
    else:
        cand = None
        cand_ok = m.pt_valid
        pt_xyz, pt_desc = m.pt_xyz, m.pt_desc

    T_cw_pred = se3.inverse(T_pred)
    uv_proj, z = project_points(cam, se3.transform_points(T_cw_pred, pt_xyz))
    in_img = (
        (z > 0.2)
        & (uv_proj[:, 0] >= -20) & (uv_proj[:, 0] < cam.width + 20)
        & (uv_proj[:, 1] >= -20) & (uv_proj[:, 1] < cam.height + 20)
    )
    vis = cand_ok & in_img
    # Spatial gate: feature within a search radius of the predicted pixel.
    r = cfg.match.max_point_dist_px
    d = jnp.linalg.norm(cur.points.uv[:, None, :] - uv_proj[None, :, :], axis=-1)
    gate = d < r
    matches = match_descriptors(
        cur.point_desc, pt_desc, cur.points.valid, vis,
        gate=gate, ratio=cfg.match.ratio, cross_check=cfg.match.cross_check,
    )
    idx_global = matches.idx if cand is None else cand[jnp.maximum(matches.idx, 0)]
    cur_lm = jnp.where(matches.valid, idx_global, -1)
    has_lm = matches.valid
    X = m.pt_xyz[jnp.maximum(cur_lm, 0)]
    res = solve_pnp_ransac(
        cam, X, cur.points.uv, has_lm, key,
        num_hypotheses=cfg.frontend.pnp_hypotheses,
        inlier_px=cfg.frontend.track_inlier_px,
    )
    T_wc = se3.inverse(res.T_cw)
    return T_wc, cur_lm, res.inliers, res.num_inliers


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _track_step(
    m: MapState,
    cur: FrameFeatures,
    T_prev: jnp.ndarray,
    last_rel: jnp.ndarray,
    kf_id: jnp.ndarray,
    frames_since_kf: jnp.ndarray,  # already incremented for this frame
    ring: MetricsRing,
    key: jax.Array,
    cfg: SlamConfig,
    cam: Camera,
):
    """Fused per-frame step: track + fallback + keyframe decision + pose
    packing. ONE jit dispatch and ONE small host readback per frame (the
    38-float `packed` vector) replace the round-2 pattern of 3-4 separate
    `int()`/`bool()` device syncs (SURVEY.md §7.3.3; VERDICT r2 weak #1).

    packed layout: [0:16] T_wc row-major, [16:32] T_rel-to-current-KF,
    [32] n_inl, [33] n_tracked, [34] fallback?, [35] make_keyframe?.
    """
    T_pred = T_prev @ last_rel
    T_wc, cur_lm, inl_mask, n_inl = _track(m, cur, T_pred, key, cfg, cam)
    fe = cfg.frontend
    bad = (n_inl < fe.min_track_inliers) | jnp.isnan(T_wc).any()
    T_wc = jnp.where(bad, T_pred, T_wc)
    inl_mask = inl_mask & ~bad
    last_rel_new = jnp.where(bad, last_rel, se3.inverse(T_prev) @ T_wc)
    n_tracked = jnp.sum(cur_lm >= 0)
    need_kf = (
        (n_inl < fe.kf_min_inliers)
        | (n_inl < fe.kf_min_tracked_ratio * jnp.maximum(n_tracked, 1))
        | (frames_since_kf >= fe.kf_max_interval)
    )
    make_kf = need_kf & (n_inl >= fe.min_track_inliers)
    T_rel_kf = se3.inverse(m.kf_T_wc[kf_id]) @ T_wc
    packed = jnp.concatenate([
        T_wc.reshape(-1), T_rel_kf.reshape(-1),
        jnp.stack([
            n_inl.astype(jnp.float32),
            n_tracked.astype(jnp.float32),
            bad.astype(jnp.float32),
            make_kf.astype(jnp.float32),
        ]),
    ])
    # Device-resident metrics ring (SURVEY.md §5.5): the push happens inside
    # this jit program; the host drains the whole ring every M frames in one
    # transfer instead of reading scalars per frame.
    ring = metrics_push(_METRICS_SCHEMA, ring, {
        "inliers": n_inl, "tracked": n_tracked,
        "fallback": bad, "keyframe": make_kf,
    })
    return T_wc, cur_lm, inl_mask, last_rel_new, packed, ring


@jax.jit
def _rectify_feats(feats: FrameFeatures, p):
    """Map raw feature coordinates into the rectified pinhole model
    (geometry/undistort.py): uv + segment endpoints move, derived segment
    angle is recomputed; descriptors (raw-image appearance) are untouched."""
    from laneslam.geometry.undistort import rectify_segments, rectify_uv

    pts = feats.points._replace(uv=rectify_uv(feats.points.uv, p))
    xyxy = rectify_segments(feats.segments.xyxy, p)
    d = xyxy[:, 2:] - xyxy[:, :2]
    segs = feats.segments._replace(
        xyxy=xyxy, angle=jnp.arctan2(d[:, 1], d[:, 0])
    )
    return feats._replace(points=pts, segments=segs)


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _make_keyframe(
    m: MapState,
    kf_prev: jnp.ndarray,
    kf_feats: FrameFeatures,
    cur: FrameFeatures,
    cur_lm: jnp.ndarray,  # (Kc,) tracked landmark per cur point slot
    pnp_inliers: jnp.ndarray,
    T_wc_cur: jnp.ndarray,
    vocab: jnp.ndarray,
    cfg: SlamConfig,
    cam: Camera,
    allow_new=True,
):
    """Triangulate new landmarks vs the previous keyframe and insert a KF.

    `allow_new` (traced bool): when False, the keyframe is a REFERENCE
    REFRESH only — tracked observations are recorded but no landmarks are
    triangulated. Used during sustained tracking loss: a keyframe pose from
    the motion model drifts boundedly, but landmarks triangulated from a
    garbage baseline carry garbage SCALE, which feeds the next PnP and
    compounds |t| exponentially (the round-5 rehearsal blowup)."""
    T_wc_prev = m.kf_T_wc[kf_prev]
    pm = match_points(kf_feats.points, kf_feats.point_desc, cur.points, cur.point_desc, cfg.match)
    lmm = match_lines(kf_feats.segments, kf_feats.line_desc, cur.segments, cur.line_desc, cfg.match)

    # --- points: new landmarks from matches whose kf slot has no landmark.
    lm_of_slot = m.obs_pt_idx[kf_prev]  # (Op,)
    uv_prev = kf_feats.points.uv
    uv_cur = cur.points.uv[jnp.maximum(pm.idx, 0)]
    X_new, okX = triangulate_points_dlt(cam, T_wc_prev, T_wc_cur, uv_prev, uv_cur)
    # Gates: depth sanity + parallax (low-baseline triangulations are noise).
    from laneslam.geometry.triangulate import parallax_deg

    depth_prev = se3.transform_points(se3.inverse(T_wc_prev), X_new)[:, 2]
    par = parallax_deg(T_wc_prev, T_wc_cur, X_new)
    is_new = (
        pm.valid & (lm_of_slot < 0) & okX
        & (depth_prev > 0.2) & (depth_prev < 200.0)
        & (par > cfg.frontend.min_parallax_deg)
        & allow_new
    )
    m, new_ids = ops.add_points(
        m, X_new, kf_feats.point_desc, is_new, jnp.full(X_new.shape[0], m.kf_count, jnp.int32)
    )
    # Backfill the previous keyframe's observation row: it is the other ray
    # of the triangulation, and without it a new landmark enters window BA
    # with a single observation (unconstrained along its ray). X_new / is_new
    # are kf-prev slot-aligned, so the row update is a plain where.
    m = m._replace(
        obs_pt_idx=m.obs_pt_idx.at[kf_prev].set(
            jnp.where(is_new & (new_ids >= 0), new_ids, lm_of_slot)
        )
    )

    # cur-slot landmark table: tracked ones + newly created ones.
    Kc = cur.points.uv.shape[0]
    tracked_lm = jnp.where(pnp_inliers, cur_lm, -1)
    tgt = jnp.where(pm.valid & (new_ids >= 0), pm.idx, Kc + 1)
    slot_lm = tracked_lm.at[tgt].set(new_ids, mode="drop")

    # --- lines: same scheme.
    ln_of_slot = m.obs_ln_idx[kf_prev]
    seg_prev = kf_feats.segments.xyxy
    seg_cur = cur.segments.xyxy[jnp.maximum(lmm.idx, 0)]
    L_new, okL = triangulate_lines(cam, T_wc_prev, T_wc_cur, seg_prev, seg_cur)
    is_new_l = lmm.valid & (ln_of_slot < 0) & okL & allow_new
    m, new_lids = ops.add_lines(
        m, L_new, kf_feats.line_desc, is_new_l, jnp.full(L_new.shape[0], m.kf_count, jnp.int32)
    )
    m = m._replace(
        obs_ln_idx=m.obs_ln_idx.at[kf_prev].set(
            jnp.where(is_new_l & (new_lids >= 0), new_lids, ln_of_slot)
        )
    )
    Kl = cur.segments.xyxy.shape[0]
    slot_ln = jnp.full((Kl,), -1, jnp.int32)
    # Tracked lines: cur slot <- landmark of matched kf slot.
    tgt_l = jnp.where(lmm.valid & (ln_of_slot >= 0), lmm.idx, Kl + 1)
    slot_ln = slot_ln.at[tgt_l].set(ln_of_slot, mode="drop")
    tgt_l2 = jnp.where(lmm.valid & (new_lids >= 0), lmm.idx, Kl + 1)
    slot_ln = slot_ln.at[tgt_l2].set(new_lids, mode="drop")
    slot_ln = jnp.where(cur.segments.valid, slot_ln, -1)

    agg = aggregate_descriptor(cur.point_desc, cur.points.valid, vocab)
    m, kf_id = ops.insert_keyframe(
        m, T_wc_cur,
        jnp.where(cur.points.valid, slot_lm, -1), cur.points.uv,
        slot_ln, cur.segments.xyxy, agg,
    )
    T_rel = se3.inverse(m.kf_T_wc[kf_prev]) @ T_wc_cur
    new_pts = jnp.sum(new_ids >= 0)
    new_lns = jnp.sum(new_lids >= 0)
    return m, kf_id, T_rel, new_pts, new_lns


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _track_map_lines(
    m: MapState, cur: FrameFeatures, T_wc: jnp.ndarray, cfg: SlamConfig, cam: Camera
):
    """Associate current segments with map line landmarks: descriptor GEMM
    gated by projected-infinite-line distance + orientation."""
    from laneslam.geometry.camera import project_line
    from laneslam.geometry.lines import plucker_transform

    T_cw = se3.inverse(T_wc)
    L_c = plucker_transform(T_cw, m.ln_plucker)  # (L, 6)
    l_img = project_line(cam, L_c)  # (L, 3)
    norm = jnp.sqrt(l_img[:, 0] ** 2 + l_img[:, 1] ** 2)
    l_n = l_img / jnp.maximum(norm, 1e-9)[:, None]
    mid = cur.segments.midpoint()  # (Kl, 2)
    dist = jnp.abs(
        mid[:, None, 0] * l_n[None, :, 0]
        + mid[:, None, 1] * l_n[None, :, 1]
        + l_n[None, :, 2]
    )  # (Kl, L)
    ang_map = jnp.arctan2(-l_n[:, 0], l_n[:, 1])  # image-line direction
    da = cur.segments.angle[:, None] - ang_map[None, :]
    da = jnp.abs(jnp.arctan2(jnp.sin(da), jnp.cos(da)))
    da = jnp.minimum(da, jnp.pi - da)
    gate = (dist < 30.0) & (da < jnp.deg2rad(15.0))
    lm = match_descriptors(
        cur.line_desc, m.ln_desc, cur.segments.valid, m.ln_valid,
        gate=gate, ratio=cfg.match.ratio, cross_check=True,
    )
    return jnp.where(lm.valid, lm.idx, -1)  # (Kl,) landmark id per cur slot


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _make_keyframe_stereo(
    m: MapState,
    kf_prev: jnp.ndarray,
    cur: FrameFeatures,
    depths,  # StereoDepths
    cur_lm: jnp.ndarray,
    pnp_inliers: jnp.ndarray,
    T_wc_cur: jnp.ndarray,
    vocab: jnp.ndarray,
    cfg: SlamConfig,
    cam: Camera,
    allow_new=True,
):
    """Stereo keyframe: landmarks born metric from one stereo pair.

    `allow_new` as in _make_keyframe: stereo depth itself is metric, but a
    lost tracker's T_wc places the born landmarks at garbage world
    positions — reference-refresh only while tracking is lost."""
    from laneslam.geometry.camera import backproject
    from laneslam.geometry.lines import plucker_from_endpoints, plucker_normalize

    # --- points.
    tracked_lm = jnp.where(pnp_inliers, cur_lm, -1)
    X_c = backproject(cam, cur.points.uv, depths.pt_depth)
    X_w = se3.transform_points(T_wc_cur, X_c)
    is_new = (
        depths.pt_valid & (tracked_lm < 0) & cur.points.valid
        & (depths.pt_depth > 0.2) & (depths.pt_depth < 120.0)
        & allow_new
    )
    m, new_ids = ops.add_points(
        m, X_w, cur.point_desc, is_new, jnp.full(X_w.shape[0], m.kf_count, jnp.int32)
    )
    slot_lm = jnp.where(new_ids >= 0, new_ids, tracked_lm)

    # --- lines: track against map, then create the rest from stereo depth.
    tracked_ln = _track_map_lines(m, cur, T_wc_cur, cfg, cam)
    e1_c = backproject(cam, cur.segments.xyxy[:, :2], depths.ln_depth12[:, 0])
    e2_c = backproject(cam, cur.segments.xyxy[:, 2:], depths.ln_depth12[:, 1])
    L_w = plucker_normalize(
        plucker_from_endpoints(
            se3.transform_points(T_wc_cur, e1_c), se3.transform_points(T_wc_cur, e2_c)
        )
    )
    ln_new = (
        depths.ln_valid & (tracked_ln < 0) & cur.segments.valid
        & jnp.all(depths.ln_depth12 > 0.2, axis=-1)
        & jnp.all(depths.ln_depth12 < 120.0, axis=-1)
        & allow_new
    )
    m, new_lids = ops.add_lines(
        m, L_w, cur.line_desc, ln_new, jnp.full(L_w.shape[0], m.kf_count, jnp.int32)
    )
    slot_ln = jnp.where(new_lids >= 0, new_lids, tracked_ln)

    agg = aggregate_descriptor(cur.point_desc, cur.points.valid, vocab)
    m, kf_id = ops.insert_keyframe(
        m, T_wc_cur,
        jnp.where(cur.points.valid, slot_lm, -1), cur.points.uv,
        jnp.where(cur.segments.valid, slot_ln, -1), cur.segments.xyxy, agg,
    )
    T_rel = se3.inverse(m.kf_T_wc[kf_prev]) @ T_wc_cur
    return m, kf_id, T_rel, jnp.sum(new_ids >= 0), jnp.sum(new_lids >= 0)


@partial(jax.jit, static_argnames=("min_obs", "min_age_kf", "pressure"))
def _cull(m: MapState, min_obs: int, min_age_kf: int, pressure: float):
    return ops.cull_landmarks(
        m, min_obs=min_obs, min_age_kf=min_age_kf, pressure=pressure
    )


@partial(jax.jit, static_argnames=("cfg", "cam", "num_fixed"))
def _window_ba(m: MapState, cfg: SlamConfig, cam: Camera, num_fixed: int = 2):
    if cfg.ba.covis_window:
        ids, slot_valid = ops.window_ids_covis(m, cfg.ba.window_size)
    else:
        ids, slot_valid = ops.window_ids(m, cfg.ba.window_size)
    prob, tables = ops.gather_window(m, ids, slot_valid)
    out, info = ba_solve(prob, cam, cfg.ba, num_fixed_poses=num_fixed)
    m = ops.scatter_window(m, out, ids, slot_valid, tables)
    return m, info.cost


# Above this window size _global_ba switches from the dense-Schur solver to
# the matrix-free implicit-Schur PCG (backend/ba_implicit.py): the dense
# coupling tensor B (N, W, 6, d) at W=64 with production landmark capacity
# is already ~1.5 GB padded; the implicit path's memory is O(observations).
_IMPLICIT_MIN_W = 32


@partial(jax.jit, static_argnames=("cfg", "cam", "W", "iters", "num_fixed"))
def _global_ba(m: MapState, cfg: SlamConfig, cam: Camera, W: int, iters: int,
               num_fixed: int = 2):
    """Global bundle adjustment: one BA solve whose window is EVERY live
    keyframe (W >= kf_count), so all poses and all landmarks are jointly
    refined against all observations — the full-map refinement ORB-SLAM
    runs after loop closure (its GBA). Sliding-window BA + pose-graph
    edges lock revisited laps together but cannot remove the low-frequency
    drift the laps share; only a joint solve over all passes can
    (measured on the rehearsal fixture: Sim(3) ATE 2.69 -> 0.57 m,
    scripts/rehearsal.py --frames 1200).

    Solver choice by window size: small windows reuse the dense-Schur
    machinery unchanged (window_ids + gather_window + ba_solve). Above
    `_IMPLICIT_MIN_W` keyframes the dense coupling tensor B
    (N, W, 6, d) stops being representable — at production capacity
    (W=512, 16,384 point blocks) it is 600 MB unpadded and >16 GB after
    TPU (6, d)-trailing-dim tiling, a measured round-5 HBM OOM at 22.9 G —
    so the solve switches to the matrix-free implicit-Schur PCG path
    (backend/ba_implicit.py), whose memory is O(#observations).

    Gauge: `num_fixed` poses frozen. Mono systems pass 2 (same as
    _window_ba): a projective problem has a 7-dim gauge group and fixing
    one pose leaves the global-scale direction constrained only by LM
    damping — repeated solves would let the map's metric scale wander
    (ADVICE r4). Stereo passes 1 (the right-camera residuals pin scale).
    """
    ids, slot_valid = ops.window_ids(m, W)
    prob, tables = ops.gather_window(m, ids, slot_valid)
    import dataclasses

    bacfg = dataclasses.replace(cfg.ba, gn_iters=iters)
    if W > _IMPLICIT_MIN_W:
        from laneslam.backend.ba_implicit import ba_solve_implicit

        out, info = ba_solve_implicit(
            prob, cam, bacfg, num_fixed_poses=num_fixed, cg_iters=96
        )
    else:
        out, info = ba_solve(prob, cam, bacfg, num_fixed_poses=num_fixed)
    m = ops.scatter_window(m, out, ids, slot_valid, tables)
    return m, info.cost


class EdgeStore(NamedTuple):
    """Fixed-capacity pose-graph edge table (device-resident).

    `edge_s` is the measured relative SCALE of the edge (Sim(3) mono graphs,
    backend/pgo.py PgoSim3Problem): odometry edges carry 1.0 (tracking is
    locally scale-consistent), loop edges carry the scale fitted by Sim(3)
    verification (loop/verify.py). The SE(3) PGO path ignores it."""

    edge_i: jnp.ndarray  # (E,)
    edge_j: jnp.ndarray
    edge_T: jnp.ndarray  # (E, 4, 4)
    edge_s: jnp.ndarray  # (E,) measured relative scale (1.0 for SE(3))
    edge_weight: jnp.ndarray  # (E,)
    count: jnp.ndarray  # int32
    overflow: jnp.ndarray  # int32: edges dropped because the table was full

    @staticmethod
    def empty(capacity: int) -> "EdgeStore":
        return EdgeStore(
            edge_i=jnp.zeros((capacity,), jnp.int32),
            edge_j=jnp.zeros((capacity,), jnp.int32),
            edge_T=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            edge_s=jnp.ones((capacity,), jnp.float32),
            edge_weight=jnp.zeros((capacity,), jnp.float32),
            count=jnp.asarray(0, jnp.int32),
            overflow=jnp.asarray(0, jnp.int32),
        )


@jax.jit
def _add_edge(es: EdgeStore, i, j, T, w, enabled=True, s=1.0):
    """Append an edge; `enabled=False` (traced) makes it a masked no-op
    (writes go out of bounds and are dropped) — the TPU-idiomatic
    conditional for the fused chunk path.

    A full table DROPS the edge and counts it in `overflow` (surfaced in
    RunResult.diagnostics) — never a silent overwrite (SURVEY.md §7.3.2,
    same contract as the landmark arena, runtime/arena.py)."""
    E = es.edge_i.shape[0]
    en = jnp.asarray(enabled)
    fits = es.count < E
    at = jnp.where(en & fits, es.count, E + 1)
    return es._replace(
        edge_i=es.edge_i.at[at].set(i, mode="drop"),
        edge_j=es.edge_j.at[at].set(j, mode="drop"),
        edge_T=es.edge_T.at[at].set(T, mode="drop"),
        edge_s=es.edge_s.at[at].set(s, mode="drop"),
        edge_weight=es.edge_weight.at[at].set(w, mode="drop"),
        count=es.count + (en & fits).astype(jnp.int32),
        overflow=es.overflow + (en & ~fits).astype(jnp.int32),
    )


@jax.jit
def _apply_loop_scale(m: MapState, es: EdgeStore, kf_cand, kf_cur, s):
    """Mono Sim(3) closure: renormalize map scale + the span's odometry edges.

    ops.apply_scale_correction scales every chain delta in (cand, cur] by s
    (uniform — mono scale drift persists once it slips); the stored odometry
    edge measurements inside the span must scale consistently, otherwise the
    SE(3) PGO would fight the renormalization with stale-scale edges.
    """
    m = ops.apply_scale_correction(m, kf_cand, kf_cur, s)
    # Odometry edges carry weight <= 1.0 (span tracking quality); loop edges
    # are floored at 1.5 — the weight discriminates the two classes.
    in_span = (es.edge_j > kf_cand) & (es.edge_j <= kf_cur) & (es.edge_weight <= 1.0)
    scale_e = jnp.where(in_span, s, 1.0)
    edge_T = es.edge_T.at[:, :3, 3].multiply(scale_e[:, None])
    return m, es._replace(edge_T=edge_T)


@partial(jax.jit, static_argnames=("cfg",))
def _run_pgo(m: MapState, es: EdgeStore, cfg: SlamConfig):
    prob = PgoProblem(
        T_wc=m.kf_T_wc,
        node_valid=m.kf_valid,
        edge_i=es.edge_i,
        edge_j=es.edge_j,
        edge_T=es.edge_T,
        edge_weight=es.edge_weight * (jnp.arange(es.edge_i.shape[0]) < es.count),
    )
    out, info = pgo_solve(prob, cfg.pgo, num_fixed=1, cg_iters=60)
    m = ops.apply_pose_corrections(m, out.T_wc)
    return m, info.cost


@partial(jax.jit, static_argnames=("cfg",))
def _run_pgo_sim3(m: MapState, es: EdgeStore, cfg: SlamConfig):
    """Mono pose-graph optimization over Sim(3) (Strasdat RSS 2010 /
    ORB-SLAM essential graph): node scales let the solver distribute a
    loop's observed scale error SMOOTHLY along the odometry chain, weighted
    by each edge's information — which the previous uniform span
    renormalization (_apply_loop_scale) could not (it assumed one shared
    factor across the whole span; scale drift that accumulates gradually
    needs a per-node profile).

    Three safeguards, each answering a measured round-5 production failure
    (scripts/diag_pgo_consistency.py on the 4,500-frame rehearsal, where
    the unguarded version warped the map until PnP tracking collapsed):

    - Per-edge SCALE-residual weighting (PgoSim3Problem.edge_scale_w): on
      a near-chain graph the node scales are the underconstrained
      direction and soak up translation noise as +-15% oscillation.
      Odometry edges (consecutive keyframes) are locally scale-consistent,
      so their log-scale component carries `odo` weight; loop edges keep
      the verified scale at moderate weight.
    - Wide sanity clip on applied node scales ([0.2, 5]): a NaN/blowup
      guard only. A tight clamp is NOT safe here — the poses adopt the
      solve exactly, so transporting edges with differently-clamped scales
      would inject false tension (measured: a 0.75 floor against a 0.63
      solution pushed the recovered chain from 0.11 back to 0.50 RMSE on
      the next solve).
    - CHAIN-EDGE RE-MEASUREMENT instead of scale fold-back: after applying
      the corrections, every consecutive-keyframe edge's stored measurement
      is recomputed from the corrected poses (edge_s = 1). The previous
      fold-back (t *= s_i, s *= s_i/s_j) is only exact at r = 0; at partial
      convergence it baked each solve's scale noise into the stored chain
      (measured: odometry edges carrying 0.82-1.15 after three solves) and
      compounded solve over solve. Loop edges are the exception: they KEEP
      their independently verified measurement (transported by the bounded
      fold-back) so unconverged loop tension keeps pulling in later solves
      instead of being erased.
    """
    K = m.kf_T_wc.shape[0]
    live = (jnp.arange(es.edge_i.shape[0]) < es.count).astype(jnp.float32)
    is_chain = es.edge_j - es.edge_i == 1
    scale_w = jnp.where(is_chain, 8.0, 1.0)
    prob = PgoSim3Problem(
        T_wc=m.kf_T_wc,
        s_wc=jnp.ones((K,), m.kf_T_wc.dtype),
        node_valid=m.kf_valid,
        edge_i=es.edge_i,
        edge_j=es.edge_j,
        edge_T=es.edge_T,
        edge_s=es.edge_s,
        edge_weight=es.edge_weight * live,
        edge_scale_w=scale_w,
    )
    out, info = pgo_solve_sim3(prob, cfg.pgo, num_fixed=1, cg_iters=60)
    s_applied = jnp.clip(out.s_wc, 0.2, 5.0)
    m = ops.apply_pose_corrections_sim3(m, out.T_wc, s_applied)
    # Chain edges: exact re-measurement from corrected poses.
    T_rel = se3.inverse(m.kf_T_wc[es.edge_i]) @ m.kf_T_wc[es.edge_j]
    si = s_applied[es.edge_i]
    sj = s_applied[es.edge_j]
    live_m = (jnp.arange(es.edge_i.shape[0]) < es.count) & is_chain
    # Loop edges: transport the verified measurement into the corrected
    # frame (t *= s_i, s *= s_i/s_j) — bounded by the clamp above and does
    # not compound through the chain.
    T_loop = es.edge_T.at[:, :3, 3].multiply(si[:, None])
    es = es._replace(
        edge_T=jnp.where(live_m[:, None, None], T_rel, T_loop),
        edge_s=jnp.where(
            live_m, 1.0, es.edge_s * si / jnp.maximum(sj, 1e-12)
        ),
    )
    return m, es, info.cost


class SlamCarry(NamedTuple):
    """Full SLAM state as a scan carry: the chunked path keeps the entire
    optimize/match loop in HBM (BASELINE.json:5) — one dispatch per N
    frames, one packed (N, 45) readback."""

    m: MapState
    es: EdgeStore
    kf_feats: FrameFeatures
    T_cur: jnp.ndarray  # (4, 4)
    last_rel: jnp.ndarray  # (4, 4)
    kf_id: jnp.ndarray  # i32
    frames_since_kf: jnp.ndarray  # i32
    span_min_inl: jnp.ndarray  # i32 (tracking quality over the KF span)
    span_fallbacks: jnp.ndarray  # i32
    # Consecutive chunks whose LAST frame was a fallback — unlike
    # span_fallbacks this does NOT reset when a keyframe is inserted, so it
    # measures sustained tracking loss across bridged keyframes. Gates
    # new-landmark triangulation (see _slam_chunk's health gate).
    unhealthy_chunks: jnp.ndarray  # i32
    num_loops: jnp.ndarray  # i32
    ring: MetricsRing
    key: jax.Array


# Plain int (becomes a traced constant at use sites): a module-level device
# array would die across a tunnel-client reset (runtime/hostsync.py).
_SPAN_INIT = 10**9


def _relocalize(m: MapState, feats: FrameFeatures, vocab, key, cfg: SlamConfig,
                cam: Camera):
    """Global relocalization after tracking loss (SURVEY C18; the reference
    family's ORB-SLAM-style 'relocalisation' state).

    Local tracking (_track) gates matches to a projection radius around the
    motion-model prediction — once the pose estimate is wrong the gate
    itself guarantees zero matches, so the tracker can never re-lock on its
    own. This stage drops the spatial gate entirely: retrieve the most
    similar keyframe from the device-resident word-histogram DB (one IDF
    GEMV — the loop-closure machinery, minus the recency exclusions, since
    the best relocalization candidate is usually RECENT), match the frame's
    descriptors against that keyframe's observed landmarks, and PnP.

    Returns (T_wc, num_inliers, ok). Runs under a chunk-level lax.cond, so
    healthy chunks never pay for it.
    """
    from laneslam.loop.kfdb import idf_weights

    agg = aggregate_descriptor(feats.point_desc, feats.points.valid, vocab)
    w = idf_weights(m.kf_agg_desc, m.kf_valid)
    db = m.kf_agg_desc * w[None, :]
    db = db / jnp.maximum(jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
    q = agg * w
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    sim = jnp.where(m.kf_valid, db @ q, -1e9)
    best = jnp.argmax(sim)

    row = m.obs_pt_idx[best]  # (Op,)
    row_ok = (row >= 0) & m.pt_valid[jnp.maximum(row, 0)]
    desc = m.pt_desc[jnp.maximum(row, 0)]
    matches = match_descriptors(
        feats.point_desc, desc, feats.points.valid, row_ok,
        ratio=cfg.match.ratio, cross_check=True, allow_pallas=False,
    )
    lm = row[jnp.maximum(matches.idx, 0)]
    X = m.pt_xyz[jnp.maximum(lm, 0)]
    res = solve_pnp_ransac(
        cam, X, feats.points.uv, matches.valid, key,
        num_hypotheses=cfg.frontend.pnp_hypotheses,
        inlier_px=cfg.frontend.track_inlier_px,
    )
    T_wc = se3.inverse(res.T_cw)
    ok = (
        (res.num_inliers >= cfg.frontend.reloc_min_inliers)
        & jnp.all(jnp.isfinite(T_wc))
    )
    return T_wc, res.num_inliers, ok


_relocalize_jit = jax.jit(_relocalize, static_argnames=("cfg", "cam"))


def _np_rot_log(R: np.ndarray) -> np.ndarray:
    """SO(3) log (numpy, host-side trajectory repair)."""
    cos = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = float(np.arccos(cos))
    if th < 1e-8:
        return np.zeros(3, np.float32)
    v = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], np.float32
    )
    return v * (th / (2.0 * np.sin(th)))


def _np_rot_exp(w: np.ndarray) -> np.ndarray:
    th = float(np.linalg.norm(w))
    if th < 1e-8:
        return np.eye(3, dtype=np.float32)
    k = w / th
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float32
    )
    return (
        np.eye(3, dtype=np.float32)
        + np.sin(th) * K
        + (1.0 - np.cos(th)) * (K @ K)
    )


@partial(jax.jit, static_argnames=("cfg",))
def _extract_chunk(imgs: jnp.ndarray, cfg: SlamConfig) -> FrameFeatures:
    """Feature extraction for a whole chunk, as its OWN dispatch.

    Deliberately a separate XLA program from _slam_chunk: inside the fused
    mega-program, XLA's memory-space assignment evicted the LSD label-
    propagation state from VMEM (profiled: the label sweep while-loop spent
    ~22 ms/frame blocked on HBM DMA vs ~10 us/frame when extraction
    compiles standalone). Two dispatches per chunk cost ~0.2 ms through the
    tunnel — 100x less than the VMEM eviction did.

    lax.scan over the frames, NOT vmap: vmapping the LSD label-propagation
    while-loop batches its (H, W) label state out of VMEM again (measured
    119 ms/frame vmapped vs ~1 ms scanned).
    """
    _, feats = jax.lax.scan(
        lambda c, im: (c, extract_features(im, cfg)), jnp.zeros(()), imgs
    )
    return feats


@partial(
    jax.jit, static_argnames=("cfg", "cam", "enable_ba", "enable_loop", "stereo")
)
def _slam_chunk(
    carry: SlamCarry,
    feats_chunk: FrameFeatures,  # stacked (N, ...) features of the chunk
    vocab: jnp.ndarray,
    cfg: SlamConfig,
    cam: Camera,
    enable_ba: bool = True,
    enable_loop: bool = True,
    stereo: bool = False,
    feats_right_last: Optional[FrameFeatures] = None,
):
    """N SLAM frames in ONE device dispatch (configs 2/3/4), keyframe
    cadence of AT MOST one keyframe per chunk: exactly one when
    cfg.frontend.chunk_adaptive_kf is False (default, the round-4 fixed
    cadence), else gated on the span's keyframe-decision signals via a
    chunk-level lax.cond (VERDICT r4 #4).

    Stereo (config 4): tracking is identical (mono PnP against the metric
    map); only the keyframe block differs — the chunk's LAST frame
    stereo-matches against `feats_right_last` and births metric landmarks
    (_make_keyframe_stereo). Right-image extraction therefore runs at
    KEYFRAME cadence (1 per chunk), not frame cadence, and loop
    verification fits SE(3) (no scale renormalization).

    Structure (the optimize/match loop never leaves HBM, BASELINE.json:5):
      1. lax.scan over the N frames: extract + track only. The map is a
         closure constant during the scan (no keyframe mid-chunk), so the
         carry stays small.
      2. ONE backend block on the chunk's last frame: make-keyframe + cull
         + window BA + loop retrieve/verify + PGO. Conditionality at the
         CHUNK level only (one lax.cond per dispatch, adaptive mode);
         within the block it is masking (OOB-dropped scatters), never a
         per-frame cond: measured on this backend, a dynamic cond inside
         the scan executes at taken-branch cost EVERY iteration
         (112 ms/frame vs 24 with the cond removed).

    Returns (carry, (packed (N, 36), kf_stats (29,))). packed rows follow
    _track_step's layout. kf_stats: [0:16] final last-frame pose (refined
    by BA/PGO and, if it fired, relocalization), [16] kf_id, [17] new_pts,
    [18] new_lines, [19] ba_cost0, [20] ba_costN, [21] loop_accepted,
    [22] loop_cand, [23] loop_inliers, [24] loop_scale,
    [25] span_fallbacks over the chunk, [26] made_kf (0 when the health /
    adaptive gate skipped the keyframe; kf_id/new_* are -1 then),
    [27] relocalized, [28] reloc inliers.
    """
    f32 = jnp.float32
    m = carry.m  # constant through the tracking scan
    kf_id = carry.kf_id

    def frame_step(c, feats):
        T_cur, last_rel, fsk, feats_prev, lm_prev, inl_prev, span_min, span_fb, ring, key = c
        key, k = jax.random.split(key)
        fsk = fsk + 1
        T_wc, cur_lm, inl_mask, last_rel2, packed, ring = _track_step(
            m, feats, T_cur, last_rel, kf_id, fsk, ring, k, cfg, cam
        )
        n_inl = packed[32].astype(jnp.int32)
        fallback = packed[34] > 0
        span_min = jnp.where(fallback, span_min, jnp.minimum(span_min, n_inl))
        span_fb = span_fb + fallback.astype(jnp.int32)
        return (
            T_wc, last_rel2, fsk, feats, cur_lm, inl_mask, span_min, span_fb,
            ring, key,
        ), packed

    c0 = (
        carry.T_cur, carry.last_rel, carry.frames_since_kf,
        carry.kf_feats,
        jnp.full((cfg.points.max_points,), -1, jnp.int32),
        jnp.zeros((cfg.points.max_points,), bool),
        carry.span_min_inl, carry.span_fallbacks, carry.ring, carry.key,
    )
    (T_last, last_rel, fsk, feats_last, lm_last, inl_last, span_min, span_fb,
     ring, key), packed = jax.lax.scan(frame_step, c0, feats_chunk)

    # ---- keyframe + backend block (at most once per chunk), gated by the
    # span's KEYFRAME DECISION (VERDICT r4 #4): a second chunk-level
    # lax.cond — the per-frame tracked-ratio/parallax/interval signals
    # already ride in packed[:, 35]; when no frame in the span asked for a
    # keyframe, the whole make-keyframe/cull/BA/loop block is skipped at
    # runtime and the span (frames_since_kf, quality stats) carries into
    # the next chunk. Cadence is therefore <= 1 KF/chunk: with
    # kf_max_interval <= chunk_frames this reduces to the round-4 fixed
    # cadence (the interval rule fires every chunk); with a larger interval
    # low-motion spans stop bloating the map. (A PER-FRAME cond inside the
    # scan is NOT equivalent: measured round 4, a dynamic cond inside scan
    # executes at taken-branch cost every iteration.)
    key, k_loop = jax.random.split(key)
    want_kf = jnp.any(packed[:, 35] > 0)

    def _backend():
        if stereo:
            from laneslam.frontend.stereo import stereo_match

            depths = stereo_match(
                feats_last, feats_right_last, float(cam.fx), float(cam.baseline), cfg
            )
            m2, kf_id2, T_rel, n_p, n_l = _make_keyframe_stereo(
                m, kf_id, feats_last, depths, lm_last, inl_last,
                T_last, vocab, cfg, cam, allow_new=allow_new,
            )
        else:
            m2, kf_id2, T_rel, n_p, n_l = _make_keyframe(
                m, kf_id, carry.kf_feats, feats_last, lm_last, inl_last,
                T_last, vocab, cfg, cam, allow_new=allow_new,
            )
        w = jnp.clip(span_min.astype(f32) / 30.0, 0.15, 1.0)
        w = jnp.maximum(w * 0.3 ** jnp.minimum(span_fb, 4).astype(f32), 0.02)
        m2, _cp, _cl = ops.cull_landmarks(
            m2, min_obs=cfg.map.cull_min_obs, min_age_kf=cfg.map.cull_min_age_kf,
            pressure=cfg.map.cull_pressure,
        )
        ba_stats = jnp.zeros((2,), f32)
        if enable_ba:
            m2, ba_cost = _window_ba(m2, cfg, cam)
            ba_stats = jnp.stack([ba_cost[0], ba_cost[-1]])
        # Odometry edge measured from the POST-BA keyframe poses: the
        # tracked (pre-BA) relative pose drifts meters over a 10-frame
        # span, and a pose graph built from stale measurements caps what
        # ANY loop closure can recover (measured round 4: with pre-BA chain
        # edges, even a ground-truth loop edge improved the 150-frame loop
        # fixture's ATE by only 9%).
        T_rel_post = se3.inverse(m2.kf_T_wc[kf_id]) @ m2.kf_T_wc[kf_id2]
        es2 = _add_edge(carry.es, kf_id, kf_id2, T_rel_post, w)
        loop_stats = jnp.zeros((4,), f32)
        nloops = carry.num_loops
        if enable_loop:
            from laneslam.loop.verify import empty_batched_result

            cand_ids, _sims = query_kfdb(
                m2.kf_agg_desc, m2.kf_valid, m2.kf_agg_desc[kf_id2],
                kf_id2, cfg.loop, covis_row=m2.covis[kf_id2],
            )
            # Nested chunk-level lax.cond: when retrieval returns no
            # candidate above threshold, the whole verification stage is
            # skipped at runtime, and when no candidate verifies, the
            # edge/PGO stage is skipped. The steady-state chunk therefore
            # pays retrieval (one GEMV) only; verification + PGO cost lands
            # exactly on the chunks that close a loop. (Round-3 ran
            # verify+PGO unconditionally every chunk — both the throughput
            # red flag of VERDICT r3 and the ADVICE r3 high bug: chain-only
            # PGO converges to the odometry composition, silently
            # overwriting window-BA pose refinements every chunk.)
            lr = jax.lax.cond(
                jnp.any(cand_ids >= 0),
                lambda: verify_loops(
                    m2, kf_id2, cand_ids, k_loop, cfg.loop,
                    with_scale=not stereo, cam=cam,
                ),
                lambda: empty_batched_result(cand_ids.shape[0]),
            )

            mono_sim3 = (not stereo) and cfg.pgo.mono_sim3

            def _close(ops_):
                m_, es_ = ops_
                if not stereo and not mono_sim3:
                    # Round-4 ablation path: uniform Sim(3) renormalization
                    # from the best-supported edge, then SE(3) PGO.
                    s_eff = jnp.where(
                        jnp.abs(lr.scale - 1.0) > 0.02, lr.scale, 1.0
                    )
                    m_, es_ = _apply_loop_scale(
                        m_, es_, lr.best_cand, kf_id2, s_eff
                    )
                # EVERY verified candidate becomes a constraint (multi-pass
                # intersections close against several old keyframes at
                # once). Mono edges carry the verified relative scale; the
                # Sim(3) solver distributes scale drift along the chain.
                for c in range(lr.all_accepted.shape[0]):
                    w_c = jnp.clip(lr.all_inliers[c].astype(f32) / 12.0, 1.5, 6.0)
                    es_ = _add_edge(
                        es_, lr.all_cand[c], kf_id2, lr.all_T_rel[c], w_c,
                        enabled=lr.all_accepted[c],
                        s=lr.all_scale[c] if mono_sim3 else 1.0,
                    )
                if mono_sim3:
                    m_, es_, _cost = _run_pgo_sim3(m_, es_, cfg)
                else:
                    m_, _cost = _run_pgo(m_, es_, cfg)
                return m_, es_

            m2, es2 = jax.lax.cond(lr.accepted, _close, lambda o: o, (m2, es2))
            nloops = nloops + jnp.sum(lr.all_accepted).astype(jnp.int32)
            loop_stats = jnp.stack([
                lr.accepted.astype(f32), lr.best_cand.astype(f32),
                lr.num_inliers.astype(f32), lr.scale,
            ])
        T_after = m2.kf_T_wc[kf_id2]
        kf_stats = jnp.concatenate([
            T_after.reshape(-1),
            jnp.stack([kf_id2.astype(f32), n_p.astype(f32), n_l.astype(f32)]),
            ba_stats, loop_stats, span_fb.astype(f32)[None],
            jnp.ones((1,), f32),  # [26] made_kf
        ])
        return (
            m2, es2, kf_id2, feats_last, T_after,
            jnp.asarray(0, jnp.int32),          # frames_since_kf resets
            jnp.asarray(_SPAN_INIT, jnp.int32),  # span stats reset
            jnp.asarray(0, jnp.int32),
            nloops, kf_stats,
        )

    def _skip():
        kf_stats = jnp.concatenate([
            T_last.reshape(-1),
            jnp.full((3,), -1.0, f32),           # kf_id / n_p / n_l: none
            jnp.zeros((6,), f32),                # ba + loop stats
            span_fb.astype(f32)[None],
            jnp.zeros((1,), f32),                # [26] made_kf = 0
        ])
        return (
            m, carry.es, kf_id, carry.kf_feats, T_last,
            fsk, span_min, span_fb, carry.num_loops, kf_stats,
        )

    # Keyframe HEALTH gate (round 5): a tracking dropout is BRIDGED by
    # still inserting keyframes (a motion-model pose drifts boundedly, and
    # the refreshed reference re-seeds descriptor tracking — the round-4
    # behavior, which weak-texture fixtures depend on), but NEW-LANDMARK
    # TRIANGULATION stops after 2 consecutive unhealthy chunks: landmarks
    # triangulated from garbage baselines carry garbage scale that feeds
    # the next PnP and compounds |t| exponentially (measured: 50 -> 1e11
    # over 20 lost chunks on the 4,500-frame rehearsal). The counter is
    # chunk-level and does NOT reset on keyframe insertion — only a healthy
    # chunk clears it; long losses are relocalization's job (below).
    # A chunk is unhealthy when MOST of its frames found ZERO PnP inliers —
    # total map disagreement, the death-spiral signature. Sparse-but-
    # consistent tracking (a handful of inliers on weak-texture scenes)
    # must NOT trip the LOST state: those frames still localize roughly,
    # and the refreshed keyframes are what re-seed tracking (round-4
    # behavior the corridor fixtures depend on).
    chunk_healthy = jnp.mean((packed[:, 32] < 1.0).astype(f32)) < 0.7
    unhealthy2 = jnp.where(
        chunk_healthy, 0, carry.unhealthy_chunks + 1
    ).astype(jnp.int32)
    allow_new = carry.unhealthy_chunks < 2
    # Past the bridge budget the tracker is LOST: no keyframes at all —
    # garbage keyframes would enter the retrieval DB and outrank the
    # healthy keyframes of the same (revisited) view, starving
    # relocalization of its PnP support.
    not_lost = unhealthy2 < 2
    if cfg.frontend.chunk_adaptive_kf:
        outs = jax.lax.cond(want_kf & not_lost, _backend, _skip)
    else:
        # Fixed cadence (default): one keyframe every non-lost chunk.
        outs = jax.lax.cond(not_lost, _backend, _skip)
    (m2, es2, kf_id2, kf_feats2, T_after, fsk2, span_min2, span_fb2,
     nloops, kf_stats) = outs

    # Relocalization stage (tracking-loss recovery, SURVEY C18): once the
    # consecutive-fallback count crosses the threshold, try to re-lock
    # against the keyframe database. Cond-gated — healthy chunks skip it.
    # Trigger uses the SCAN's fallback count (span_fb) plus the sustained
    # unhealthy-chunk counter — span_fb2 is post-backend and resets to 0
    # whenever a keyframe was inserted, which under fixed cadence is every
    # chunk (so it alone would never trip).
    reloc_stat = jnp.zeros((2,), f32)
    if cfg.frontend.reloc_after > 0:
        key, k_rel = jax.random.split(key)
        lost = (span_fb >= cfg.frontend.reloc_after) | (unhealthy2 >= 2)

        def _try_reloc(args):
            T_c, lrel, fsk_, smin, sfb = args
            T_new, n_inl_r, ok = _relocalize(m2, feats_last, vocab, k_rel, cfg, cam)
            T_c = jnp.where(ok, T_new, T_c)
            lrel = jnp.where(ok, jnp.eye(4, dtype=f32), lrel)
            # Force a keyframe on the next healthy chunk: the re-locked
            # span needs fresh map support immediately.
            fsk_ = jnp.where(
                ok, jnp.asarray(cfg.frontend.kf_max_interval, jnp.int32), fsk_
            )
            smin = jnp.where(ok, jnp.asarray(_SPAN_INIT, jnp.int32), smin)
            sfb = jnp.where(ok, 0, sfb)
            return T_c, lrel, fsk_, smin, sfb, jnp.stack(
                [ok.astype(f32), n_inl_r.astype(f32)]
            )

        def _no_reloc(args):
            T_c, lrel, fsk_, smin, sfb = args
            return T_c, lrel, fsk_, smin, sfb, jnp.zeros((2,), f32)

        (T_after, last_rel, fsk2, span_min2, span_fb2, reloc_stat) = jax.lax.cond(
            lost, _try_reloc, _no_reloc,
            (T_after, last_rel, fsk2, span_min2, span_fb2),
        )
    # kf_stats[0:16] must reflect the FINAL pose (ingest uses it for the
    # last frame's trajectory entry); [27:29] = (relocalized?, inliers).
    kf_stats = jnp.concatenate(
        [T_after.reshape(-1), kf_stats[16:], reloc_stat]
    )
    unhealthy2 = jnp.where(reloc_stat[0] > 0, 0, unhealthy2)
    c2 = SlamCarry(
        m=m2, es=es2, kf_feats=kf_feats2, T_cur=T_after, last_rel=last_rel,
        kf_id=kf_id2, frames_since_kf=fsk2,
        span_min_inl=span_min2, span_fallbacks=span_fb2,
        unhealthy_chunks=unhealthy2,
        num_loops=nloops, ring=ring, key=key,
    )
    return c2, (packed, kf_stats)


# --------------------------------------------------------------------------
# host orchestrator
# --------------------------------------------------------------------------


class SlamSystem:
    def __init__(self, cfg: SlamConfig, cam: Camera, seed: int = 0,
                 enable_loop: bool = True, enable_ba: bool = True,
                 stereo: bool = False, rectify=None):
        """rectify: optional (RectifyParams, RectifyParams) for a distorted
        unrectified pair (real EuRoC); `cam` must then be the RECTIFIED
        pinhole model (K_new + baseline from geometry.undistort.stereo_rectify).
        """
        import dataclasses

        # Observation rows are feature-slot aligned (see module docstring):
        # their capacities are derived from the feature configs.
        cfg = cfg.override(
            map=dataclasses.replace(
                cfg.map,
                max_obs_per_kf=cfg.points.max_points,
                max_line_obs_per_kf=cfg.lsd.max_segments,
            )
        )
        self.cfg = cfg
        self.cam = cam
        self.key = jax.random.PRNGKey(seed)
        self.map = make_empty_map(
            cfg.map, pt_desc_dim=cfg.points.desc_dim, ln_desc_dim=cfg.lbd.desc_dim,
            agg_dim=cfg.loop.vocab_size,
        )
        self._vocab = codebook(cfg.loop.vocab_size, cfg.points.desc_dim)
        self.edges = EdgeStore.empty(4 * cfg.map.max_keyframes)
        self.enable_loop = enable_loop
        self.enable_ba = enable_ba
        self.stereo = stereo and cam.baseline > 0
        self.kf_feats: Optional[FrameFeatures] = None  # features of last KF
        self.kf_id = None
        self.bootstrapped = False
        self.frames_since_kf = 0
        self.T_cur = jnp.eye(4)
        self._last_rel = jnp.eye(4)  # constant-velocity fallback motion
        self.poses: list = []
        # Per-frame (ref_kf_id, T_ref_frame): frames recompose against the
        # FINAL keyframe poses so loop closures correct the whole trajectory.
        self.frame_refs: list = []
        self.stats: list = []
        self.num_loops = 0
        # Tracking quality over the current inter-keyframe span, feeding the
        # odometry edge's information weight (see _odom_weight): a span with
        # motion-model fallbacks or thin PnP support produced a LOW-quality
        # relative pose, and PGO should prefer to absorb loop-closure
        # corrections there. With uniform weights one bad edge redistributes
        # its error into good poses (measured: PGO degraded keyframe ATE
        # 0.71 -> 0.87 until the bad edge was down-weighted; 0.41 after).
        self._span_min_inl = 10 ** 9
        self._span_fallbacks = 0
        self._unhealthy_chunks = 0
        self._kf_id_host = -1
        self.metrics_ring = _fresh_ring()
        self.rectify = rectify
        # Deferred-readback chunk mode (runtime/hostsync.py): process_chunk
        # keeps its outputs as opaque device arrays and the host bookkeeping
        # is reconstructed in ONE transfer at flush_chunks() — the
        # steady-state loop stays readback-free, which on the tunneled
        # client is worth ~100x dispatch throughput.
        self.defer_readback = False
        self._pending_chunks: list = []  # (n_frames, packed, kf_stats, kf_after)
        self._num_loops_dev = None  # device-side loop counter while deferring

    def _odom_weight(self) -> float:
        w = min(max(self._span_min_inl / 30.0, 0.15), 1.0)
        w *= 0.3 ** min(self._span_fallbacks, 4)
        self._span_min_inl = 10 ** 9
        self._span_fallbacks = 0
        return max(w, 0.02)

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _maybe_sync(self):
        """LANESLAM_SYNC=1 (SURVEY.md §5.2b): force every in-flight device
        computation to finish before the next frame. Async-overlap bugs
        (donated-buffer reuse, stale dispatch ordering) would make sync and
        async runs diverge; tests assert the trajectories are identical."""
        if os.environ.get("LANESLAM_SYNC", "0") == "1":
            jax.block_until_ready((self.map, self.edges, self.T_cur))

    def _record_ref(self, T_wc):
        if self.kf_id is None:
            self.frame_refs.append((-1, np.eye(4, dtype=np.float32)))
        else:
            T_kf = self.map.kf_T_wc[self.kf_id]
            rel = np.asarray(se3.inverse(T_kf) @ jnp.asarray(T_wc), np.float32)
            self.frame_refs.append((int(self.kf_id), rel))

    def process_frame(
        self, img: np.ndarray, img_right: Optional[np.ndarray] = None
    ) -> np.ndarray:
        if self._pending_chunks:
            self.flush_chunks()  # keep pose/stat ordering with deferred chunks
        cfg, cam = self.cfg, self.cam
        feats = extract_features(jnp.asarray(img, jnp.float32), cfg)
        if self.rectify is not None:
            feats = _rectify_feats(feats, self.rectify[0])
        depths = None
        if self.stereo and img_right is not None:
            from laneslam.frontend.stereo import stereo_match

            feats_r = extract_features(jnp.asarray(img_right, jnp.float32), cfg)
            if self.rectify is not None:
                feats_r = _rectify_feats(feats_r, self.rectify[1])
            depths = stereo_match(
                feats, feats_r, float(cam.fx), float(cam.baseline), cfg
            )

        if self.stereo and not self.bootstrapped:
            # Stereo bootstrap: the very first pair births a metric map.
            if depths is None or int(depths.pt_valid.sum()) < cfg.frontend.min_track_inliers:
                self.poses.append(np.eye(4, dtype=np.float32))
                return self.poses[-1]
            Kc = feats.points.uv.shape[0]
            no_lm = jnp.full((Kc,), -1, jnp.int32)
            no_inl = jnp.zeros((Kc,), bool)
            m, kf0, _, n_p, n_l = _make_keyframe_stereo(
                self.map, jnp.asarray(0), feats, depths, no_lm, no_inl,
                jnp.eye(4), self._vocab, cfg, cam,
            )
            self.map = m
            self.kf_id = kf0
            self._kf_id_host = int(kf0)
            self.kf_feats = feats
            self.bootstrapped = True
            self.frames_since_kf = 0
            self.poses.append(np.eye(4, dtype=np.float32))
            self._record_ref(self.poses[-1])
            self.stats.append({"event": "stereo_bootstrap", "points": int(n_p),
                               "lines": int(n_l)})
            return self.poses[-1]

        if self.kf_feats is None:
            # First frame: keyframe 0 at the origin with no landmarks yet.
            agg = aggregate_descriptor(feats.point_desc, feats.points.valid, self._vocab)
            Kc = feats.points.uv.shape[0]
            Kl = feats.segments.xyxy.shape[0]
            self.map, kf0 = ops.insert_keyframe(
                self.map, jnp.eye(4),
                jnp.full((Kc,), -1, jnp.int32), feats.points.uv,
                jnp.full((Kl,), -1, jnp.int32), feats.segments.xyxy, agg,
            )
            self.kf_id = kf0
            self._kf_id_host = int(kf0)
            self.kf_feats = feats
            self.poses.append(np.eye(4, dtype=np.float32))
            self._record_ref(self.poses[-1])
            return self.poses[-1]

        if not self.bootstrapped:
            T_wc1, pm, lm, X, okX, L, okL, n_inl = _bootstrap_pair(
                self.kf_feats, feats, self._split(), cfg, cam
            )
            if int(n_inl) < cfg.frontend.kf_min_inliers or int(jnp.sum(okX)) < 15:
                if int(n_inl) < cfg.frontend.kf_min_inliers:
                    # Overlap with the reference frame has decayed (rotation,
                    # occlusion): re-seat the bootstrap reference on the
                    # current frame instead of waiting forever.
                    self.kf_feats = feats
                # else: good matches but not enough parallax — keep waiting.
                self.poses.append(self.poses[-1])
                self._record_ref(self.poses[-1])
                return self.poses[-1]
            # Insert landmarks anchored at KF0 slots + keyframe 1.
            m = self.map
            m, pids = ops.add_points(
                m, X, self.kf_feats.point_desc, okX,
                jnp.full(X.shape[0], 0, jnp.int32),
            )
            m, lids = ops.add_lines(
                m, L, self.kf_feats.line_desc, okL,
                jnp.full(L.shape[0], 0, jnp.int32),
            )
            # Write KF0 observation rows (slot-aligned with kf_feats).
            m = m._replace(
                obs_pt_idx=m.obs_pt_idx.at[0].set(pids),
                obs_ln_idx=m.obs_ln_idx.at[0].set(lids),
            )
            # KF1 observation rows: landmark per cur slot via the matches.
            Kc = feats.points.uv.shape[0]
            tgt = jnp.where(pm.valid & (pids >= 0), pm.idx, Kc + 1)
            slot_lm = jnp.full((Kc,), -1, jnp.int32).at[tgt].set(pids, mode="drop")
            Kl = feats.segments.xyxy.shape[0]
            tgt_l = jnp.where(lm.valid & (lids >= 0), lm.idx, Kl + 1)
            slot_ln = jnp.full((Kl,), -1, jnp.int32).at[tgt_l].set(lids, mode="drop")
            agg = aggregate_descriptor(feats.point_desc, feats.points.valid, self._vocab)
            m, kf1 = ops.insert_keyframe(
                m, T_wc1, slot_lm, feats.points.uv, slot_ln, feats.segments.xyxy, agg
            )
            self.edges = _add_edge(
                self.edges, jnp.asarray(0), kf1, se3.inverse(jnp.eye(4)) @ T_wc1,
                jnp.asarray(1.0),
            )
            self.map = m
            self.kf_id = kf1
            self._kf_id_host = int(kf1)
            self.kf_feats = feats
            self.T_cur = T_wc1
            self.bootstrapped = True
            self._last_rel = T_wc1
            self.frames_since_kf = 0
            self.poses.append(np.asarray(T_wc1, np.float32))
            self._record_ref(self.poses[-1])
            self.stats.append({"event": "bootstrap", "inliers": int(n_inl)})
            return self.poses[-1]

        # --- tracking (one fused jit dispatch, one 38-float readback) ---
        self.frames_since_kf += 1
        T_wc, cur_lm, inl_mask, last_rel, packed, self.metrics_ring = _track_step(
            self.map, feats, self.T_cur, self._last_rel,
            self.kf_id, jnp.asarray(self.frames_since_kf, jnp.int32),
            self.metrics_ring, self._split(), cfg, cam,
        )
        arr = np.asarray(packed)  # the frame's single host<-device sync
        n_inl_i = int(arr[32])
        n_tracked = int(arr[33])
        fallback = bool(arr[34])
        make_kf = bool(arr[35])
        self._last_rel = last_rel
        self.T_cur = T_wc
        if fallback:
            self._span_fallbacks += 1
        else:
            self._span_min_inl = min(self._span_min_inl, n_inl_i)
        self.poses.append(arr[:16].reshape(4, 4).astype(np.float32))

        stat = {"inliers": n_inl_i, "tracked": n_tracked,
                "kf": make_kf or fallback}

        # Tracking-loss recovery (same stage as the chunk path; see
        # _relocalize). The per-frame path pays one extra dispatch only on
        # lost frames.
        if (
            cfg.frontend.reloc_after > 0
            and self._span_fallbacks >= cfg.frontend.reloc_after
            and self.bootstrapped
        ):
            T_new, n_inl_r, ok = _relocalize_jit(
                self.map, feats, self._vocab, self._split(), cfg, cam
            )
            if bool(np.asarray(ok)):
                self.T_cur = T_new
                self._last_rel = jnp.eye(4)
                self._span_fallbacks = 0
                self._span_min_inl = _SPAN_INIT
                self._unhealthy_chunks = 0
                self.frames_since_kf = cfg.frontend.kf_max_interval
                self.poses[-1] = np.asarray(T_new, np.float32)
                stat["reloc"] = True
                stat["reloc_inliers"] = int(np.asarray(n_inl_r))
                self.stats.append(stat)
                self.frame_refs.append((-1, self.poses[-1]))
                self._repair_lost_span()
                self._maybe_sync()
                return self.poses[-1]

        if make_kf:
            if self.stereo and depths is not None:
                m, kf_id, T_rel, n_new_p, n_new_l = _make_keyframe_stereo(
                    self.map, self.kf_id, feats, depths, cur_lm, inl_mask,
                    T_wc, self._vocab, cfg, cam,
                )
            else:
                m, kf_id, T_rel, n_new_p, n_new_l = _make_keyframe(
                    self.map, self.kf_id, self.kf_feats, feats, cur_lm, inl_mask,
                    T_wc, self._vocab, cfg, cam,
                )
            kf_prev = self.kf_id  # odometry edge added post-BA (see below)
            self.map = m
            self.kf_id = kf_id
            self.kf_feats = feats
            self.frames_since_kf = 0
            # Keyframe-block stats: ONE bundled readback instead of a
            # separate sync per scalar (keyframes are ~1/10 frames, but the
            # old pattern cost 4-8 round-trips each).
            kf_arr = np.asarray(jnp.stack([kf_id, n_new_p, n_new_l]))
            kf_id_host = self._kf_id_host = int(kf_arr[0])
            stat["new_points"] = int(kf_arr[1])
            stat["new_lines"] = int(kf_arr[2])

            ci = cfg.map.cull_interval
            if ci > 0 and kf_id_host % ci == ci - 1:
                self.map, n_cp, n_cl = _cull(
                    self.map, cfg.map.cull_min_obs, cfg.map.cull_min_age_kf,
                    cfg.map.cull_pressure,
                )
                cull_arr = np.asarray(jnp.stack([n_cp, n_cl]))
                stat["culled_points"] = int(cull_arr[0])
                stat["culled_lines"] = int(cull_arr[1])

            if self.enable_ba:
                self.map, ba_cost = _window_ba(self.map, cfg, cam)
                self.T_cur = self.map.kf_T_wc[kf_id]
                ba_arr = np.asarray(
                    jnp.concatenate([ba_cost[:1], ba_cost[-1:], self.T_cur.reshape(-1)])
                )
                self.poses[-1] = ba_arr[2:18].reshape(4, 4).astype(np.float32)
                stat["ba_cost0"] = float(ba_arr[0])
                stat["ba_costN"] = float(ba_arr[1])

            # Odometry edge measured from the POST-BA keyframe poses (the
            # chunk path does the same): pre-BA tracked relatives drift
            # meters over a span and poison the pose graph — measured round
            # 4 on the 150-frame loop fixture, chain edges carried up to
            # 1.9 m error vs GT and even a ground-truth loop edge then
            # improved ATE by only 9%.
            self.edges = _add_edge(
                self.edges, kf_prev, kf_id,
                se3.inverse(self.map.kf_T_wc[kf_prev]) @ self.map.kf_T_wc[kf_id],
                jnp.asarray(self._odom_weight(), jnp.float32),
            )

            if self.enable_loop:
                cand_ids, sims = query_kfdb(
                    self.map.kf_agg_desc, self.map.kf_valid,
                    self.map.kf_agg_desc[kf_id], kf_id, cfg.loop,
                    covis_row=self.map.covis[kf_id],
                )
                # Retrieval ranks coarsely; geometric verification is the
                # discriminative stage — all top-k candidates verify in ONE
                # vmapped dispatch (mono fits Sim(3): drift includes scale).
                lr = verify_loops(
                    self.map, kf_id, cand_ids, self._split(), cfg.loop,
                    with_scale=not self.stereo, cam=cam,
                )
                lr_arr = np.asarray(
                    jnp.concatenate([
                        jnp.stack([
                            lr.accepted.astype(jnp.float32),
                            lr.best_cand.astype(jnp.float32),
                            lr.num_inliers.astype(jnp.float32),
                            lr.scale,
                        ]),
                        lr.all_accepted.astype(jnp.float32),
                    ])
                )
                if bool(lr_arr[0]):
                    # EVERY verified candidate becomes an edge (multi-pass
                    # intersections close against several old keyframes).
                    # Edge information scales with verified support (a
                    # 60-inlier pixel-refined edge is far more accurate than
                    # a 12-inlier one); floor 1.5 keeps loop edges above the
                    # odometry edges so closures actually correct. Mono
                    # edges carry the verified relative scale and solve over
                    # Sim(3) (_run_pgo_sim3) — scale drift distributes along
                    # the chain instead of a uniform span renormalization.
                    mono_sim3 = (not self.stereo) and cfg.pgo.mono_sim3
                    if not self.stereo and not mono_sim3:
                        s_eff = jnp.where(
                            jnp.abs(lr.scale - 1.0) > 0.02, lr.scale, 1.0
                        )
                        self.map, self.edges = _apply_loop_scale(
                            self.map, self.edges, lr.best_cand, kf_id, s_eff
                        )
                    for c in range(int(lr.all_accepted.shape[0])):
                        w_c = jnp.clip(
                            lr.all_inliers[c].astype(jnp.float32) / 12.0, 1.5, 6.0
                        )
                        self.edges = _add_edge(
                            self.edges, lr.all_cand[c], kf_id, lr.all_T_rel[c],
                            w_c, enabled=lr.all_accepted[c],
                            s=lr.all_scale[c] if mono_sim3 else 1.0,
                        )
                    if mono_sim3:
                        self.map, self.edges, pgo_cost = _run_pgo_sim3(
                            self.map, self.edges, cfg
                        )
                    else:
                        self.map, pgo_cost = _run_pgo(self.map, self.edges, cfg)
                    self.T_cur = self.map.kf_T_wc[kf_id]
                    self.poses[-1] = np.asarray(self.T_cur, np.float32)
                    self.num_loops += int(lr_arr[4:].sum())
                    stat["loop"] = int(lr_arr[1])
                    stat["loop_inliers"] = int(lr_arr[2])
                    stat["loop_scale"] = float(lr_arr[3])

            # Post-BA/PGO the stored keyframe pose IS this frame's pose.
            self.stats.append(stat)
            self.frame_refs.append((kf_id_host, np.eye(4, dtype=np.float32)))
            self._maybe_sync()
            return self.poses[-1]

        self.stats.append(stat)
        self.frame_refs.append(
            (self._kf_id_host, arr[16:32].reshape(4, 4).astype(np.float32))
        )
        self._maybe_sync()
        return self.poses[-1]

    def drain_metrics(self) -> dict:
        """One D->H transfer of the device metrics ring (SURVEY.md §5.5)."""
        return metrics_drain(_METRICS_SCHEMA, self.metrics_ring)

    def process_chunk(
        self, imgs: np.ndarray, imgs_right: Optional[np.ndarray] = None
    ) -> Optional[np.ndarray]:
        """N frames in ONE device dispatch (_slam_chunk): the whole
        track/keyframe/BA/loop/PGO loop stays in HBM. Requires a
        bootstrapped system (drive the first frames through process_frame).
        Stereo systems (config 4) pass `imgs_right`; only the LAST right
        frame is extracted (keyframes are per-chunk), so the stereo chunk
        costs ~1 extra frame of extraction per chunk.

        With self.defer_readback=False (default): one packed host readback
        per chunk; returns the (N, 4, 4) poses. With defer_readback=True
        (the throughput mode): NO readback happens — outputs stay on device
        until flush_chunks() reconstructs all bookkeeping in one transfer —
        and this returns None. On the tunneled TPU client a single readback
        permanently degrades dispatch ~100x (runtime/hostsync.py), so the
        deferred mode is how configs 2/3/4 hit production frame rates.
        """
        assert self.bootstrapped and self.kf_id is not None, "bootstrap first"
        if self.stereo:
            assert imgs_right is not None and len(imgs_right) == len(imgs)
        n_real = len(imgs)
        chunk = max(self.cfg.frontend.chunk_frames, 1)
        if n_real % chunk != 0:
            # Pad the tail to the static chunk shape (a different length
            # would trigger a full recompile of the fused program — ~60 s);
            # padded frames replay the last image and their outputs are
            # dropped, but their state effects must not stick, so pad-run
            # state is rolled back by processing only full chunks here and
            # the remainder through the per-frame path.
            head = (n_real // chunk) * chunk
            out = []
            if head:
                r = self.process_chunk(
                    imgs[:head],
                    None if imgs_right is None else imgs_right[:head],
                )
                if r is not None:
                    out.append(r)
            for k, f in enumerate(imgs[head:]):
                fr = None if imgs_right is None else imgs_right[head + k]
                out.append(self.process_frame(f, img_right=fr)[None])
            return np.concatenate(out) if out else np.zeros((0, 4, 4), np.float32)
        nl = self._num_loops_dev
        if nl is None:
            nl = jnp.asarray(self.num_loops, jnp.int32)
        carry = SlamCarry(
            m=self.map, es=self.edges, kf_feats=self.kf_feats,
            T_cur=jnp.asarray(self.T_cur), last_rel=jnp.asarray(self._last_rel),
            kf_id=jnp.asarray(self.kf_id, jnp.int32),
            frames_since_kf=jnp.asarray(self.frames_since_kf, jnp.int32),
            # jnp.minimum, not Python min: under the adaptive-cadence chunk
            # path these mirrors may be DEVICE scalars carried from the
            # previous chunk, and builtin min() would force a readback.
            span_min_inl=jnp.minimum(
                jnp.asarray(self._span_min_inl, jnp.int32), 10**9
            ),
            span_fallbacks=jnp.asarray(self._span_fallbacks, jnp.int32),
            unhealthy_chunks=jnp.asarray(self._unhealthy_chunks, jnp.int32),
            num_loops=nl,
            ring=self.metrics_ring, key=self.key,
        )
        feats_chunk = _extract_chunk(jnp.asarray(imgs, jnp.float32), self.cfg)
        if self.rectify is not None:
            feats_chunk = jax.vmap(lambda f: _rectify_feats(f, self.rectify[0]))(
                feats_chunk
            )
        feats_r_last = None
        if self.stereo:
            feats_r_last = extract_features(
                jnp.asarray(imgs_right[-1], jnp.float32), self.cfg
            )
            if self.rectify is not None:
                feats_r_last = _rectify_feats(feats_r_last, self.rectify[1])
        carry, (packed, kf_stats) = _slam_chunk(
            carry, feats_chunk, self._vocab,
            self.cfg, self.cam, self.enable_ba, self.enable_loop,
            self.stereo, feats_r_last,
        )
        # Adopt the new device state — plain handle swaps, no readback.
        # Under the adaptive cadence the chunk may NOT have inserted a
        # keyframe; frames_since_kf / span stats are device scalars carried
        # from the chunk program, and the host keyframe-id mirror is
        # reconstructed from the readback at ingest time (kf_stats[26] says
        # whether a keyframe was made, kf_stats[16] which id).
        self.map, self.edges = carry.m, carry.es
        self.kf_feats = carry.kf_feats
        self.T_cur = carry.T_cur
        self._last_rel = carry.last_rel
        self.kf_id = carry.kf_id
        self.frames_since_kf = carry.frames_since_kf
        self._span_min_inl = carry.span_min_inl
        self._span_fallbacks = carry.span_fallbacks
        self._unhealthy_chunks = carry.unhealthy_chunks
        self.metrics_ring = carry.ring
        self.key = carry.key
        self._num_loops_dev = carry.num_loops

        if self.defer_readback:
            self._pending_chunks.append((n_real, packed, kf_stats))
            self._maybe_sync()
            return None

        # ONE bundled host<-device sync for the whole chunk.
        arr, ks = np.asarray(packed), np.asarray(kf_stats)
        self.num_loops = int(carry.num_loops)
        self._num_loops_dev = None
        poses = self._ingest_chunk_outputs(arr, ks)
        self._maybe_sync()
        return poses

    def _ingest_chunk_outputs(self, arr: np.ndarray, ks: np.ndarray) -> np.ndarray:
        """Host bookkeeping for one chunk's (packed, kf_stats) readback.

        Advances the host keyframe-id mirror (`_kf_id_host`) from the
        readback itself: kf_stats[26] says whether this chunk inserted a
        keyframe, kf_stats[16] its id — correct under both the fixed and
        the adaptive chunk cadence."""
        kf_before = self._kf_id_host  # chunk-start keyframe id
        made_kf = ks[26] > 0
        relocd = ks.shape[0] > 27 and ks[27] > 0
        kf_after = int(ks[16]) if made_kf else kf_before
        poses = arr[:, :16].reshape(-1, 4, 4).astype(np.float32)
        if made_kf or relocd:
            poses[-1] = ks[:16].reshape(4, 4).astype(np.float32)  # refined
        for f, (r, pose) in enumerate(zip(arr, poses)):
            self.poses.append(pose)
            last = f == len(arr) - 1
            stat = {
                "inliers": int(r[32]), "tracked": int(r[33]),
                "kf": last and made_kf,
            }
            if last and made_kf:
                stat["new_points"] = int(ks[17])
                stat["new_lines"] = int(ks[18])
                if self.enable_ba:
                    stat["ba_cost0"] = float(ks[19])
                    stat["ba_costN"] = float(ks[20])
                if ks[21] > 0:
                    stat["loop"] = int(ks[22])
                    stat["loop_inliers"] = int(ks[23])
                    stat["loop_scale"] = float(ks[24])
                if relocd:
                    # Keyframe AND relocalization in one chunk (a bridge
                    # keyframe preceded the re-lock): the final pose is the
                    # reloc solve, not the keyframe's — store it raw.
                    stat["reloc"] = True
                    stat["reloc_inliers"] = int(ks[28])
                    self.frame_refs.append((-1, poses[-1]))
                else:
                    self.frame_refs.append(
                        (kf_after, np.eye(4, dtype=np.float32))
                    )
            elif last and relocd:
                # Relocalized without a keyframe: the pose is absolute (the
                # PnP re-lock), not relative to any keyframe — store it raw.
                stat["reloc"] = True
                stat["reloc_inliers"] = int(ks[28])
                self.frame_refs.append((-1, poses[-1]))
            else:
                self.frame_refs.append(
                    (kf_before, r[16:32].reshape(4, 4).astype(np.float32))
                )
            self.stats.append(stat)
        self._kf_id_host = kf_after
        if relocd:
            self._repair_lost_span()
        return poses

    def _repair_lost_span(self) -> None:
        """After a successful relocalization, rewrite the lost span's poses.

        Frames tracked with ZERO PnP inliers carry motion-model poses that
        can be arbitrarily far off (one measured excursion reached 5e7
        before the LOST state caught it); leaving them in the trajectory
        destroys the Sim(3) ATE alignment for the whole run. The standard
        treatment of tracking-lost frames is interpolation between the last
        localized pose and the re-localized one — geodesic in SE(3) (linear
        translation, slerp rotation), stored as raw (keyframe-independent)
        trajectory entries.
        """
        end = len(self.poses) - 1  # the relocalized frame
        a = end - 1
        floor = max(0, end - 600)
        while a > floor and self.stats[a].get("inliers", 0) == 0:
            a -= 1
        if a >= end - 1:
            return
        Ta, Tb = self.poses[a], self.poses[end]
        Ra, ta = Ta[:3, :3], Ta[:3, 3]
        Rb, tb = Tb[:3, :3], Tb[:3, 3]
        w = _np_rot_log(Ra.T @ Rb)
        n = end - a
        for k in range(1, n):
            al = k / n
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Ra @ _np_rot_exp(al * w)
            T[:3, 3] = (1.0 - al) * ta + al * tb
            self.poses[a + k] = T
            self.frame_refs[a + k] = (-1, T)

    def global_ba(self, iters: int = 12) -> float:
        """Full-map bundle adjustment over ALL keyframes (see _global_ba).

        Run once as a final refinement (api.run_slam final_global_ba, the
        rehearsal script) or after a burst of loop closures. The static
        window size is bucketed to the next power of two >= kf_count so
        repeated calls across a growing map compile O(log K) variants, not
        one per keyframe count. Returns the final robust cost."""
        self.flush_chunks()
        kfc = int(np.asarray(self.map.kf_count))
        if kfc < 3:
            return 0.0
        W = 8
        cap = self.map.kf_T_wc.shape[0]
        while W < kfc:
            W *= 2
        W = min(W, cap)
        self.map, cost = _global_ba(
            self.map, self.cfg, self.cam, W, iters,
            num_fixed=1 if self.stereo else 2,
        )
        return float(np.asarray(cost[-1]))

    def flush_chunks(self) -> None:
        """Read back every deferred chunk's outputs in ONE bundled D->H
        transfer and reconstruct poses/stats/frame_refs. This IS a host
        readback: on the tunneled client, call resync() afterwards if more
        chunks will be processed (runtime/hostsync.py)."""
        if not self._pending_chunks:
            if self._num_loops_dev is not None:
                self.num_loops = int(np.asarray(self._num_loops_dev))
                self._num_loops_dev = None
            return
        pend = self._pending_chunks
        self._pending_chunks = []
        nl = self._num_loops_dev
        if nl is None:
            nl = jnp.asarray(self.num_loops, jnp.int32)
        # One flat device concat -> one transfer (each D->H pays a ~50-100 ms
        # fixed tunnel cost, so per-chunk reads would dominate).
        flat = jnp.concatenate(
            [p.reshape(-1) for _, p, _ in pend]
            + [k.reshape(-1) for _, _, k in pend]
            + [nl.astype(jnp.float32)[None]]
        )
        host = np.asarray(flat)
        off = 0
        arrs = []
        for n, p, _ in pend:
            sz = int(np.prod(p.shape))
            arrs.append(host[off: off + sz].reshape(p.shape))
            off += sz
        kss = []
        for _, _, k in pend:
            sz = int(np.prod(k.shape))
            kss.append(host[off: off + sz].reshape(k.shape))
            off += sz
        self.num_loops = int(host[off])
        self._num_loops_dev = None
        for arr, ks in zip(arrs, kss):
            self._ingest_chunk_outputs(arr, ks)

    def resync(self) -> None:
        """Re-establish pipelined dispatch after a host readback on the
        tunneled client: flush pending outputs, round-trip all device state
        across a client reset (runtime/hostsync.py), and re-upload. No-op
        on non-tunneled backends. Call once after the per-frame bootstrap
        phase (which reads back scalars every frame) before entering the
        readback-free chunk loop."""
        from laneslam.runtime import hostsync

        if not hostsync.is_tunneled():
            return
        self.flush_chunks()
        # frames_since_kf / span mirrors may be device scalars under the
        # adaptive chunk cadence — they must ride the reset round-trip too
        # (any device buffer not re-uploaded dies with the client).
        state = (
            self.map, self.edges, self.kf_feats, self.T_cur, self._last_rel,
            self.kf_id, self.metrics_ring, self.key, self._vocab,
            jnp.asarray(self.frames_since_kf, jnp.int32),
            jnp.asarray(self._span_min_inl, jnp.int32),
            jnp.asarray(self._span_fallbacks, jnp.int32),
            jnp.asarray(self._unhealthy_chunks, jnp.int32),
        )
        host = jax.device_get(state)
        hostsync.reset_client(retain_executables=True)
        (
            self.map, self.edges, self.kf_feats, self.T_cur, self._last_rel,
            self.kf_id, self.metrics_ring, self.key, self._vocab,
            self.frames_since_kf, self._span_min_inl, self._span_fallbacks,
            self._unhealthy_chunks,
        ) = jax.device_put(host)

    def trajectory(self) -> np.ndarray:
        """Full per-frame trajectory recomposed against FINAL keyframe poses
        (so loop-closure corrections propagate to all past frames)."""
        self.flush_chunks()
        kf_poses = np.asarray(self.map.kf_T_wc)
        out = []
        for (kf, rel), raw in zip(self.frame_refs, self.poses):
            out.append(raw if kf < 0 else (kf_poses[kf] @ rel).astype(np.float32))
        return np.stack(out)

    def raw_trajectory(self) -> np.ndarray:
        self.flush_chunks()
        return np.stack(self.poses)

    def keyframe_trajectory(self) -> np.ndarray:
        kf = int(self.map.kf_count)
        return np.asarray(self.map.kf_T_wc[:kf])
