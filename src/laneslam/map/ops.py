"""Map operations: all jit-compatible, static-shape, mask-correct.

Landmark slots come from the L0 arena allocator (runtime/arena.py): free
slot == invalid slot, culled slots are reused, and overflow counters are
surfaced in telemetry, never silent (SURVEY.md §7.3.2). Keyframes stay
bump-allocated (they are never culled; ids double as temporal order).
Plus scatter-based keyframe insertion, covisibility maintenance, landmark
culling (C14 "add/cull/merge"), and BA window gather/scatter against the
global landmark arrays (landmark slot == global id: the Schur reduction
runs over the full fixed-capacity block arrays, unobserved blocks
contribute zero).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from laneslam.backend.ba import BAProblem
from laneslam.map.map import MapState
from laneslam.geometry import se3
from laneslam.runtime import arena


def add_points(
    m: MapState, xyz: jnp.ndarray, desc: jnp.ndarray, valid: jnp.ndarray,
    anchor_kf: jnp.ndarray,
) -> Tuple[MapState, jnp.ndarray]:
    """Insert new point landmarks; returns (map, assigned ids (N,) or -1)."""
    P = m.pt_xyz.shape[0]
    ids, new_valid, dropped = arena.alloc(m.pt_valid, valid)
    w = jnp.where(ids >= 0, ids, P + 1)  # out-of-bounds -> dropped writes
    m = m._replace(
        pt_xyz=m.pt_xyz.at[w].set(xyz, mode="drop"),
        pt_desc=m.pt_desc.at[w].set(desc, mode="drop"),
        pt_valid=new_valid,
        pt_anchor_kf=m.pt_anchor_kf.at[w].set(anchor_kf, mode="drop"),
        pt_count=arena.live_count(new_valid),
        pt_overflow=m.pt_overflow + dropped,
    )
    return m, ids


def add_lines(
    m: MapState, plucker: jnp.ndarray, desc: jnp.ndarray, valid: jnp.ndarray,
    anchor_kf: jnp.ndarray,
) -> Tuple[MapState, jnp.ndarray]:
    L = m.ln_plucker.shape[0]
    ids, new_valid, dropped = arena.alloc(m.ln_valid, valid)
    w = jnp.where(ids >= 0, ids, L + 1)
    m = m._replace(
        ln_plucker=m.ln_plucker.at[w].set(plucker, mode="drop"),
        ln_desc=m.ln_desc.at[w].set(desc, mode="drop"),
        ln_valid=new_valid,
        ln_anchor_kf=m.ln_anchor_kf.at[w].set(anchor_kf, mode="drop"),
        ln_count=arena.live_count(new_valid),
        ln_overflow=m.ln_overflow + dropped,
    )
    return m, ids


def cull_landmarks(
    m: MapState, min_obs: int = 2, min_age_kf: int = 3,
    pressure: float = 0.8,
) -> Tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Free unsupported stale landmarks (C14 cull; arena slots reused).

    Two tiers, both gated on the anchor keyframe being at least
    `min_age_kf` keyframes old (young landmarks get time to accumulate
    observations):

      * orphans — zero live observation references (their rows were
        overwritten or their keyframes invalidated) — always culled;
      * under-observed (< `min_obs` observing keyframes) — culled only
        under capacity pressure (live count > pressure * capacity).
        Once-observed landmarks are legitimate map content in a
        forward-moving camera and loop-closure verification matches
        against them, so they are only sacrificed when keeping them
        would start dropping NEW landmarks instead (overflow).

    Observation rows referencing culled slots are cleared so a reused
    slot can never alias an old observation.

    Returns (map, n_culled_points, n_culled_lines).
    """
    P = m.pt_xyz.shape[0]
    L = m.ln_plucker.shape[0]
    kf_live = m.kf_valid[:, None]  # (K, 1)

    def obs_count(obs_idx, cap):
        w = jnp.where((obs_idx >= 0) & kf_live, obs_idx, cap + 1)
        return jnp.zeros((cap,), jnp.int32).at[w.reshape(-1)].add(
            1, mode="drop"
        )

    def cull_mask(valid, anchor, obs_idx, cap, count):
        old = anchor <= m.kf_count - min_age_kf
        n_obs = obs_count(obs_idx, cap)
        under_pressure = count > jnp.int32(pressure * cap)
        weak = jnp.where(under_pressure, n_obs < min_obs, n_obs < 1)
        return valid & old & weak

    cull_pt = cull_mask(m.pt_valid, m.pt_anchor_kf, m.obs_pt_idx, P, m.pt_count)
    cull_ln = cull_mask(m.ln_valid, m.ln_anchor_kf, m.obs_ln_idx, L, m.ln_count)

    new_pt_valid = arena.free_mask(m.pt_valid, cull_pt)
    new_ln_valid = arena.free_mask(m.ln_valid, cull_ln)
    # Drop dangling references from every keyframe's observation rows.
    obs_pt = jnp.where(cull_pt[jnp.maximum(m.obs_pt_idx, 0)], -1, m.obs_pt_idx)
    obs_ln = jnp.where(cull_ln[jnp.maximum(m.obs_ln_idx, 0)], -1, m.obs_ln_idx)
    m = m._replace(
        pt_valid=new_pt_valid,
        ln_valid=new_ln_valid,
        pt_anchor_kf=jnp.where(cull_pt, -1, m.pt_anchor_kf),
        ln_anchor_kf=jnp.where(cull_ln, -1, m.ln_anchor_kf),
        obs_pt_idx=obs_pt,
        obs_ln_idx=obs_ln,
        pt_count=arena.live_count(new_pt_valid),
        ln_count=arena.live_count(new_ln_valid),
    )
    return m, jnp.sum(cull_pt.astype(jnp.int32)), jnp.sum(cull_ln.astype(jnp.int32))


def insert_keyframe(
    m: MapState,
    T_wc: jnp.ndarray,
    pt_lm: jnp.ndarray,  # (Op,) landmark id per obs slot, -1 empty
    pt_uv: jnp.ndarray,  # (Op, 2)
    ln_lm: jnp.ndarray,  # (Ol,)
    ln_seg: jnp.ndarray,  # (Ol, 4)
    agg_desc: jnp.ndarray,  # (Dl,) place-recognition descriptor
) -> Tuple[MapState, jnp.ndarray]:
    """Insert a keyframe with its observation rows; update covisibility."""
    K = m.kf_T_wc.shape[0]
    kf_id = jnp.minimum(m.kf_count, K - 1)

    # Covisibility row: membership indicator over point landmarks, then count
    # overlap with every existing keyframe's observation row.
    P = m.pt_xyz.shape[0]
    # member has one guard slot at index P that stays 0: invalid obs slots
    # (id -1) read it, and scatter writes for them go out of bounds (dropped).
    member = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(pt_lm >= 0, pt_lm, P + 1)
    ].set(1, mode="drop")
    obs_all = jnp.where(m.obs_pt_idx >= 0, m.obs_pt_idx, P)  # (K, Op)
    shared = jnp.sum(member[obs_all], axis=-1) * m.kf_valid  # (K,)
    covis = m.covis.at[kf_id, :].set(shared).at[:, kf_id].set(shared)

    m = m._replace(
        kf_T_wc=m.kf_T_wc.at[kf_id].set(T_wc),
        kf_valid=m.kf_valid.at[kf_id].set(True),
        kf_agg_desc=m.kf_agg_desc.at[kf_id].set(agg_desc),
        obs_pt_idx=m.obs_pt_idx.at[kf_id].set(pt_lm),
        obs_pt_uv=m.obs_pt_uv.at[kf_id].set(pt_uv),
        obs_ln_idx=m.obs_ln_idx.at[kf_id].set(ln_lm),
        obs_ln_seg=m.obs_ln_seg.at[kf_id].set(ln_seg),
        covis=covis,
        kf_count=jnp.minimum(m.kf_count + 1, K),
    )
    return m, kf_id


def window_ids(m: MapState, W: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Last-W keyframe ids (oldest first) + slot validity; padding at the end."""
    start = jnp.maximum(m.kf_count - W, 0)
    ids = start + jnp.arange(W)
    valid = ids < m.kf_count
    return jnp.minimum(ids, m.kf_T_wc.shape[0] - 1), valid


def window_ids_covis(m: MapState, W: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Covisibility-driven BA window (SURVEY C12's stated purpose): the
    newest keyframe + its top-(W-1) covisible keyframes, with the W//2 most
    recent keyframes guaranteed a slot (tracking continuity). On a revisit,
    old keyframes sharing landmarks with the newest enter the window so
    their shared landmarks are re-optimized against BOTH passes, instead of
    the last-W window seeing only the second pass.

    Returns (ids ascending, slot_valid) like window_ids.
    """
    K = m.kf_T_wc.shape[0]
    newest = jnp.minimum(m.kf_count - 1, K - 1)
    k = jnp.arange(K)
    live = m.kf_valid & (k < m.kf_count) & (k != newest)
    recent = live & (k >= m.kf_count - (W // 2))
    score = jnp.where(live, m.covis[newest] + jnp.where(recent, 10**6, 0), -1)
    top_v, top_i = jax.lax.top_k(score, W - 1)
    ids = jnp.concatenate([top_i, newest[None]])
    valid = jnp.concatenate([top_v > 0, jnp.ones((1,), bool)])
    # Ascending order (BA fixes the first poses = the oldest / old-map ones),
    # invalid slots pushed to the end.
    order = jnp.argsort(jnp.where(valid, ids, K + 1))
    return jnp.minimum(ids[order], K - 1), valid[order]


def _compact_landmarks(flat_ids, valid, cap_global, cap_local):
    """Map a (S,) list of global landmark ids (with duplicates) to dense
    window-local slots — the block-sparse compaction of VERDICT r3 #2.

    The Schur reduction runs over the *local* block arrays (size = number
    of observation slots, NOT the full map capacity), cutting the coupling
    tensor B and the batched block inverses by the map/window occupancy
    ratio (16384 global slots vs <= 4096 window slots at default config:
    ~4x fewer blocks, ~8x less HBM traffic per LM iteration).

    cap_local >= max distinct ids is guaranteed when cap_local == S (a
    window cannot reference more distinct landmarks than it has observation
    slots), so compaction never overflows. Returns
    (local_idx (S,), local_valid (S,), l2g (cap_local,) with cap_global
    marking unused slots).
    """
    S = flat_ids.shape[0]
    order = jnp.arange(S, dtype=jnp.int32)
    safe = jnp.where(valid, flat_ids, cap_global)
    # First observation slot of each global id (scatter-min); later slots of
    # the same id point at it.
    first = jnp.full((cap_global + 1,), S, jnp.int32).at[safe].min(order)
    is_first = valid & (first[jnp.clip(flat_ids, 0, cap_global)] == order)
    loc = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # (S,) local id at firsts
    g2l = (
        jnp.full((cap_global,), -1, jnp.int32)
        .at[jnp.where(is_first, flat_ids, cap_global + 1)]
        .set(loc, mode="drop")
    )
    l2g = (
        jnp.full((cap_local,), cap_global, jnp.int32)
        .at[jnp.where(is_first, loc, cap_local + 1)]
        .set(flat_ids, mode="drop")
    )
    local_idx = g2l[jnp.clip(flat_ids, 0, cap_global - 1)]
    local_valid = valid & (local_idx >= 0)
    return jnp.maximum(local_idx, 0), local_valid, l2g


def gather_window(m: MapState, ids: jnp.ndarray, slot_valid: jnp.ndarray):
    """Build a BAProblem over window keyframes + COMPACTED window landmarks.

    Landmark blocks are gathered into dense window-local arrays (see
    _compact_landmarks) so H/B/Schur work scales with the window, not the
    map capacity. Returns (problem, (pt_l2g, ln_l2g)); pass the tables to
    scatter_window.
    """
    W = ids.shape[0]
    Op = m.obs_pt_idx.shape[1]
    Ol = m.obs_ln_idx.shape[1]
    P = m.pt_xyz.shape[0]
    L = m.ln_plucker.shape[0]
    T_cw = se3.inverse(m.kf_T_wc[ids])

    pt_idx = m.obs_pt_idx[ids]  # (W, Op)
    pt_w = jnp.repeat(jnp.arange(W), Op)
    flat_p = pt_idx.reshape(-1)
    pt_valid = (flat_p >= 0) & slot_valid[pt_w] & m.pt_valid[jnp.maximum(flat_p, 0)]
    NPL = min(W * Op, P)
    pt_p, pt_valid, pt_l2g = _compact_landmarks(flat_p, pt_valid, P, NPL)

    ln_idx = m.obs_ln_idx[ids]
    ln_w = jnp.repeat(jnp.arange(W), Ol)
    flat_l = ln_idx.reshape(-1)
    ln_valid = (flat_l >= 0) & slot_valid[ln_w] & m.ln_valid[jnp.maximum(flat_l, 0)]
    NLL = min(W * Ol, L)
    ln_l, ln_valid, ln_l2g = _compact_landmarks(flat_l, ln_valid, L, NLL)

    # Landmarks anchored OUTSIDE the window are constants: keyframes not in
    # this window also constrain them, and moving them to fit only the
    # window's observations drags the rest of the map (measured: recomposed
    # trajectory ATE degraded 0.70 -> 0.86 without this). Membership is a
    # scatter over the window ids — valid for non-contiguous (covisibility-
    # driven) windows too.
    K = m.kf_T_wc.shape[0]
    in_window = jnp.zeros((K,), bool).at[
        jnp.where(slot_valid, ids, K + 1)
    ].set(True, mode="drop")
    pt_free_g = in_window[jnp.clip(m.pt_anchor_kf, 0, K - 1)] & (m.pt_anchor_kf >= 0)
    ln_free_g = in_window[jnp.clip(m.ln_anchor_kf, 0, K - 1)] & (m.ln_anchor_kf >= 0)
    pt_used = pt_l2g < P
    ln_used = ln_l2g < L
    prob = BAProblem(
        T_cw=T_cw,
        points=m.pt_xyz[jnp.clip(pt_l2g, 0, P - 1)],
        lines=m.ln_plucker[jnp.clip(ln_l2g, 0, L - 1)],
        pt_w=pt_w, pt_p=pt_p,
        pt_uv=m.obs_pt_uv[ids].reshape(-1, 2), pt_valid=pt_valid,
        ln_w=ln_w, ln_l=ln_l,
        ln_seg=m.obs_ln_seg[ids].reshape(-1, 4), ln_valid=ln_valid,
        pt_free=pt_free_g[jnp.clip(pt_l2g, 0, P - 1)] & pt_used,
        ln_free=ln_free_g[jnp.clip(ln_l2g, 0, L - 1)] & ln_used,
    )
    return prob, (pt_l2g, ln_l2g)


def scatter_window(
    m: MapState, problem: BAProblem, ids: jnp.ndarray, slot_valid: jnp.ndarray,
    tables,
) -> MapState:
    """Write optimized poses + compacted window landmarks back into the map."""
    K = m.kf_T_wc.shape[0]
    P = m.pt_xyz.shape[0]
    L = m.ln_plucker.shape[0]
    pt_l2g, ln_l2g = tables
    T_wc = se3.inverse(problem.T_cw)
    w = jnp.where(slot_valid, ids, K + 1)
    # Only FREE local slots write back (fixed landmarks received zero delta
    # by construction, but masking keeps the contract explicit; unused local
    # slots carry l2g == capacity and drop).
    wp = jnp.where(problem.pt_free, pt_l2g, P + 1)
    wl = jnp.where(problem.ln_free, ln_l2g, L + 1)
    return m._replace(
        kf_T_wc=m.kf_T_wc.at[w].set(T_wc, mode="drop"),
        pt_xyz=m.pt_xyz.at[wp].set(problem.points, mode="drop"),
        ln_plucker=m.ln_plucker.at[wl].set(problem.lines, mode="drop"),
    )


def apply_scale_correction(
    m: MapState, kf_cand: jnp.ndarray, kf_cur: jnp.ndarray, s: jnp.ndarray
) -> MapState:
    """Mono loop closure: renormalize accumulated scale drift (SURVEY §7.3.5).

    The Sim(3) verification says cur-side geometry must scale by `s` to land
    on the (older, trusted) cand-side. Mono scale drift PERSISTS once it
    slips (tracking inherits the local map's scale), so the physical model
    is a shared factor across the whole span, not a geometric ramp: every
    translation delta along (cand, cur] scales uniformly by s — which also
    restores the cand->cur span length exactly for any slip location (a
    geometric ramp under-corrects step drifts; measured 3.098 vs 3.0 on the
    unit fixture). Landmarks rescale about their anchor keyframe (points:
    X' = T_new (g_a * T_old^-1 X); Plücker lines: the moment n scales, the
    direction v does not).
    """
    from laneslam.geometry.lines import plucker_transform

    K = m.kf_T_wc.shape[0]
    k = jnp.arange(K)
    in_span = (k > kf_cand) & (k <= kf_cur)
    g = jnp.where(in_span, s, 1.0)  # (K,) per-delta / per-anchor factor

    t = m.kf_T_wc[:, :3, 3]
    d = jnp.diff(t, axis=0, prepend=t[:1])  # d[0] = 0, d[k] = t[k]-t[k-1]
    t_new = t[0][None] + jnp.cumsum(d * g[:, None], axis=0)
    T_new = m.kf_T_wc.at[:, :3, 3].set(t_new)

    g_pt = g[jnp.maximum(m.pt_anchor_kf, 0)]
    T_old_a = m.kf_T_wc[jnp.maximum(m.pt_anchor_kf, 0)]
    T_new_a = T_new[jnp.maximum(m.pt_anchor_kf, 0)]
    X_local = se3.transform_points(se3.inverse(T_old_a), m.pt_xyz)
    pt = se3.transform_points(T_new_a, g_pt[:, None] * X_local)
    keep = (m.pt_anchor_kf >= 0) & m.pt_valid
    pt = jnp.where(keep[:, None], pt, m.pt_xyz)

    g_ln = g[jnp.maximum(m.ln_anchor_kf, 0)]
    Tl_old = m.kf_T_wc[jnp.maximum(m.ln_anchor_kf, 0)]
    Tl_new = T_new[jnp.maximum(m.ln_anchor_kf, 0)]
    L_local = plucker_transform(se3.inverse(Tl_old), m.ln_plucker)
    L_scaled = jnp.concatenate(
        [L_local[:, :3] * g_ln[:, None], L_local[:, 3:]], axis=-1
    )
    ln = plucker_transform(Tl_new, L_scaled)
    keep_l = (m.ln_anchor_kf >= 0) & m.ln_valid
    ln = jnp.where(keep_l[:, None], ln, m.ln_plucker)

    return m._replace(kf_T_wc=T_new, pt_xyz=pt, ln_plucker=ln)


def apply_pose_corrections_sim3(
    m: MapState, T_wc_new: jnp.ndarray, s_wc_new: jnp.ndarray
) -> MapState:
    """After Sim(3) PGO: apply each node's similarity correction to its
    anchored landmarks and adopt the SE(3) part as the new keyframe pose.

    The solved node k is S_k = (R_k, t_k, s_k) acting on camera-local
    coords as X_w = s_k R_k X_c + t_k; the camera center/orientation are
    (R_k, t_k) regardless of s_k, so the stored SE(3) pose is just the
    matrix part, while landmarks anchored at k re-express through the
    similarity: X' = S_new(S_old^-1 X) with S_old = (T_old, 1). Plücker
    lines under a similarity X' = sRX + t: direction v' = R v, moment
    n' = s R n + [t]x R v — i.e. scale the LOCAL moment, then the SE(3)
    adjoint (same decomposition as apply_scale_correction).

    The caller (system._run_pgo_sim3) is responsible for folding the node
    scales into the stored edge measurements so the next PGO run — which
    re-initializes node scales to 1 — sees a consistent graph.
    """
    from laneslam.geometry.lines import plucker_transform

    sp = s_wc_new[jnp.maximum(m.pt_anchor_kf, 0)]
    T_old_a = m.kf_T_wc[jnp.maximum(m.pt_anchor_kf, 0)]
    T_new_a = T_wc_new[jnp.maximum(m.pt_anchor_kf, 0)]
    X_local = se3.transform_points(se3.inverse(T_old_a), m.pt_xyz)
    pt = se3.transform_points(T_new_a, sp[:, None] * X_local)
    keep = (m.pt_anchor_kf >= 0) & m.pt_valid
    pt = jnp.where(keep[:, None], pt, m.pt_xyz)

    sl = s_wc_new[jnp.maximum(m.ln_anchor_kf, 0)]
    Tl_old = m.kf_T_wc[jnp.maximum(m.ln_anchor_kf, 0)]
    Tl_new = T_wc_new[jnp.maximum(m.ln_anchor_kf, 0)]
    L_local = plucker_transform(se3.inverse(Tl_old), m.ln_plucker)
    L_scaled = jnp.concatenate(
        [L_local[:, :3] * sl[:, None], L_local[:, 3:]], axis=-1
    )
    ln = plucker_transform(Tl_new, L_scaled)
    keep_l = (m.ln_anchor_kf >= 0) & m.ln_valid
    ln = jnp.where(keep_l[:, None], ln, m.ln_plucker)

    return m._replace(kf_T_wc=T_wc_new, pt_xyz=pt, ln_plucker=ln)


def apply_pose_corrections(m: MapState, T_wc_new: jnp.ndarray) -> MapState:
    """After PGO: move each landmark by its anchor keyframe's correction.

    Correction for anchor k: D_k = T_new[k] @ inv(T_old[k]) applied in world
    frame; points transform as X <- D X, lines by the Plücker adjoint.
    """
    from laneslam.geometry.lines import plucker_transform

    D = T_wc_new @ se3.inverse(m.kf_T_wc)  # (K, 4, 4) world-frame corrections
    Dp = D[jnp.maximum(m.pt_anchor_kf, 0)]
    pt = se3.transform_points(Dp, m.pt_xyz)
    pt = jnp.where((m.pt_anchor_kf >= 0)[:, None] & m.pt_valid[:, None], pt, m.pt_xyz)
    Dl = D[jnp.maximum(m.ln_anchor_kf, 0)]
    ln = plucker_transform(Dl, m.ln_plucker)
    ln = jnp.where((m.ln_anchor_kf >= 0)[:, None] & m.ln_valid[:, None], ln, m.ln_plucker)
    return m._replace(kf_T_wc=T_wc_new, pt_xyz=pt, ln_plucker=ln)
