"""Multi-session map merge (SURVEY.md C20, config 5 / BASELINE.json:11).

Sessions are independent SLAM runs (each its own checkpointed MapState +
EdgeStore, each with its own origin). Merging:

  1. concatenate maps with id offsets (keyframes, landmarks, obs tables,
     covisibility blocks, odometry edges);
  2. cross-session place recognition: each new session's keyframe signatures
     query the merged DB (GEMM top-k — or the ring path on a mesh);
  3. geometric verification (3D-3D landmark Umeyama RANSAC across sessions)
     -> SE(3) alignment of the new session onto the merged frame;
  4. transform the new session's poses/landmarks; emit cross-session loop
     edges; joint PGO over the merged graph (the distributed solver for
     config 5).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import LoopConfig, MapConfig
from laneslam.features.match import match_descriptors
from laneslam.geometry import se3
from laneslam.geometry.lines import plucker_transform
from laneslam.geometry.umeyama import umeyama_alignment
from laneslam.map.map import MapState, make_empty_map


def transform_map(m: MapState, T: jnp.ndarray) -> MapState:
    """Apply a rigid SE(3) world transform to every pose and landmark."""
    return m._replace(
        kf_T_wc=jnp.einsum("ij,kjl->kil", T, m.kf_T_wc),
        pt_xyz=jnp.where(
            m.pt_valid[:, None], se3.transform_points(T, m.pt_xyz), m.pt_xyz
        ),
        ln_plucker=jnp.where(
            m.ln_valid[:, None], plucker_transform(T, m.ln_plucker), m.ln_plucker
        ),
    )


def concatenate_maps(maps: List[MapState]) -> Tuple[MapState, np.ndarray, np.ndarray]:
    """Stack sessions into one larger-capacity map.

    Returns (merged, kf_offsets (S,), pt/ln offsets packed (S, 2)).
    Merged capacities are the sums of the session capacities.
    """
    K = sum(m.kf_T_wc.shape[0] for m in maps)
    P = sum(m.pt_xyz.shape[0] for m in maps)
    L = sum(m.ln_plucker.shape[0] for m in maps)
    Op = maps[0].obs_pt_idx.shape[1]
    Ol = maps[0].obs_ln_idx.shape[1]
    out = make_empty_map(
        MapConfig(max_keyframes=K, max_points=P, max_lines=L,
                  max_obs_per_kf=Op, max_line_obs_per_kf=Ol),
        pt_desc_dim=maps[0].pt_desc.shape[1],
        ln_desc_dim=maps[0].ln_desc.shape[1],
        agg_dim=maps[0].kf_agg_desc.shape[1],
    )
    kf_off = np.zeros(len(maps), np.int32)
    lm_off = np.zeros((len(maps), 2), np.int32)
    k0 = p0 = l0 = 0
    for s, m in enumerate(maps):
        k = m.kf_T_wc.shape[0]
        p = m.pt_xyz.shape[0]
        l = m.ln_plucker.shape[0]
        kf_off[s] = k0
        lm_off[s] = (p0, l0)
        sl_k = slice(k0, k0 + k)
        out = out._replace(
            kf_T_wc=out.kf_T_wc.at[sl_k].set(m.kf_T_wc),
            kf_valid=out.kf_valid.at[sl_k].set(m.kf_valid),
            kf_agg_desc=out.kf_agg_desc.at[sl_k].set(m.kf_agg_desc),
            pt_xyz=out.pt_xyz.at[p0:p0 + p].set(m.pt_xyz),
            pt_valid=out.pt_valid.at[p0:p0 + p].set(m.pt_valid),
            pt_desc=out.pt_desc.at[p0:p0 + p].set(m.pt_desc),
            pt_anchor_kf=out.pt_anchor_kf.at[p0:p0 + p].set(
                jnp.where(m.pt_anchor_kf >= 0, m.pt_anchor_kf + k0, -1)
            ),
            ln_plucker=out.ln_plucker.at[l0:l0 + l].set(m.ln_plucker),
            ln_valid=out.ln_valid.at[l0:l0 + l].set(m.ln_valid),
            ln_desc=out.ln_desc.at[l0:l0 + l].set(m.ln_desc),
            ln_anchor_kf=out.ln_anchor_kf.at[l0:l0 + l].set(
                jnp.where(m.ln_anchor_kf >= 0, m.ln_anchor_kf + k0, -1)
            ),
            obs_pt_idx=out.obs_pt_idx.at[sl_k].set(
                jnp.where(m.obs_pt_idx >= 0, m.obs_pt_idx + p0, -1)
            ),
            obs_pt_uv=out.obs_pt_uv.at[sl_k].set(m.obs_pt_uv),
            obs_ln_idx=out.obs_ln_idx.at[sl_k].set(
                jnp.where(m.obs_ln_idx >= 0, m.obs_ln_idx + l0, -1)
            ),
            obs_ln_seg=out.obs_ln_seg.at[sl_k].set(m.obs_ln_seg),
            covis=out.covis.at[sl_k, sl_k].set(m.covis),
        )
        k0 += k
        p0 += p
        l0 += l
    # Keyframes stay bump-allocated so kf_count is the high-water mark;
    # landmark counts are live counts (the arena allocator reuses the dead
    # gaps between sessions' capacity-aligned ranges on future inserts).
    out = out._replace(
        kf_count=jnp.asarray(k0, jnp.int32),
        pt_count=jnp.sum(out.pt_valid.astype(jnp.int32)),
        ln_count=jnp.sum(out.ln_valid.astype(jnp.int32)),
    )
    return out, kf_off, lm_off


class CrossSessionLink(NamedTuple):
    kf_a: int  # keyframe in the merged/base part
    kf_b: int  # keyframe in the new session (merged ids)
    T_align: jnp.ndarray  # (4, 4) R|t mapping session-b world -> base
    num_inliers: int
    scale: float = 1.0  # similarity scale of the alignment (mono sessions)


def find_cross_session_link(
    merged: MapState,
    kf_range_a: Tuple[int, int],
    kf_range_b: Tuple[int, int],
    key: jax.Array,
    cfg: LoopConfig = LoopConfig(),
    thr: float = 0.5,
    with_scale: bool = False,
) -> CrossSessionLink | None:
    """Best verified keyframe pair linking session b to the base sessions.

    Retrieval: GEMM of b's signatures against a's block; verification:
    3D-3D landmark descriptor matching + Umeyama RANSAC (like loop/verify
    but returning the world-frame alignment of b onto a). `with_scale`
    fits a Sim(3) alignment — mono sessions carry independent (and
    drifting) metric scales that a rigid fit cannot absorb
    (BASELINE.json:11 mono multi-session; VERDICT r4 weak #6).
    """
    a0, a1 = kf_range_a
    b0, b1 = kf_range_b
    db_a = merged.kf_agg_desc[a0:a1]
    sims = merged.kf_agg_desc[b0:b1] @ db_a.T  # (Nb, Na)
    sims = jnp.where(
        merged.kf_valid[None, a0:a1] & merged.kf_valid[b0:b1, None], sims, -1e9
    )
    flat = sims.reshape(-1)
    topv, topi = jax.lax.top_k(flat, min(cfg.top_k * 4, flat.shape[0]))

    best: CrossSessionLink | None = None
    for v, i in zip(np.asarray(topv), np.asarray(topi)):
        if v < cfg.min_similarity:
            break
        kb = b0 + int(i) // (a1 - a0)
        ka = a0 + int(i) % (a1 - a0)
        link = _verify_cross(merged, ka, kb, key, cfg, thr, with_scale)
        if link is not None and (best is None or link.num_inliers > best.num_inliers):
            best = link
        if best is not None and best.num_inliers >= 3 * cfg.min_inliers:
            break
    return best


def _verify_cross(
    merged: MapState, ka: int, kb: int, key, cfg: LoopConfig, thr: float,
    with_scale: bool = False,
) -> CrossSessionLink | None:
    ia = merged.obs_pt_idx[ka]
    ib = merged.obs_pt_idx[kb]
    va, vb = ia >= 0, ib >= 0
    da = merged.pt_desc[jnp.maximum(ia, 0)]
    db = merged.pt_desc[jnp.maximum(ib, 0)]
    mm = match_descriptors(db, da, vb, va, ratio=0.9, cross_check=True)
    Xb = merged.pt_xyz[jnp.maximum(ib, 0)]
    Xa = merged.pt_xyz[jnp.maximum(ia, 0)][jnp.maximum(mm.idx, 0)]
    valid = mm.valid
    n_cand = int(valid.sum())
    if n_cand < 6:
        return None
    # RANSAC on 3-point Umeyama (b-side points onto a-side; similarity fit
    # for mono sessions — inter-session scale offsets can be large, so the
    # sanity gate is wide, not the loop-closure drift gate).
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, cfg.ransac_hypotheses)
    N = Xb.shape[0]
    samp = jax.vmap(
        lambda k: jax.random.choice(k, N, (3,), replace=False, p=jax.nn.softmax(logits))
    )(keys)

    def fit(ids):
        s, R, t = umeyama_alignment(Xb[ids], Xa[ids], with_scale=with_scale)
        return s, se3.make(R, t)

    s_h, T_h = jax.vmap(fit)(samp)
    err = jnp.linalg.norm(
        se3.transform_points(T_h[:, None], s_h[:, None, None] * Xb[None])
        - Xa[None],
        axis=-1,
    )
    s_ok = (s_h > 0.2) & (s_h < 5.0)
    inl = (err < thr) & valid[None, :] & s_ok[:, None]
    best = jnp.argmax(jnp.sum(inl, axis=-1))
    mask = inl[best]
    s, R, t = umeyama_alignment(
        Xb, Xa, weights=mask.astype(jnp.float32), with_scale=with_scale
    )
    T = se3.make(R, t)
    n = int(
        jnp.sum(
            (jnp.linalg.norm(
                se3.transform_points(T, s * Xb) - Xa, axis=-1
            ) < thr) & valid
        )
    )
    if n < cfg.min_inliers or not (0.2 < float(s) < 5.0):
        return None
    return CrossSessionLink(
        kf_a=int(ka), kf_b=int(kb), T_align=T, num_inliers=n, scale=float(s)
    )


def _apply_sim3_slice(merged: MapState, b0: int, b1: int, T, s):
    """Apply the world similarity (T=[R|t], s) to session b's slice of the
    merged map: camera centers/orientations move as T' = [R R_c | s R t_c + t],
    points as X' = s R X + t, Plücker lines as (n, v) -> (s R n + [t]x R v,
    R v)."""
    sl = slice(b0, b1)
    R = T[:3, :3]
    t = T[:3, 3]
    kf = merged.kf_T_wc[sl]
    kf_new = jnp.einsum("ij,kjl->kil", T, kf)
    kf_new = kf_new.at[:, :3, 3].set(
        s * jnp.einsum("ij,kj->ki", R, kf[:, :3, 3]) + t
    )
    p_mask = (merged.pt_anchor_kf >= b0) & (merged.pt_anchor_kf < b1)
    l_mask = (merged.ln_anchor_kf >= b0) & (merged.ln_anchor_kf < b1)
    pt_new = s * jnp.einsum("ij,kj->ki", R, merged.pt_xyz) + t
    n_w = merged.ln_plucker[:, :3]
    v_w = merged.ln_plucker[:, 3:]
    Rv = jnp.einsum("ij,kj->ki", R, v_w)
    ln_new = jnp.concatenate(
        [s * jnp.einsum("ij,kj->ki", R, n_w) + jnp.cross(
            jnp.broadcast_to(t, Rv.shape), Rv
        ), Rv],
        axis=-1,
    )
    return merged._replace(
        kf_T_wc=merged.kf_T_wc.at[sl].set(kf_new),
        pt_xyz=jnp.where(
            (p_mask & merged.pt_valid)[:, None], pt_new, merged.pt_xyz
        ),
        ln_plucker=jnp.where(
            (l_mask & merged.ln_valid)[:, None], ln_new, merged.ln_plucker
        ),
    )


def merge_sessions(
    maps: List[MapState],
    edge_stores: List,
    key: jax.Array,
    cfg: LoopConfig = LoopConfig(),
    mono: bool = False,
):
    """Full merge: concatenate, align each session onto the base, link edges.

    Returns (merged MapState, PgoProblem-ready edge arrays, links).
    edge_stores: list of EdgeStore (same capacities not required).

    `mono=True` (BASELINE.json:11 mono multi-session, e.g. KITTI 00+05+07
    mono): each session carries its OWN metric scale, so the cross-session
    alignment fits Sim(3) — the session's slice transforms by the full
    similarity and its odometry edge translations rescale by the fitted s,
    after which the joint graph is scale-consistent and the SE(3) joint PGO
    applies. SE(3)-only alignment (the round-4 behavior) cannot absorb an
    inter-session scale offset (VERDICT r4 weak #6)."""
    merged, kf_off, _ = concatenate_maps(maps)

    # Collect odometry edges with offsets ([session] -> np arrays so the
    # mono path can rescale a session's measurements after alignment).
    ei, ej, eT, ew = [], [], [], []
    sess_of_edge_block = []
    for s, es in enumerate(edge_stores):
        n = int(es.count)
        ei.append(np.asarray(es.edge_i[:n]) + kf_off[s])
        ej.append(np.asarray(es.edge_j[:n]) + kf_off[s])
        eT.append(np.asarray(es.edge_T[:n]).copy())
        ew.append(np.asarray(es.edge_weight[:n]))
        sess_of_edge_block.append(s)

    links = []
    ranges = []
    k0 = 0
    for s, m in enumerate(maps):
        ranges.append((k0, k0 + m.kf_T_wc.shape[0]))
        k0 += m.kf_T_wc.shape[0]

    for s in range(1, len(maps)):
        key, sub = jax.random.split(key)
        link = find_cross_session_link(
            merged, (0, ranges[s][0]), ranges[s], sub, cfg, with_scale=mono
        )
        if link is None:
            continue
        # Transform this session's slice of the merged map into the base
        # frame (similarity for mono; link.scale == 1 -> rigid).
        b0, b1 = ranges[s]
        merged = _apply_sim3_slice(
            merged, b0, b1, link.T_align, float(link.scale)
        )
        if mono and abs(link.scale - 1.0) > 1e-6:
            # The session's stored odometry measurements were taken at its
            # own scale; after rescaling its world by s they must follow.
            blk = sess_of_edge_block.index(s)
            eT[blk][:, :3, 3] *= link.scale
        # Cross-session loop edge: measured relative pose after alignment.
        T_rel = se3.inverse(merged.kf_T_wc[link.kf_a]) @ merged.kf_T_wc[link.kf_b]
        ei.append(np.asarray([link.kf_a]))
        ej.append(np.asarray([link.kf_b]))
        eT.append(np.asarray(T_rel)[None])
        ew.append(np.asarray([2.0]))
        links.append(link)

    edge_i = jnp.asarray(np.concatenate(ei), jnp.int32)
    edge_j = jnp.asarray(np.concatenate(ej), jnp.int32)
    edge_T = jnp.asarray(np.concatenate(eT))
    edge_w = jnp.asarray(np.concatenate(ew), jnp.float32)
    return merged, (edge_i, edge_j, edge_T, edge_w), links
