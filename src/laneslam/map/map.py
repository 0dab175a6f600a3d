"""Device-resident map state (SURVEY.md C14, C12, C11 storage).

BASELINE.json:5: "The keyframe database, covisibility graph, and
loop-closure verification move to device-resident arrays". Everything is a
fixed-capacity SoA pytree with validity masks and bump-allocator counters —
no Python object graphs, no dynamic shapes. The whole SLAM state
checkpoints as one pytree (SURVEY.md §5.4) and shards along the 'block'
axis for the distributed configs.

Slot conventions: landmark/keyframe ids are array indices; -1 = none.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from laneslam.config import MapConfig


class MapState(NamedTuple):
    # --- keyframes -----------------------------------------------------
    kf_T_wc: jnp.ndarray  # (K, 4, 4) camera-to-world
    kf_valid: jnp.ndarray  # (K,) bool
    kf_agg_desc: jnp.ndarray  # (K, Dl) aggregated line-descriptor (place recog)
    # --- landmarks: points --------------------------------------------
    pt_xyz: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    pt_desc: jnp.ndarray  # (P, Dp) representative descriptor
    pt_anchor_kf: jnp.ndarray  # (P,) int32 keyframe that created it
    # --- landmarks: lines ---------------------------------------------
    ln_plucker: jnp.ndarray  # (L, 6)
    ln_valid: jnp.ndarray  # (L,) bool
    ln_desc: jnp.ndarray  # (L, Dl)
    ln_anchor_kf: jnp.ndarray  # (L,) int32
    # --- observations (per keyframe rows) -----------------------------
    obs_pt_idx: jnp.ndarray  # (K, Op) int32 landmark id or -1
    obs_pt_uv: jnp.ndarray  # (K, Op, 2)
    obs_ln_idx: jnp.ndarray  # (K, Ol) int32
    obs_ln_seg: jnp.ndarray  # (K, Ol, 4)
    # --- covisibility graph -------------------------------------------
    covis: jnp.ndarray  # (K, K) int32 shared-landmark counts
    # --- counters ------------------------------------------------------
    kf_count: jnp.ndarray  # int32
    pt_count: jnp.ndarray  # int32
    ln_count: jnp.ndarray  # int32
    # --- overflow telemetry (SURVEY.md §7.3.2: never silent) ----------
    pt_overflow: jnp.ndarray  # int32 dropped point landmarks
    ln_overflow: jnp.ndarray  # int32


def make_empty_map(
    cfg: MapConfig = MapConfig(), pt_desc_dim: int = 256, ln_desc_dim: int = 72,
    agg_dim: int = 128,
) -> MapState:
    K, P, L = cfg.max_keyframes, cfg.max_points, cfg.max_lines
    Op, Ol = cfg.max_obs_per_kf, cfg.max_line_obs_per_kf
    f32 = jnp.float32
    i32 = jnp.int32
    return MapState(
        kf_T_wc=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros((K,), bool),
        kf_agg_desc=jnp.zeros((K, agg_dim), f32),
        pt_xyz=jnp.zeros((P, 3), f32),
        pt_valid=jnp.zeros((P,), bool),
        pt_desc=jnp.zeros((P, pt_desc_dim), f32),
        pt_anchor_kf=jnp.full((P,), -1, i32),
        ln_plucker=jnp.zeros((L, 6), f32),
        ln_valid=jnp.zeros((L,), bool),
        ln_desc=jnp.zeros((L, ln_desc_dim), f32),
        ln_anchor_kf=jnp.full((L,), -1, i32),
        obs_pt_idx=jnp.full((K, Op), -1, i32),
        obs_pt_uv=jnp.zeros((K, Op, 2), f32),
        obs_ln_idx=jnp.full((K, Ol), -1, i32),
        obs_ln_seg=jnp.zeros((K, Ol, 4), f32),
        covis=jnp.zeros((K, K), i32),
        kf_count=jnp.asarray(0, i32),
        pt_count=jnp.asarray(0, i32),
        ln_count=jnp.asarray(0, i32),
        pt_overflow=jnp.asarray(0, i32),
        ln_overflow=jnp.asarray(0, i32),
    )
