"""L0 arena allocator + C14 landmark culling (SURVEY.md §1 L0, §2.1 C14)."""

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import MapConfig
from laneslam.map import ops
from laneslam.map.map import make_empty_map
from laneslam.runtime import arena


def test_alloc_is_bump_when_fresh():
    valid = jnp.zeros((16,), bool)
    want = jnp.array([True, False, True, True, False])
    ids, new_valid, dropped = arena.alloc(valid, want)
    assert ids.tolist() == [0, -1, 1, 2, -1]
    assert int(dropped) == 0
    assert new_valid.tolist() == [True, True, True] + [False] * 13


def test_alloc_reuses_freed_slots_lowest_first():
    valid = jnp.zeros((8,), bool)
    ids, valid, _ = arena.alloc(valid, jnp.ones((6,), bool))
    valid = arena.free(valid, jnp.array([1, 4]))
    ids2, valid, dropped = arena.alloc(valid, jnp.ones((3,), bool))
    # Holes at 1 and 4 are reused before the untouched tail 6, 7.
    assert ids2.tolist() == [1, 4, 6]
    assert int(dropped) == 0
    assert int(arena.live_count(valid)) == 7


def test_alloc_overflow_reported_not_silent():
    valid = jnp.ones((4,), bool).at[2].set(False)
    ids, new_valid, dropped = arena.alloc(valid, jnp.ones((3,), bool))
    assert ids.tolist() == [2, -1, -1]
    assert int(dropped) == 2
    assert bool(new_valid.all())


def test_alloc_jit_and_free_mask():
    f = jax.jit(arena.alloc)
    ids, valid, dropped = f(jnp.zeros((8,), bool), jnp.ones((8,), bool))
    assert ids.tolist() == list(range(8))
    valid = arena.free_mask(valid, jnp.arange(8) % 2 == 0)
    assert int(arena.live_count(valid)) == 4


def _map_with_landmarks(n_kf=5, n_obs_per=4):
    cfg = MapConfig(max_keyframes=8, max_points=64, max_lines=32,
                    max_obs_per_kf=8, max_line_obs_per_kf=4)
    m = make_empty_map(cfg, pt_desc_dim=8, ln_desc_dim=8, agg_dim=8)
    key = jax.random.PRNGKey(0)
    for k in range(n_kf):
        xyz = jax.random.normal(jax.random.fold_in(key, k), (8, 3))
        desc = jax.random.normal(jax.random.fold_in(key, 100 + k), (8, 8))
        new = jnp.arange(8) < n_obs_per
        m, ids = ops.add_points(m, xyz, desc, new, jnp.full((8,), k, jnp.int32))
        m, kf_id = ops.insert_keyframe(
            m, jnp.eye(4), ids, jnp.zeros((8, 2)),
            jnp.full((4,), -1, jnp.int32), jnp.zeros((4, 4)),
            jnp.zeros((8,)),
        )
    return m


def test_cull_frees_single_observation_landmarks():
    m = _map_with_landmarks()
    assert int(m.pt_count) == 20
    # Every landmark is observed by exactly one keyframe; anchors 0..4.
    m2, n_cp, n_cl = ops.cull_landmarks(m, min_obs=2, min_age_kf=2, pressure=0.0)
    # Anchors 0..3 are >= 2 KFs old (kf_count=5) -> culled; anchor-4 stay.
    assert int(n_cp) == 16 and int(n_cl) == 0
    assert int(m2.pt_count) == 4
    # Observation rows referencing culled landmarks are cleared.
    culled = m.pt_valid & ~m2.pt_valid
    refs = m2.obs_pt_idx[m2.obs_pt_idx >= 0]
    assert not bool(jnp.any(culled[refs]))
    # Freed slots are reused by the next insertion.
    m3, ids = ops.add_points(
        m2, jnp.zeros((8, 3)), jnp.zeros((8, 8)), jnp.ones((8,), bool),
        jnp.full((8,), 5, jnp.int32),
    )
    assert set(np.asarray(ids).tolist()) <= set(np.where(~np.asarray(m2.pt_valid))[0])


def test_cull_keeps_multi_observed_landmarks():
    m = _map_with_landmarks()
    # Make keyframe 1 also observe keyframe 0's landmarks (slots 0..3).
    row0 = m.obs_pt_idx[0]
    m = m._replace(obs_pt_idx=m.obs_pt_idx.at[1].set(row0))
    m2, n_cp, _ = ops.cull_landmarks(m, min_obs=2, min_age_kf=2, pressure=0.0)
    kept = np.where(np.asarray(m2.pt_valid))[0]
    # KF0's 4 landmarks (now 2 observers) + KF4's fresh 4 survive, and
    # KF1's original row got overwritten so its own 4 are culled too.
    assert int(n_cp) == 12
    anchors = np.asarray(m2.pt_anchor_kf)[kept]
    assert set(anchors.tolist()) == {0, 4}


def test_cull_no_pressure_keeps_once_observed():
    """Below the pressure threshold only orphans are culled."""
    m = _map_with_landmarks()
    # Orphan keyframe 0's landmarks by overwriting its observation row.
    m = m._replace(obs_pt_idx=m.obs_pt_idx.at[0].set(-1))
    m2, n_cp, _ = ops.cull_landmarks(m, min_obs=2, min_age_kf=2, pressure=0.9)
    assert int(n_cp) == 4  # only the orphaned ones
    assert int(m2.pt_count) == 16
