"""C20 multi-session merge: alignment recovers the GT inter-session offset."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.config import MapConfig, SlamConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
from laneslam.map.merge import concatenate_maps, merge_sessions
from laneslam.system import SlamSystem


@pytest.mark.slow
def test_merge_aligns_overlapping_sessions():
    total, per, overlap = 20, 13, 6
    scene = make_corridor_scene(seed=0, num_frames=total)
    cam = scene.cam._replace(baseline=0.5)
    cfg = SlamConfig(map=MapConfig(max_keyframes=32, max_points=1024, max_lines=256))

    sessions = []
    starts = [0, per - overlap]
    for s, start in enumerate(starts):
        sys_ = SlamSystem(cfg, cam, stereo=True, enable_loop=False, seed=s)
        for f in range(start, min(start + per, total)):
            sys_.process_frame(
                render_scene_frame(scene, f),
                img_right=render_scene_frame(scene, f, baseline=0.5),
            )
        sessions.append(sys_)

    maps = [s.map for s in sessions]
    stores = [s.edges for s in sessions]
    merged, (ei, ej, eT, ew), links = merge_sessions(
        maps, stores, jax.random.PRNGKey(3), cfg.loop
    )
    assert len(links) == 1
    assert links[0].num_inliers >= 15

    # GT: session-1's world origin is the camera pose at its start frame
    # (relative to session-0's origin = frame 0).
    T_expect = scene.poses_wc[starts[1]]
    k_off = maps[0].kf_T_wc.shape[0]
    # Session-1's first keyframe (its origin) should land near T_expect.
    T_kf0_b = np.asarray(merged.kf_T_wc[k_off])
    err_t = np.linalg.norm(T_kf0_b[:3, 3] - T_expect[:3, 3])
    assert err_t < 0.25, f"translation error {err_t}"
    # Rotation close too.
    Rerr = T_kf0_b[:3, :3].T @ T_expect[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(Rerr) - 1) / 2, -1, 1)))
    assert ang < 5.0, f"rotation error {ang} deg"

    # Cross edge present with weight 2.
    assert np.any(np.asarray(ew) == 2.0)


def test_concatenate_offsets():
    from laneslam.map.map import make_empty_map
    from laneslam.map import ops

    cfg = MapConfig(max_keyframes=4, max_points=8, max_lines=4,
                    max_obs_per_kf=4, max_line_obs_per_kf=2)
    m1 = make_empty_map(cfg)
    m2 = make_empty_map(cfg)
    m1, ids1 = ops.add_points(m1, jnp.ones((2, 3)), jnp.ones((2, 256)),
                              jnp.ones(2, bool), jnp.zeros(2, jnp.int32))
    m2, ids2 = ops.add_points(m2, 2 * jnp.ones((3, 3)), jnp.ones((3, 256)),
                              jnp.ones(3, bool), jnp.zeros(3, jnp.int32))
    row = -jnp.ones((4,), jnp.int32)
    m2 = m2._replace(obs_pt_idx=m2.obs_pt_idx.at[0].set(row.at[0].set(1)))
    merged, kf_off, lm_off = concatenate_maps([m1, m2])
    # pt_count is the LIVE landmark count (it drives cull pressure);
    # session slots stay capacity-aligned in the arrays regardless.
    assert int(merged.pt_count) == 5
    assert int(merged.pt_valid.sum()) == 5
    assert kf_off.tolist() == [0, 4]
    assert lm_off[:, 0].tolist() == [0, 8]
    # m2's obs landmark index 1 is offset by m1's point capacity (8).
    assert int(merged.obs_pt_idx[4, 0]) == 9
    np.testing.assert_allclose(np.asarray(merged.pt_xyz[8:11]), 2.0)


def _rescale_session(m, s):
    """Mimic a mono session whose metric scale is off by factor s: scale
    poses' translations, landmarks, and Plücker moments about the origin."""
    return m._replace(
        kf_T_wc=m.kf_T_wc.at[:, :3, 3].multiply(s),
        pt_xyz=m.pt_xyz * s,
        ln_plucker=m.ln_plucker.at[:, :3].multiply(s),
    )


@pytest.mark.slow
def test_merge_mono_sessions_with_scale_offset():
    """BASELINE.json:11 mono multi-session: sessions carry independent
    metric scales; merge_sessions(mono=True) must fit a Sim(3) alignment
    and land session 2 at the base session's scale (VERDICT r4 weak #6:
    the SE(3)-only aligner could not absorb the offset)."""
    import jax.numpy as jnp

    total, per, overlap = 20, 13, 6
    scale_b = 1.35
    scene = make_corridor_scene(seed=0, num_frames=total)
    cam = scene.cam._replace(baseline=0.5)
    cfg = SlamConfig(map=MapConfig(max_keyframes=32, max_points=1024, max_lines=256))

    sessions = []
    starts = [0, per - overlap]
    for s, start in enumerate(starts):
        sys_ = SlamSystem(cfg, cam, stereo=True, enable_loop=False, seed=s)
        for f in range(start, min(start + per, total)):
            sys_.process_frame(
                render_scene_frame(scene, f),
                img_right=render_scene_frame(scene, f, baseline=0.5),
            )
        sessions.append(sys_)

    maps = [sessions[0].map, _rescale_session(sessions[1].map, scale_b)]
    stores = [s.edges for s in sessions]
    # Session-b odometry edges at its own (mis-scaled) measurement scale.
    stores[1] = stores[1]._replace(
        edge_T=stores[1].edge_T.at[:, :3, 3].multiply(scale_b)
    )
    merged, (ei, ej, eT, ew), links = merge_sessions(
        maps, stores, jax.random.PRNGKey(3), cfg.loop, mono=True
    )
    assert len(links) == 1
    # Alignment recovered the inverse scale offset.
    assert abs(links[0].scale - 1.0 / scale_b) < 0.06, links[0].scale
    # Session-b's origin keyframe lands near its GT pose at BASE scale.
    k_off = maps[0].kf_T_wc.shape[0]
    T_expect = scene.poses_wc[starts[1]]
    err_t = np.linalg.norm(
        np.asarray(merged.kf_T_wc[k_off])[:3, 3] - T_expect[:3, 3]
    )
    assert err_t < 0.3, err_t
    # Joint PGO over the merged graph stays finite and small: the rescaled
    # odometry measurements are consistent with the aligned poses.
    from laneslam.backend.pgo import PgoProblem, pgo_solve
    from laneslam.config import PgoConfig

    prob = PgoProblem(
        T_wc=merged.kf_T_wc, node_valid=merged.kf_valid,
        edge_i=ei, edge_j=ej, edge_T=eT, edge_weight=ew,
    )
    out, info = pgo_solve(prob, PgoConfig(gn_iters=5), num_fixed=1, cg_iters=30)
    assert bool(jnp.all(jnp.isfinite(out.T_wc)))
    c = np.asarray(info.cost)
    assert np.isfinite(c[-1]) and c[-1] <= c[0] + 1e-6, c
