"""Map ops + loop-closure machinery on hand-built clean states."""

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import LoopConfig, MapConfig
from laneslam.geometry import se3, so3
from laneslam.loop.kfdb import aggregate_descriptor, codebook, query_kfdb
from laneslam.loop.verify import verify_loop
from laneslam.map import ops
from laneslam.map.map import make_empty_map

CFG = MapConfig(max_keyframes=16, max_points=256, max_lines=64,
                max_obs_per_kf=32, max_line_obs_per_kf=8)


def test_add_points_bump_and_overflow():
    m = make_empty_map(MapConfig(max_keyframes=4, max_points=8, max_lines=4,
                                 max_obs_per_kf=4, max_line_obs_per_kf=2))
    xyz = jnp.arange(18, dtype=jnp.float32).reshape(6, 3)
    desc = jnp.ones((6, 256))
    valid = jnp.array([True, False, True, True, True, True])
    m, ids = ops.add_points(m, xyz, desc, valid, jnp.zeros(6, jnp.int32))
    assert int(m.pt_count) == 5
    assert np.asarray(ids).tolist() == [0, -1, 1, 2, 3, 4]
    # Second add overflows capacity 8: 5 + 5 -> 8 kept, 2 dropped.
    m, ids2 = ops.add_points(m, xyz, desc, jnp.ones(6, bool) & valid, jnp.zeros(6, jnp.int32))
    assert int(m.pt_count) == 8
    assert int(m.pt_overflow) == 2
    assert np.asarray(ids2).tolist() == [5, -1, 6, 7, -1, -1]


def test_covisibility_counts():
    m = make_empty_map(CFG)
    Op = CFG.max_obs_per_kf
    def row(ids):
        r = -jnp.ones((Op,), jnp.int32)
        return r.at[: len(ids)].set(jnp.asarray(ids, jnp.int32))
    uv = jnp.zeros((Op, 2))
    ln = -jnp.ones((CFG.max_line_obs_per_kf,), jnp.int32)
    seg = jnp.zeros((CFG.max_line_obs_per_kf, 4))
    agg = jnp.zeros((128,))
    m, k0 = ops.insert_keyframe(m, jnp.eye(4), row([0, 1, 2, 3]), uv, ln, seg, agg)
    m, k1 = ops.insert_keyframe(m, jnp.eye(4), row([2, 3, 4]), uv, ln, seg, agg)
    m, k2 = ops.insert_keyframe(m, jnp.eye(4), row([7, 8]), uv, ln, seg, agg)
    cov = np.asarray(m.covis)
    assert cov[0, 1] == 2 and cov[1, 0] == 2  # shared {2, 3}
    assert cov[0, 2] == 0 and cov[2, 1] == 0


def test_window_gather_scatter_roundtrip():
    m = make_empty_map(CFG)
    Op, Ol = CFG.max_obs_per_kf, CFG.max_line_obs_per_kf
    uv = jnp.zeros((Op, 2))
    ln = -jnp.ones((Ol,), jnp.int32)
    seg = jnp.zeros((Ol, 4))
    agg = jnp.zeros((128,))
    for k in range(3):
        T = se3.exp(jnp.arange(6, dtype=jnp.float32) * 0.01 * (k + 1))
        m, _ = ops.insert_keyframe(m, T, -jnp.ones((Op,), jnp.int32), uv, ln, seg, agg)
    ids, valid = ops.window_ids(m, 8)
    assert np.asarray(valid).sum() == 3
    prob, tables = ops.gather_window(m, ids, valid)
    # Scatter back unchanged: poses must round-trip.
    m2 = ops.scatter_window(m, prob, ids, valid, tables)
    np.testing.assert_allclose(np.asarray(m2.kf_T_wc), np.asarray(m.kf_T_wc), atol=1e-5)


def test_window_compaction_maps_landmarks_locally():
    """gather_window compacts window landmarks to dense local slots
    (VERDICT r3 #2 block-sparse assembly) and scatter_window writes the
    optimized values back to the right global slots."""
    m = make_empty_map(CFG)
    Op, Ol = CFG.max_obs_per_kf, CFG.max_line_obs_per_kf
    uv = jnp.zeros((Op, 2)); lnrow = -jnp.ones((Ol,), jnp.int32)
    seg = jnp.zeros((Ol, 4)); agg = jnp.zeros((128,))
    X = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)), jnp.float32)
    m, pids = ops.add_points(m, X, jnp.ones((10, 256)), jnp.ones(10, bool),
                             jnp.zeros(10, jnp.int32))
    # KF0 observes landmarks {0, 3, 5}; KF1 observes {3, 5, 7} (shared 3, 5).
    r0 = -jnp.ones((Op,), jnp.int32)
    r0 = r0.at[0].set(0).at[1].set(3).at[2].set(5)
    r1 = -jnp.ones((Op,), jnp.int32)
    r1 = r1.at[0].set(3).at[1].set(5).at[2].set(7)
    m, _ = ops.insert_keyframe(m, jnp.eye(4), r0, uv, lnrow, seg, agg)
    m, _ = ops.insert_keyframe(m, jnp.eye(4), r1, uv, lnrow, seg, agg)
    ids, valid = ops.window_ids(m, 4)
    prob, (pt_l2g, ln_l2g) = ops.gather_window(m, ids, valid)
    P = m.pt_xyz.shape[0]
    used = np.asarray(pt_l2g[pt_l2g < P])
    assert sorted(used.tolist()) == [0, 3, 5, 7]  # distinct, shared dedup'd
    assert int(np.asarray(prob.pt_valid).sum()) == 6  # 3 + 3 observations
    # Local ids of shared landmarks agree across keyframes.
    pp = np.asarray(prob.pt_p).reshape(len(ids), Op)
    assert pp[0][1] == pp[1][0]  # landmark 3
    assert pp[0][2] == pp[1][1]  # landmark 5
    # Compacted coordinates match the global ones.
    l2g = np.asarray(pt_l2g)
    for loc in range(4):
        np.testing.assert_allclose(
            np.asarray(prob.points[loc]), np.asarray(m.pt_xyz[l2g[loc]])
        )
    # Perturb local landmark values; scatter must land on the global slots.
    prob2 = prob._replace(points=prob.points + 1.0)
    m2 = ops.scatter_window(m, prob2, ids, valid, (pt_l2g, ln_l2g))
    for g in [0, 3, 5, 7]:
        np.testing.assert_allclose(
            np.asarray(m2.pt_xyz[g]), np.asarray(m.pt_xyz[g]) + 1.0, atol=1e-6
        )
    # Untouched landmarks stay put.
    np.testing.assert_allclose(np.asarray(m2.pt_xyz[1]), np.asarray(m.pt_xyz[1]))


def test_pose_corrections_move_landmarks():
    m = make_empty_map(CFG)
    Op, Ol = CFG.max_obs_per_kf, CFG.max_line_obs_per_kf
    uv = jnp.zeros((Op, 2)); ln = -jnp.ones((Ol,), jnp.int32)
    seg = jnp.zeros((Ol, 4)); agg = jnp.zeros((128,))
    m, k0 = ops.insert_keyframe(m, jnp.eye(4), -jnp.ones((Op,), jnp.int32), uv, ln, seg, agg)
    X = jnp.array([[1.0, 2.0, 3.0]])
    m, ids = ops.add_points(m, X, jnp.ones((1, 256)), jnp.ones(1, bool), jnp.zeros(1, jnp.int32))
    D = se3.exp(jnp.array([0.5, 0.0, 0.0, 0.0, 0.3, 0.0]))
    T_new = m.kf_T_wc.at[0].set(D @ m.kf_T_wc[0])
    m2 = ops.apply_pose_corrections(m, T_new)
    np.testing.assert_allclose(
        np.asarray(m2.pt_xyz[0]), np.asarray(se3.transform_points(D, X[0])), atol=1e-5
    )


class TestKfdb:
    def test_distinct_scenes_distinct_histograms(self):
        vocab = codebook(128, 64)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        d1 = jax.random.normal(k1, (100, 64))
        d2 = jax.random.normal(k2, (100, 64))
        d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        v = jnp.ones(100, bool)
        h1 = aggregate_descriptor(d1, v, vocab)
        h1b = aggregate_descriptor(d1, v, vocab)
        h2 = aggregate_descriptor(d2, v, vocab)
        assert float(h1 @ h1b) > 0.999  # deterministic
        assert float(h1 @ h2) < 0.9  # different content separable

    def test_query_respects_gap_and_threshold(self):
        K = 32
        db = jnp.tile(jnp.eye(1, 128)[0], (K, 1))  # all identical
        valid = jnp.ones(K, bool)
        cfg = LoopConfig(min_kf_gap=10, min_similarity=0.5, top_k=3)
        ids, sims = query_kfdb(db, valid, db[0], jnp.asarray(25), cfg)
        assert np.asarray(ids).max() < 15  # gap respected
        ids2, _ = query_kfdb(db, valid, db[0], jnp.asarray(5), cfg)
        assert np.asarray(ids2).tolist() == [-1, -1, -1]  # no old-enough KF


def test_verify_loop_on_clean_duplicated_landmarks():
    """Two keyframes observing duplicated copies of the same physical points,
    with the current side offset by a drift transform: verify_loop must
    recover the drift and accept."""
    cfg = MapConfig(max_keyframes=8, max_points=256, max_lines=16,
                    max_obs_per_kf=32, max_line_obs_per_kf=4)
    m = make_empty_map(cfg)
    key = jax.random.PRNGKey(3)
    N = 30
    X_true = jax.random.normal(key, (N, 3)) * 3.0
    desc = jax.random.normal(jax.random.PRNGKey(4), (N, 256))
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)

    drift = se3.exp(jnp.array([0.4, -0.2, 0.3, 0.05, 0.08, -0.03]))
    X_drift = se3.transform_points(drift, X_true)

    m, ids_old = ops.add_points(m, X_true, desc, jnp.ones(N, bool), jnp.zeros(N, jnp.int32))
    m, ids_new = ops.add_points(m, X_drift, desc, jnp.ones(N, bool), jnp.ones(N, jnp.int32))

    Op, Ol = cfg.max_obs_per_kf, cfg.max_line_obs_per_kf
    def row(ids):
        r = -jnp.ones((Op,), jnp.int32)
        return r.at[: ids.shape[0]].set(ids)
    uv = jnp.zeros((Op, 2)); ln = -jnp.ones((Ol,), jnp.int32)
    seg = jnp.zeros((Ol, 4)); agg = jnp.zeros((128,))
    m, k_old = ops.insert_keyframe(m, jnp.eye(4), row(ids_old), uv, ln, seg, agg)
    T_cur = se3.exp(jnp.array([0.1, 0.0, 0.0, 0.0, 0.02, 0.0]))
    m, k_cur = ops.insert_keyframe(m, T_cur, row(ids_new), uv, ln, seg, agg)

    res = verify_loop(m, k_cur, k_old, jax.random.PRNGKey(5), LoopConfig(min_inliers=15))
    assert bool(res.accepted)
    assert int(res.num_inliers) >= 25
    # The recovered edge should equal inv(T_old) @ (inv(drift) @ T_cur):
    # moving cur-side geometry by inv(drift) aligns it onto old-side.
    T_expect = se3.inverse(jnp.eye(4)) @ (se3.inverse(drift) @ T_cur)
    np.testing.assert_allclose(np.asarray(res.T_rel), np.asarray(T_expect), atol=1e-3)


def test_verify_loop_recovers_mono_scale_drift():
    """Sim(3) path (SURVEY C13, VERDICT r2 #3): cur-side local geometry
    scaled by 1.1x (mono scale drift) — verify_loop(with_scale=True) must
    recover the scale to <2% and still accept."""
    cfg = MapConfig(max_keyframes=8, max_points=256, max_lines=16,
                    max_obs_per_kf=32, max_line_obs_per_kf=4)
    m = make_empty_map(cfg)
    N = 30
    X_true = jax.random.normal(jax.random.PRNGKey(3), (N, 3)) * 3.0
    desc = jax.random.normal(jax.random.PRNGKey(4), (N, 256))
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)

    lam = 1.1  # cur-side map is 10% too large
    drift = se3.exp(jnp.array([0.4, -0.2, 0.3, 0.05, 0.08, -0.03]))
    T_cur = se3.exp(jnp.array([0.1, 0.0, 0.0, 0.0, 0.02, 0.0]))
    # cur-local geometry = lam * (true cur-local geometry under drift)
    X_cur_local = lam * se3.transform_points(
        se3.inverse(T_cur), se3.transform_points(drift, X_true)
    )
    X_cur_world = se3.transform_points(T_cur, X_cur_local)

    m, ids_old = ops.add_points(m, X_true, desc, jnp.ones(N, bool), jnp.zeros(N, jnp.int32))
    m, ids_new = ops.add_points(m, X_cur_world, desc, jnp.ones(N, bool), jnp.ones(N, jnp.int32))

    Op, Ol = cfg.max_obs_per_kf, cfg.max_line_obs_per_kf

    def row(ids):
        r = -jnp.ones((Op,), jnp.int32)
        return r.at[: ids.shape[0]].set(ids)

    uv = jnp.zeros((Op, 2)); ln = -jnp.ones((Ol,), jnp.int32)
    seg = jnp.zeros((Ol, 4)); agg = jnp.zeros((128,))
    m, k_old = ops.insert_keyframe(m, jnp.eye(4), row(ids_old), uv, ln, seg, agg)
    m, k_cur = ops.insert_keyframe(m, T_cur, row(ids_new), uv, ln, seg, agg)

    res = verify_loop(m, k_cur, k_old, jax.random.PRNGKey(5),
                      LoopConfig(min_inliers=15), with_scale=True)
    assert bool(res.accepted)
    assert abs(float(res.scale) - 1.0 / lam) < 0.02 / lam, float(res.scale)
    # SE(3) fit on the same data must NOT be accepted with a good score:
    # the scale mismatch leaves few rigid-consistent pairs near the origin.
    res_se3 = verify_loop(m, k_cur, k_old, jax.random.PRNGKey(5),
                          LoopConfig(min_inliers=15), with_scale=False)
    assert int(res_se3.num_inliers) < int(res.num_inliers)


def test_apply_scale_correction_renormalizes_chain():
    """ops.apply_scale_correction: distributing s along (cand, cur] restores
    the cand->cur span length to <2% and leaves the prefix untouched."""
    cfg = MapConfig(max_keyframes=8, max_points=64, max_lines=8,
                    max_obs_per_kf=16, max_line_obs_per_kf=4)
    m = make_empty_map(cfg)
    lam = 1.1
    # Ground-truth chain: 6 keyframes advancing 1 m in z each; after kf2 the
    # estimated translations are scaled by lam (injected scale drift).
    t_gt = np.stack([np.array([0.0, 0, k], np.float32) for k in range(6)])
    t_est = t_gt.copy()
    for k in range(3, 6):
        t_est[k] = t_est[k - 1] + lam * (t_gt[k] - t_gt[k - 1])
    Op, Ol = cfg.max_obs_per_kf, cfg.max_line_obs_per_kf
    uv = jnp.zeros((Op, 2)); pr = -jnp.ones((Op,), jnp.int32)
    ln = -jnp.ones((Ol,), jnp.int32); seg = jnp.zeros((Ol, 4)); agg = jnp.zeros((128,))
    for k in range(6):
        T = jnp.eye(4).at[:3, 3].set(t_est[k])
        m, _ = ops.insert_keyframe(m, T, pr, uv, ln, seg, agg)
    # Landmark anchored at kf4, 2 m ahead of it (in drifted scale).
    X = jnp.asarray(t_est[4] + np.array([0, 0, 2.0 * lam], np.float32))[None]
    d = jnp.ones((1, 256)) / 16.0
    m, pid = ops.add_points(m, X, d, jnp.ones(1, bool), jnp.full(1, 4, jnp.int32))

    s = 1.0 / lam  # correction measured by Sim(3) verification at kf5 vs kf2
    m2 = ops.apply_scale_correction(m, jnp.asarray(2), jnp.asarray(5), jnp.asarray(s))
    t_new = np.asarray(m2.kf_T_wc[:6, :3, 3])
    # Prefix untouched.
    np.testing.assert_allclose(t_new[:3], t_est[:3], atol=1e-6)
    # Span length restored to <2% of ground truth.
    span_gt = np.linalg.norm(t_gt[5] - t_gt[2])
    span_new = np.linalg.norm(t_new[5] - t_new[2])
    assert abs(span_new - span_gt) / span_gt < 0.02
    # Landmark moved consistently with its anchor (stays ~2 m ahead of kf4
    # in corrected scale).
    X_new = np.asarray(m2.pt_xyz[int(pid[0])])
    ahead = X_new - t_new[4]
    assert abs(np.linalg.norm(ahead) - 2.0) < 0.1


def test_window_ids_covis_pulls_in_old_covisible_keyframe():
    """SURVEY C12: the covisibility-driven window = newest + most covisible,
    with the most recent W//2 guaranteed; on a revisit the old keyframe
    sharing landmarks with the newest gets a slot that last-W would not
    give it."""
    cfg = MapConfig(max_keyframes=16, max_points=512, max_lines=8,
                    max_obs_per_kf=32, max_line_obs_per_kf=4)
    m = make_empty_map(cfg)
    Op, Ol = cfg.max_obs_per_kf, cfg.max_line_obs_per_kf
    uv = jnp.zeros((Op, 2)); ln = -jnp.ones((Ol,), jnp.int32)
    seg = jnp.zeros((Ol, 4)); agg = jnp.zeros((128,))
    desc = jnp.ones((20, 256)) / 16.0

    def row(ids):
        r = -jnp.ones((Op,), jnp.int32)
        return r.at[: ids.shape[0]].set(ids)

    empty = -jnp.ones((Op,), jnp.int32)
    # kf0 observes landmarks L; kf1..kf8 observe nothing shared; kf9 (newest)
    # revisits kf0's landmarks.
    m, ids0 = ops.add_points(m, jnp.zeros((20, 3)), desc, jnp.ones(20, bool),
                             jnp.zeros(20, jnp.int32))
    m, _ = ops.insert_keyframe(m, jnp.eye(4), row(ids0), uv, ln, seg, agg)
    for k in range(1, 9):
        m, _ = ops.insert_keyframe(m, jnp.eye(4), empty, uv, ln, seg, agg)
    m, _ = ops.insert_keyframe(m, jnp.eye(4), row(ids0), uv, ln, seg, agg)

    W = 6
    ids, valid = ops.window_ids_covis(m, W)
    ids = np.asarray(ids)[np.asarray(valid)]
    assert 9 in ids  # newest
    assert 0 in ids  # the old covisible keyframe — last-W would start at 4
    assert 8 in ids  # recency guarantee (W//2 most recent)
    assert list(ids) == sorted(ids)  # ascending for num_fixed semantics

    ids_last, valid_last = ops.window_ids(m, W)
    assert 0 not in np.asarray(ids_last)[np.asarray(valid_last)]
