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
    prob = ops.gather_window(m, ids, valid)
    # Scatter back unchanged: poses must round-trip.
    m2 = ops.scatter_window(m, prob, ids, valid)
    np.testing.assert_allclose(np.asarray(m2.kf_T_wc), np.asarray(m.kf_T_wc), atol=1e-5)


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
