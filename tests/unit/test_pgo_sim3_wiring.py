"""Production Sim(3) PGO wiring (system._run_pgo_sim3, VERDICT r4 #1b).

The solver-level capability (backend/pgo.py, tests/backend/test_pgo_sim3.py)
must reach the live map: scale-drifted keyframe chain + a true-scale loop
edge in the EdgeStore -> poses recovered, anchored landmarks re-expressed
through the per-node similarity, and the node scales FOLDED back into the
stored edge measurements so a second solve is a near-no-op.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from laneslam.config import MapConfig, SlamConfig
from laneslam.map import ops
from laneslam.map.map import make_empty_map
from laneslam.system import EdgeStore, _add_edge, _run_pgo_sim3
from laneslam.testing import scale_drifted_circle

N = 24
RATE = 0.02


def _build(drift_rate=RATE):
    T_gt, T_est, rel_d, rel_loop = scale_drifted_circle(
        n=N, radius=5.0, drift_rate=drift_rate
    )
    mcfg = MapConfig(max_keyframes=32, max_points=256, max_lines=32,
                     max_obs_per_kf=8, max_line_obs_per_kf=4)
    m = make_empty_map(mcfg)
    Op, Ol = mcfg.max_obs_per_kf, mcfg.max_line_obs_per_kf
    no_pt = -jnp.ones((Op,), jnp.int32)
    no_ln = -jnp.ones((Ol,), jnp.int32)
    uv = jnp.zeros((Op, 2))
    seg = jnp.zeros((Ol, 4))
    agg = jnp.zeros((128,))
    for k in range(N):
        m, _ = ops.insert_keyframe(m, jnp.asarray(T_est[k]), no_pt, uv,
                                   no_ln, seg, agg)

    # One landmark per node: local offset [0.5, 0, 2] in the node's camera,
    # born at the node's DRIFTED local scale f_k = exp(rate * k).
    X_local = np.array([0.5, 0.0, 2.0], np.float32)
    f = np.exp(drift_rate * np.arange(N)).astype(np.float32)
    Xw_est = np.stack([
        (T_est[k, :3, :3] @ (f[k] * X_local)) + T_est[k, :3, 3]
        for k in range(N)
    ])
    Xw_true = np.stack([
        (T_gt[k, :3, :3] @ X_local) + T_gt[k, :3, 3] for k in range(N)
    ])
    m, ids = ops.add_points(
        m, jnp.asarray(Xw_est), jnp.zeros((N, 256)), jnp.ones((N,), bool),
        jnp.arange(N, dtype=jnp.int32),
    )
    assert int(m.pt_count) == N

    es = EdgeStore.empty(64)
    for k in range(N - 1):
        es = _add_edge(es, k, k + 1, jnp.asarray(rel_d[k]), 1.0)
    # Loop edge 0 -> N-1 at true scale; the verification would observe the
    # relative scale f_0 / f_{N-1} between the two ends' local maps.
    es = _add_edge(es, 0, N - 1, jnp.asarray(rel_loop), 5.0,
                   s=float(np.exp(-drift_rate * (N - 1))))
    return m, es, T_gt, Xw_true


def _pos_rmse(Ta, Tb):
    return float(np.sqrt(np.mean(
        np.sum((Ta[:, :3, 3] - Tb[:, :3, 3]) ** 2, axis=-1))))


def test_run_pgo_sim3_recovers_chain_and_landmarks():
    cfg = SlamConfig()
    m, es, T_gt, Xw_true = _build()
    err0 = _pos_rmse(np.asarray(m.kf_T_wc[:N]), T_gt)
    assert err0 > 0.5  # material drift

    m2, es2, cost = _run_pgo_sim3(m, es, cfg)
    T_out = np.asarray(m2.kf_T_wc[:N])
    assert np.all(np.isfinite(T_out))
    err1 = _pos_rmse(T_out, T_gt)
    assert err1 < 0.25 * err0, (err0, err1)

    # Landmarks rode their anchor's similarity correction.
    Xw_out = np.asarray(m2.pt_xyz[:N])
    lm_err0 = float(np.sqrt(np.mean(np.sum(
        (np.asarray(m.pt_xyz[:N]) - Xw_true) ** 2, axis=-1))))
    lm_err1 = float(np.sqrt(np.mean(np.sum((Xw_out - Xw_true) ** 2, axis=-1))))
    assert lm_err1 < 0.3 * lm_err0, (lm_err0, lm_err1)

    # Repeated solves must CONVERGE, not compound (the round-5 production
    # failure mode): chain edges re-measure to exact consistency after each
    # application, loop edges keep their verified tension, and the clamped
    # scale application means a large correction is absorbed over a few
    # solves. Assert error decreases monotonically-ish and the per-solve
    # movement shrinks to near-zero.
    m3, es3, _ = _run_pgo_sim3(m2, es2, cfg)
    err2 = _pos_rmse(np.asarray(m3.kf_T_wc[:N]), T_gt)
    assert err2 < err1 + 0.05 * err0, (err1, err2)
    m4, _es4, _ = _run_pgo_sim3(m3, es3, cfg)
    err3 = _pos_rmse(np.asarray(m4.kf_T_wc[:N]), T_gt)
    assert err3 < 0.25 * err0, (err0, err3)
    moved = _pos_rmse(np.asarray(m4.kf_T_wc[:N]), np.asarray(m3.kf_T_wc[:N]))
    assert moved < 0.08 * err0, moved


def test_run_pgo_sim3_identity_scales_matches_se3_behavior():
    """With no scale drift and edge_s == 1 everywhere, the Sim(3) path must
    not invent scale: node scales stay ~1 and poses stay near the (already
    consistent) chain."""
    cfg = SlamConfig()
    m, es, T_gt, _ = _build(drift_rate=0.0)
    m2, es2, cost = _run_pgo_sim3(m, es, cfg)
    T_out = np.asarray(m2.kf_T_wc[:N])
    assert _pos_rmse(T_out, T_gt) < 1e-2
    np.testing.assert_allclose(np.asarray(es2.edge_s[:N]), 1.0, atol=1e-3)
