"""Sim(3) pose-graph optimization (backend/pgo.py pgo_solve_sim3).

The signature capability (Strasdat RSS 2010): a mono odometry chain whose
translations carry exponentially accumulating SCALE drift closes a loop
whose edge was measured at true scale. An SE(3) graph cannot express the
uniform-stretch correction (it must bend the chain rigidly); a Sim(3)
graph absorbs it into per-node log-scales and recovers the trajectory.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.backend.pgo import (
    PgoProblem, PgoSim3Problem, pgo_solve, pgo_solve_sim3,
)
from laneslam.config import PgoConfig
from laneslam.geometry import se3


def _circle_chain(n=32, radius=5.0, drift_rate=0.02):
    """GT circle trajectory + scale-drifted odometry estimate.

    Returns (T_gt (n,4,4), T_est (n,4,4), rel_drifted (n-1,4,4),
    rel_true_loop (4,4) for edge 0 -> n-1)."""
    ang = np.linspace(0, 2 * np.pi * (n - 1) / n, n)
    T_gt = np.zeros((n, 4, 4), np.float32)
    for k, a in enumerate(ang):
        c, s = np.cos(a), np.sin(a)
        # camera yaw follows the tangent
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.array([radius * c, radius * s, 0], np.float32)
        T_gt[k, :3, :3] = R
        T_gt[k, :3, 3] = t
        T_gt[k, 3, 3] = 1
    rel = np.stack(
        [np.asarray(se3.inverse(jnp.asarray(T_gt[k])) @ T_gt[k + 1])
         for k in range(n - 1)]
    )
    # Mono-style drift: step k's translation measured at scale exp(k*rate).
    rel_d = rel.copy()
    for k in range(n - 1):
        rel_d[k, :3, 3] *= np.exp(drift_rate * k)
    T_est = np.zeros_like(T_gt)
    T_est[0] = T_gt[0]
    for k in range(n - 1):
        T_est[k + 1] = T_est[k] @ rel_d[k]
    rel_loop = np.asarray(se3.inverse(jnp.asarray(T_gt[0])) @ T_gt[n - 1])
    return T_gt, T_est, rel_d, rel_loop


def _build_edges(n, rel_d, rel_loop, drift_rate=0.02):
    """n-1 odometry edges (locally scale-consistent: edge_s = 1) + 1 loop
    edge. The loop's Sim(3) verification OBSERVES the accumulated scale
    mismatch between the two ends' local maps — that observed relative
    scale (s_j/s_i = e^{-rate*(n-1)}) rides on the edge; an edge_s of 1
    would wrongly pin the endpoint scales equal."""
    ei = np.concatenate([np.arange(n - 1), [0]]).astype(np.int32)
    ej = np.concatenate([np.arange(1, n), [n - 1]]).astype(np.int32)
    eT = np.concatenate([rel_d, rel_loop[None]]).astype(np.float32)
    es = np.concatenate(
        [np.ones(n - 1), [np.exp(-drift_rate * (n - 1))]]
    ).astype(np.float32)
    ew = np.concatenate([np.ones(n - 1), [5.0]]).astype(np.float32)
    return ei, ej, eT, es, ew


def _pos_rmse(Ta, Tb):
    return float(np.sqrt(np.mean(
        np.sum((Ta[:, :3, 3] - Tb[:, :3, 3]) ** 2, axis=-1)
    )))


@pytest.fixture(scope="module")
def chain():
    return _circle_chain()


def test_sim3_recovers_scale_drift(chain):
    T_gt, T_est, rel_d, rel_loop = chain
    n = len(T_gt)
    ei, ej, eT, es, ew = _build_edges(n, rel_d, rel_loop)
    err0 = _pos_rmse(T_est, T_gt)
    assert err0 > 1.0  # the drift is material

    prob = PgoSim3Problem(
        T_wc=jnp.asarray(T_est), s_wc=jnp.ones(n),
        node_valid=jnp.ones(n, bool),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        edge_T=jnp.asarray(eT), edge_s=jnp.asarray(es),
        edge_weight=jnp.asarray(ew),
    )
    out, info = pgo_solve_sim3(
        prob, PgoConfig(gn_iters=15), num_fixed=1, cg_iters=60
    )
    T_out = np.asarray(out.T_wc)
    err1 = _pos_rmse(T_out, T_gt)
    assert np.all(np.isfinite(T_out))
    assert err1 < 0.25 * err0, (err0, err1)
    # Recovered node log-scales must track the injected drift profile
    # (monotone decrease ~ exp(-rate*k) relative to node 0, up to gauge).
    s = np.asarray(out.s_wc)
    assert s[0] == pytest.approx(1.0)  # fixed node
    assert np.all(np.isfinite(s))
    corr = np.corrcoef(np.log(np.abs(s) + 1e-12), -0.02 * np.arange(n))[0, 1]
    assert corr > 0.9, corr


def test_se3_cannot_express_the_stretch(chain):
    """Control: the same graph through SE(3) PGO leaves most of the error —
    the uniform stretch is outside its model class."""
    T_gt, T_est, rel_d, rel_loop = chain
    n = len(T_gt)
    ei, ej, eT, es, ew = _build_edges(n, rel_d, rel_loop)
    err0 = _pos_rmse(T_est, T_gt)
    prob = PgoProblem(
        T_wc=jnp.asarray(T_est), node_valid=jnp.ones(n, bool),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        edge_T=jnp.asarray(eT), edge_weight=jnp.asarray(ew),
    )
    out, _ = pgo_solve(prob, PgoConfig(gn_iters=15), num_fixed=1, cg_iters=60)
    err_se3 = _pos_rmse(np.asarray(out.T_wc), T_gt)
    # SE(3) helps some (the loop edge drags endpoints) but must be clearly
    # worse than Sim(3)'s < 0.25x bound on this fixture.
    assert err_se3 > 0.35 * err0, (err0, err_se3)


def test_sim3_padded_edges_and_invalid_nodes(chain):
    """Zero-weight slots and invalid nodes are inert (fixed-capacity
    tables): same contract as the SE(3) solver."""
    T_gt, T_est, rel_d, rel_loop = chain
    n = len(T_gt)
    ei, ej, eT, es, ew = _build_edges(n, rel_d, rel_loop)
    pad = 8
    Np = n + 4
    prob = PgoSim3Problem(
        T_wc=jnp.concatenate([jnp.asarray(T_est),
                              jnp.tile(jnp.eye(4), (4, 1, 1))]),
        s_wc=jnp.ones(Np),
        node_valid=jnp.asarray([True] * n + [False] * 4),
        edge_i=jnp.concatenate([jnp.asarray(ei), jnp.zeros(pad, jnp.int32)]),
        edge_j=jnp.concatenate([jnp.asarray(ej), jnp.zeros(pad, jnp.int32)]),
        edge_T=jnp.concatenate([jnp.asarray(eT),
                                jnp.tile(jnp.eye(4), (pad, 1, 1))]),
        edge_s=jnp.concatenate([jnp.asarray(es), jnp.ones(pad)]),
        edge_weight=jnp.concatenate([jnp.asarray(ew), jnp.zeros(pad)]),
    )
    out, _ = pgo_solve_sim3(
        prob, PgoConfig(gn_iters=15), num_fixed=1, cg_iters=60
    )
    T_out = np.asarray(out.T_wc)
    assert _pos_rmse(T_out[:n], T_gt) < 0.25 * _pos_rmse(T_est, T_gt)
    # padded nodes untouched
    np.testing.assert_allclose(T_out[n:], np.tile(np.eye(4), (4, 1, 1)),
                               atol=1e-6)
