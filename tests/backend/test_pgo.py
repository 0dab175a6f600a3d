"""PGO convergence: odometry chain with drift + loop edge -> corrected."""

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.backend.pgo import PgoProblem, pgo_solve
from laneslam.config import PgoConfig
from laneslam.geometry import se3, so3


from laneslam.testing import circle_graph


def test_pgo_zero_at_gt():
    prob, T_gt = circle_graph(drift=0.0)
    out, info = pgo_solve(prob, PgoConfig(gn_iters=1))
    assert float(info.cost[0]) < 1e-8


def test_pgo_closes_loop():
    prob, T_gt = circle_graph(N=40, drift=0.02)
    out, info = pgo_solve(prob, PgoConfig(gn_iters=15, damping=1e-6), cg_iters=80)
    cost = np.asarray(info.cost)
    assert cost[-1] < 1e-3 * cost[0], f"costs {cost}"
    # Translations close to GT (gauge: node 0 fixed at GT).
    err = np.linalg.norm(
        np.asarray(out.T_wc[:, :3, 3]) - np.asarray(T_gt[:, :3, 3]), axis=-1
    )
    # The drifted chain alone has large end error; PGO must shrink it.
    err0 = np.linalg.norm(
        np.asarray(prob.T_wc[:, :3, 3]) - np.asarray(T_gt[:, :3, 3]), axis=-1
    )
    assert err.max() < 0.2 * err0.max(), (err.max(), err0.max())


def test_pgo_respects_masks():
    prob, _ = circle_graph(N=20, drift=0.01)
    # Append garbage edges with zero weight: result must be unchanged.
    E = prob.edge_i.shape[0]
    bad = PgoProblem(
        T_wc=prob.T_wc,
        node_valid=prob.node_valid,
        edge_i=jnp.concatenate([prob.edge_i, jnp.array([0, 5])]),
        edge_j=jnp.concatenate([prob.edge_j, jnp.array([10, 15])]),
        edge_T=jnp.concatenate([prob.edge_T, jnp.stack([jnp.eye(4)] * 2)]),
        edge_weight=jnp.concatenate([prob.edge_weight, jnp.zeros(2)]),
    )
    out_a, _ = pgo_solve(prob, PgoConfig(gn_iters=5))
    out_b, _ = pgo_solve(bad, PgoConfig(gn_iters=5))
    np.testing.assert_allclose(
        np.asarray(out_a.T_wc), np.asarray(out_b.T_wc), atol=1e-5
    )
