"""P2 invariant (SURVEY.md §4.1 'Distributed' tier): the landmark-block
sharded BA step over a fake 8-device CPU mesh equals the single-device
Schur path bit-for-tolerance."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from backend.test_ba import CAM, make_problem, perturb

from laneslam.backend.ba import ba_solve
from laneslam.config import BaConfig
from laneslam.dist.ba_tp import ba_gn_step_sharded, ba_solve_sharded, shard_problem, unshard
from laneslam.dist.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (fake) devices")
    return make_mesh(jax.devices()[:8], frame=1, block=8)


def _pad_problem(prob, n_blocks=8):
    """Capacities must divide n_blocks: the test problem already uses
    Np=40 -> pad to 48, Nl=12 -> pad to 16."""
    Np, Nl = prob.points.shape[0], prob.lines.shape[0]
    np_pad = (-Np) % n_blocks
    nl_pad = (-Nl) % n_blocks
    return prob._replace(
        points=jnp.pad(prob.points, ((0, np_pad), (0, 0))),
        lines=jnp.pad(prob.lines, ((0, nl_pad), (0, 0))),
    )


def test_shard_roundtrip(mesh8):
    prob, _ = make_problem(jax.random.PRNGKey(0), W=4, Np=40, Nl=16)
    prob = _pad_problem(prob)
    sp = shard_problem(prob, 8)
    T, pts, lns = unshard(sp)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(prob.points))
    np.testing.assert_allclose(np.asarray(lns), np.asarray(prob.lines))
    # Every valid observation lands in exactly one bucket.
    assert int(sp.pt_valid.sum()) == int(prob.pt_valid.sum())
    assert int(sp.ln_valid.sum()) == int(prob.ln_valid.sum())
    # Bucketed (block, local) pairs reference the same landmarks.
    npb = prob.points.shape[0] // 8
    blk_ids = np.asarray(sp.pt_p) + npb * np.arange(8)[:, None]
    got = np.sort(blk_ids[np.asarray(sp.pt_valid)])
    want = np.sort(np.asarray(prob.pt_p)[np.asarray(prob.pt_valid)])
    np.testing.assert_array_equal(got, want)


def test_sharded_step_equals_single_device(mesh8):
    prob, _ = make_problem(jax.random.PRNGKey(4), W=4, Np=40, Nl=16)
    prob = _pad_problem(prob)
    pert = perturb(prob, jax.random.PRNGKey(5), num_fixed=2)
    cfg = BaConfig(gn_iters=1, damping=1e-3, huber_px=1e9)

    out_single, _ = ba_solve(pert, CAM, cfg, num_fixed_poses=2)
    sp = shard_problem(pert, 8)
    out_sp, cost, accept = ba_gn_step_sharded(
        sp, jnp.asarray(cfg.damping), CAM, mesh8, cfg, num_fixed_poses=2
    )
    T, pts, lns = unshard(out_sp)
    np.testing.assert_allclose(np.asarray(T), np.asarray(out_single.T_cw), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(out_single.points), atol=2e-3)
    # Different psum reduction order vs the single-device einsum: float32
    # noise on the line parameters is a few 1e-4.
    np.testing.assert_allclose(np.asarray(lns), np.asarray(out_single.lines), atol=8e-4)


def test_sharded_solve_converges(mesh8):
    """Same LM schedule as the single-device convergence test (gn_iters>=12:
    the damping search consumes several rejected trials before the robust
    cost breaks through its Huber plateau — identical on both paths)."""
    prob, (T_gt, X_gt, _) = make_problem(jax.random.PRNGKey(6), W=4, Np=40, Nl=16)
    prob = _pad_problem(prob)
    pert = perturb(prob, jax.random.PRNGKey(7), num_fixed=2)
    cfg = BaConfig(gn_iters=14, damping=1e-4)
    out, costs = ba_solve_sharded(pert, CAM, mesh8, cfg, num_fixed_poses=2)
    c = np.asarray(costs)
    assert np.all(np.diff(c) <= 1e-6 * c[0]), c  # monotone (accept/reject)
    assert c[-1] < 1e-3 * c[0], c
    np.testing.assert_allclose(np.asarray(out.T_cw), np.asarray(T_gt), atol=1e-2)
