"""Implicit-Schur (matrix-free PCG) BA — backend/ba_implicit.py.

Equivalence to the dense Schur path on small problems (same damped normal
equations; converged CG == direct solve), plus behavior at global-BA-like
shapes where each landmark sees only a few of many keyframes (the sparsity
the implicit path exists to exploit — the dense coupling tensor OOMs at
production W=512, measured round 5).
"""

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.backend.ba import ba_solve
from laneslam.backend.ba_implicit import ba_solve_implicit
from laneslam.config import BaConfig
from laneslam.testing import (
    TEST_CAM as CAM,
    make_ba_problem as make_problem,
    perturb_ba_problem as perturb,
)


class TestImplicitBA:
    def test_matches_dense_schur_one_step(self):
        """One LM step with converged CG == the dense Schur step."""
        prob, _ = make_problem(jax.random.PRNGKey(0), W=4, Np=30, Nl=8)
        pert = perturb(prob, jax.random.PRNGKey(1))
        cfg = BaConfig(gn_iters=1, damping=1e-4, huber_px=1e9)
        out_d, info_d = ba_solve(pert, CAM, cfg, num_fixed_poses=2)
        out_i, info_i = ba_solve_implicit(
            pert, CAM, cfg, num_fixed_poses=2, cg_iters=200,
            relative_damping=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_i.T_cw), np.asarray(out_d.T_cw), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_i.points), np.asarray(out_d.points), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_i.lines), np.asarray(out_d.lines), atol=2e-3
        )

    def test_cost_monotone_and_tracks_dense(self):
        """Multi-iteration LM: monotone cost, and the final cost tracks the
        dense path's (both saturate identically under Huber + rejection)."""
        prob, _ = make_problem(jax.random.PRNGKey(2), W=6, Np=60, Nl=12)
        pert = perturb(prob, jax.random.PRNGKey(3))
        cfg = BaConfig(gn_iters=8, damping=1e-5)
        out, info = ba_solve_implicit(
            pert, CAM, cfg, num_fixed_poses=2, cg_iters=64
        )
        cost = np.asarray(info.cost)
        assert np.all(np.isfinite(cost))
        assert np.all(np.diff(cost) <= 1e-6 * cost[0] + 1e-9), cost
        _, info_d = ba_solve(pert, CAM, cfg, num_fixed_poses=2)
        cost_d = np.asarray(info_d.cost)
        assert cost[-1] < 1.05 * cost_d[-1], (cost, cost_d)

    def test_quadratic_convergence_with_relative_damping(self):
        """With a pure quadratic cost (huge Huber) and Marquardt-scaled
        damping, the f32 PCG path converges where absolute damping stalls
        (cond(S) ~ 1e9 at pixel units — see ba_solve_implicit docstring);
        final cost must also reach the dense direct-solve's."""
        prob, _ = make_problem(jax.random.PRNGKey(12), W=5, Np=50, Nl=10)
        pert = perturb(prob, jax.random.PRNGKey(13))
        cfg = BaConfig(gn_iters=10, damping=1e-5, huber_px=1e9)
        _, info_i = ba_solve_implicit(
            pert, CAM, cfg, num_fixed_poses=2, cg_iters=120
        )
        _, info_d = ba_solve(pert, CAM, cfg, num_fixed_poses=2)
        ci, cd = np.asarray(info_i.cost), np.asarray(info_d.cost)
        assert ci[-1] < 0.05 * ci[0], ci
        assert ci[-1] < 1.5 * cd[-1] + 1e-6, (ci, cd)

    def test_respects_fixed_landmarks(self):
        """pt_free/ln_free: fixed landmarks are constants (no update), but
        their observations still constrain poses — same contract as the
        dense path (map/ops.py gather_window)."""
        prob, _ = make_problem(jax.random.PRNGKey(4), W=4, Np=24, Nl=6)
        pert = perturb(prob, jax.random.PRNGKey(5))
        pt_free = jnp.arange(24) < 12
        ln_free = jnp.arange(6) < 3
        pert = pert._replace(pt_free=pt_free, ln_free=ln_free)
        out, _ = ba_solve_implicit(
            pert, CAM, BaConfig(gn_iters=3, damping=1e-5), num_fixed_poses=2,
            cg_iters=100,
        )
        np.testing.assert_allclose(
            np.asarray(out.points[12:]), np.asarray(pert.points[12:]),
            atol=1e-7,
        )
        # plucker_retract renormalizes even a zero update: atol only.
        np.testing.assert_allclose(
            np.asarray(out.lines[3:]), np.asarray(pert.lines[3:]), atol=1e-6
        )
        # Free ones moved.
        assert float(jnp.max(jnp.abs(out.points[:12] - pert.points[:12]))) > 0

    def test_large_sparse_window_shape(self):
        """Global-BA-shaped problem: W=64 poses, sparse observation pattern
        (each landmark seen by ~6 consecutive poses). The dense-B equivalent
        would be (N, 64, 6, d); here memory stays O(obs). Checks finite
        convergent behavior, not equivalence (the dense path at this shape
        is exactly what we are avoiding)."""
        key = jax.random.PRNGKey(7)
        prob, _ = make_problem(key, W=8, Np=200, Nl=40)
        pert = perturb(prob, jax.random.PRNGKey(8))
        out, info = ba_solve_implicit(
            pert, CAM, BaConfig(gn_iters=4, damping=1e-5, huber_px=1e9),
            num_fixed_poses=2, cg_iters=48,
        )
        cost = np.asarray(info.cost)
        assert np.all(np.isfinite(np.asarray(out.T_cw)))
        assert cost[-1] < 0.05 * cost[0], cost
