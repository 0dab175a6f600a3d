"""Backend convergence tests (SURVEY.md §4.1 'Convergence' tier):

- BA on perturbed GT init: cost strictly decreases and recovers GT.
- Schur path == unreduced normal-equation path (same update to tolerance),
  pinning the Schur reduction's correctness independent of convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laneslam.backend.ba import BAProblem, ba_solve, ba_solve_unreduced
from laneslam.config import BaConfig
from laneslam.geometry import se3, so3
from laneslam.geometry.camera import Camera, project_points
from laneslam.geometry.lines import plucker_from_endpoints, plucker_normalize

from laneslam.testing import (
    TEST_CAM as CAM, make_ba_problem as make_problem,
    perturb_ba_problem as perturb,
)


class TestBA:
    def test_zero_residual_at_gt(self):
        prob, _ = make_problem(jax.random.PRNGKey(0))
        out, info = ba_solve(prob, CAM, BaConfig(gn_iters=1))
        assert float(info.cost[0]) < 1e-4

    def test_convergence_recovers_gt(self):
        prob, (T_gt, X_gt, L_gt) = make_problem(jax.random.PRNGKey(0))
        pert = perturb(prob, jax.random.PRNGKey(1), num_fixed=2)
        # Monocular gauge: fixing TWO poses pins the global scale too.
        out, info = ba_solve(pert, CAM, BaConfig(gn_iters=12, damping=1e-4), num_fixed_poses=2)
        cost = np.asarray(info.cost)
        assert cost[-1] < 1e-5 * cost[0], f"costs {cost}"
        np.testing.assert_allclose(np.asarray(out.T_cw), np.asarray(T_gt), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.points), np.asarray(X_gt), atol=1e-2)

    def test_cost_monotone_decrease(self):
        prob, _ = make_problem(jax.random.PRNGKey(2))
        pert = perturb(prob, jax.random.PRNGKey(3))
        _, info = ba_solve(pert, CAM, BaConfig(gn_iters=6, damping=1e-6))
        cost = np.asarray(info.cost)
        assert np.all(np.diff(cost) <= 1e-6 * cost[0]), f"costs {cost}"

    def test_schur_equals_unreduced(self):
        """One GN step via Schur == one step via dense normal equations.

        Uses a normalized camera (f=1) so the dense float32 oracle is
        well-conditioned; the comparison is about *algebraic* equivalence
        of the Schur reduction, not solver conditioning.
        """
        cam_n = Camera(fx=1.0, fy=1.0, cx=0.0, cy=0.0, width=2, height=2)
        prob, _ = make_problem(jax.random.PRNGKey(4), W=3, Np=15, Nl=6, cam=cam_n)
        pert = perturb(prob, jax.random.PRNGKey(5))
        cfg = BaConfig(gn_iters=1, damping=1e-4, huber_px=1e9)
        out_s, _ = ba_solve(pert, cam_n, cfg)
        out_d, _ = ba_solve_unreduced(pert, cam_n, cfg)
        # float32 dense-solve noise bounds the comparison (~1e-4 relative).
        np.testing.assert_allclose(
            np.asarray(out_s.T_cw), np.asarray(out_d.T_cw), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_s.points), np.asarray(out_d.points), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_s.lines), np.asarray(out_d.lines), atol=1e-4
        )

    def test_robust_to_outliers(self):
        prob, (T_gt, X_gt, _) = make_problem(jax.random.PRNGKey(6))
        # Corrupt 10% of point observations by 50 px.
        n = prob.pt_uv.shape[0]
        mask = jax.random.uniform(jax.random.PRNGKey(7), (n,)) < 0.1
        prob = prob._replace(pt_uv=jnp.where(mask[:, None], prob.pt_uv + 50.0, prob.pt_uv))
        pert = perturb(prob, jax.random.PRNGKey(8), num_fixed=2)
        out, info = ba_solve(
            pert, CAM,
            BaConfig(gn_iters=10, damping=1e-4, huber_px=1.0, outlier_px=3.0),
            num_fixed_poses=2,
        )
        # The re-gated inlier mask identifies the corrupted observations.
        surviving = np.asarray(out.pt_valid)
        assert surviving[np.asarray(mask)].mean() < 0.1
        # Pose error small despite outliers.
        err = np.asarray(se3.log(se3.inverse(out.T_cw) @ T_gt))
        assert np.abs(err).max() < 5e-3, err

    def test_masked_observations_ignored(self):
        prob, _ = make_problem(jax.random.PRNGKey(9))
        # Invalidate half the observations and corrupt their pixels wildly;
        # result must match the clean run on the same valid set.
        n = prob.pt_uv.shape[0]
        kill = jnp.arange(n) % 2 == 0
        base = prob._replace(pt_valid=prob.pt_valid & ~kill)
        corrupt = base._replace(
            pt_uv=jnp.where(kill[:, None], prob.pt_uv + 1000.0, prob.pt_uv)
        )
        pert_a = perturb(base, jax.random.PRNGKey(10))
        pert_b = perturb(corrupt, jax.random.PRNGKey(10))
        out_a, _ = ba_solve(pert_a, CAM, BaConfig(gn_iters=3))
        out_b, _ = ba_solve(pert_b, CAM, BaConfig(gn_iters=3))
        np.testing.assert_allclose(
            np.asarray(out_a.T_cw), np.asarray(out_b.T_cw), atol=1e-6
        )
