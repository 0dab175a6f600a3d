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

CAM = Camera(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480)


def make_problem(key, W=4, Np=40, Nl=12, noise_px=0.0, cam=CAM):
    """World in front of a short forward-moving trajectory; exact projections."""
    CAM_ = cam
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X = jax.random.normal(k1, (Np, 3)) * jnp.array([3.0, 2.0, 1.5]) + jnp.array([0, 0, 8.0])
    e1 = jax.random.normal(k2, (Nl, 3)) * jnp.array([2.5, 1.5, 1.0]) + jnp.array([0, 0, 7.0])
    e2 = e1 + jax.random.normal(k3, (Nl, 3)) * 1.5
    L = plucker_normalize(plucker_from_endpoints(e1, e2))

    # Poses: forward motion with small rotations; T_wc then invert.
    ts = jnp.stack(
        [0.2 * jnp.arange(W), 0.02 * jnp.arange(W), 0.4 * jnp.arange(W)], axis=-1
    )
    ws = 0.02 * jax.random.normal(k4, (W, 3))
    T_wc = se3.make(so3.exp(ws), ts)
    T_cw = se3.inverse(T_wc)

    # Observations: every pose observes every landmark (exact projections).
    pt_w = jnp.tile(jnp.arange(W), Np)  # (W*Np,) pose index
    pt_p = jnp.repeat(jnp.arange(Np), W)
    uv, z = project_points(CAM_, se3.transform_points(T_cw[pt_w], X[pt_p]))
    pt_valid = z > 0.1

    ln_w = jnp.tile(jnp.arange(W), Nl)
    ln_l = jnp.repeat(jnp.arange(Nl), W)
    uv1, z1 = project_points(CAM_, se3.transform_points(T_cw[ln_w], e1[ln_l]))
    uv2, z2 = project_points(CAM_, se3.transform_points(T_cw[ln_w], e2[ln_l]))
    ln_seg = jnp.concatenate([uv1, uv2], axis=-1)
    ln_valid = (z1 > 0.1) & (z2 > 0.1)

    if noise_px > 0:
        kn = jax.random.PRNGKey(99)
        uv = uv + noise_px * jax.random.normal(kn, uv.shape)
        ln_seg = ln_seg + noise_px * jax.random.normal(kn, ln_seg.shape)

    prob = BAProblem(
        T_cw=T_cw,  # start at GT; tests perturb copies
        points=X,
        lines=L,
        pt_w=pt_w, pt_p=pt_p, pt_uv=uv, pt_valid=pt_valid,
        ln_w=ln_w, ln_l=ln_l, ln_seg=ln_seg, ln_valid=ln_valid,
    )
    return prob, (T_cw, X, L)


def perturb(prob, key, pose_scale=0.02, pt_scale=0.05, ln_scale=0.02, num_fixed=1):
    k1, k2, k3 = jax.random.split(key, 3)
    W = prob.T_cw.shape[0]
    xi = pose_scale * jax.random.normal(k1, (W, 6))
    xi = xi.at[:num_fixed].set(0.0)  # keep the gauge anchors at GT
    from laneslam.geometry.lines import plucker_retract

    return prob._replace(
        T_cw=se3.retract(prob.T_cw, xi),
        points=prob.points + pt_scale * jax.random.normal(k2, prob.points.shape),
        lines=plucker_retract(
            prob.lines, ln_scale * jax.random.normal(k3, (prob.lines.shape[0], 4))
        ),
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
