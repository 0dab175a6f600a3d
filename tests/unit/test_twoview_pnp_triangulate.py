import jax
import jax.numpy as jnp
import numpy as np

from laneslam.geometry import se3, so3
from laneslam.geometry.camera import Camera, project_points
from laneslam.geometry.pnp import solve_pnp_ransac
from laneslam.geometry.triangulate import triangulate_lines, triangulate_points_dlt
from laneslam.geometry.twoview import estimate_relative_pose

KEY = jax.random.PRNGKey(3)
CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)


def make_scene(key, n=128, depth=8.0):
    """Points in front of camera a; camera b displaced + rotated."""
    kx, = jax.random.split(key, 1)
    X = jax.random.normal(kx, (n, 3)) * jnp.array([3.0, 2.0, 2.0]) + jnp.array([0, 0, depth])
    R = so3.exp(jnp.array([0.02, -0.05, 0.01]))
    t = jnp.array([0.8, 0.1, 0.3])
    # x_b = R x_a + t (a->b transform)
    T_ba = se3.make(R, t)
    uv_a, za = project_points(CAM, X)
    Xb = se3.transform_points(T_ba, X)
    uv_b, zb = project_points(CAM, Xb)
    valid = (za > 0.1) & (zb > 0.1)
    return X, uv_a, uv_b, valid, R, t


def test_essential_ransac_recovers_pose():
    X, uv_a, uv_b, valid, R_gt, t_gt = make_scene(KEY)
    res = estimate_relative_pose(CAM, uv_a, uv_b, valid, jax.random.PRNGKey(7))
    assert int(res.num_inliers) > 100
    np.testing.assert_allclose(res.R, R_gt, atol=1e-3)
    t_dir = t_gt / jnp.linalg.norm(t_gt)
    np.testing.assert_allclose(res.t, t_dir, atol=1e-3)


def test_essential_ransac_with_outliers():
    X, uv_a, uv_b, valid, R_gt, t_gt = make_scene(KEY)
    # 30% outliers.
    k = jax.random.PRNGKey(11)
    noise = jax.random.uniform(k, uv_b.shape, minval=0, maxval=480)
    mask = jax.random.uniform(jax.random.PRNGKey(13), (uv_b.shape[0],)) < 0.3
    uv_b = jnp.where(mask[:, None], noise, uv_b)
    res = estimate_relative_pose(CAM, uv_a, uv_b, valid, jax.random.PRNGKey(7))
    np.testing.assert_allclose(res.R, R_gt, atol=5e-3)
    t_dir = t_gt / jnp.linalg.norm(t_gt)
    np.testing.assert_allclose(res.t, t_dir, atol=5e-3)
    # Outliers mostly rejected.
    assert float(jnp.mean(res.inliers[mask].astype(jnp.float32))) < 0.1


def test_pnp_ransac():
    X, uv_a, _, valid, _, _ = make_scene(KEY)
    # Ground-truth camera at a known pose; observe X from there.
    T_wc = se3.exp(jnp.array([0.3, -0.1, 0.2, 0.05, -0.03, 0.08]))
    T_cw = se3.inverse(T_wc)
    uv, z = project_points(CAM, se3.transform_points(T_cw, X))
    valid = z > 0.1
    # 20% outliers.
    mask = jax.random.uniform(jax.random.PRNGKey(5), (X.shape[0],)) < 0.2
    uv = jnp.where(mask[:, None], uv + 50.0, uv)
    res = solve_pnp_ransac(CAM, X, uv, valid, jax.random.PRNGKey(9))
    np.testing.assert_allclose(res.T_cw, T_cw, atol=1e-3)
    assert int(res.num_inliers) >= int(jnp.sum(valid & ~mask)) * 0.9


def test_triangulate_points():
    X, uv_a, uv_b, valid, R, t = make_scene(KEY)
    T_wc_a = jnp.eye(4)
    T_wc_b = se3.inverse(se3.make(R, t))  # world = frame a
    Xt, ok = triangulate_points_dlt(CAM, T_wc_a, T_wc_b, uv_a, uv_b)
    assert bool(jnp.all(ok[valid]))
    np.testing.assert_allclose(Xt[valid], X[valid], atol=1e-2)


def test_triangulate_lines():
    # 3D segments; project endpoints into two views; triangulate Plücker line.
    k1, k2 = jax.random.split(KEY)
    p1 = jax.random.normal(k1, (32, 3)) * 2 + jnp.array([0, 0, 8.0])
    p2 = p1 + jax.random.normal(k2, (32, 3))
    R = so3.exp(jnp.array([0.03, -0.02, 0.01]))
    t = jnp.array([1.0, 0.2, 0.1])
    T_ba = se3.make(R, t)
    T_wc_a = jnp.eye(4)
    T_wc_b = se3.inverse(T_ba)
    uv1a, _ = project_points(CAM, p1)
    uv2a, _ = project_points(CAM, p2)
    uv1b, _ = project_points(CAM, se3.transform_points(T_ba, p1))
    uv2b, _ = project_points(CAM, se3.transform_points(T_ba, p2))
    seg_a = jnp.concatenate([uv1a, uv2a], axis=-1)
    seg_b = jnp.concatenate([uv1b, uv2b], axis=-1)
    L, ok = triangulate_lines(CAM, T_wc_a, T_wc_b, seg_a, seg_b)
    from laneslam.geometry.lines import plucker_from_endpoints, plucker_normalize

    L_gt = plucker_normalize(plucker_from_endpoints(p1, p2))
    # Sign-invariant comparison on valid lines.
    d = jnp.minimum(
        jnp.abs(L - L_gt).max(axis=-1), jnp.abs(L + L_gt).max(axis=-1)
    )
    assert float(jnp.mean(ok.astype(jnp.float32))) > 0.9
    assert float(d[ok].max()) < 1e-2
