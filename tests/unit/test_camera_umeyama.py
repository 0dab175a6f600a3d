import jax
import jax.numpy as jnp
import numpy as np

from laneslam.geometry import se3, so3
from laneslam.geometry.camera import (
    Camera,
    backproject,
    line_point_distance,
    pixel_bearing,
    project_line,
    project_points,
)
from laneslam.geometry.lines import plucker_from_endpoints, plucker_transform
from laneslam.geometry.umeyama import umeyama_alignment

KEY = jax.random.PRNGKey(2)
CAM = Camera(fx=500.0, fy=510.0, cx=320.0, cy=240.0, width=640, height=480)


def test_project_backproject_roundtrip():
    uv = jax.random.uniform(KEY, (20, 2), minval=0, maxval=600)
    depth = jax.random.uniform(KEY, (20,), minval=1.0, maxval=10.0)
    X = backproject(CAM, uv, depth)
    uv2, z = project_points(CAM, X)
    np.testing.assert_allclose(uv2, uv, atol=1e-3)
    np.testing.assert_allclose(z, depth, atol=1e-5)


def test_line_projection_consistency():
    """Projected endpoints lie on the projected infinite line."""
    k1, k2 = jax.random.split(KEY)
    p1 = jax.random.normal(k1, (16, 3)) + jnp.array([0.0, 0.0, 6.0])
    p2 = jax.random.normal(k2, (16, 3)) + jnp.array([0.0, 0.0, 6.0])
    L_c = plucker_from_endpoints(p1, p2)
    l = project_line(CAM, L_c)
    uv1, _ = project_points(CAM, p1)
    uv2, _ = project_points(CAM, p2)
    np.testing.assert_allclose(line_point_distance(l, uv1), jnp.zeros(16), atol=1e-2)
    np.testing.assert_allclose(line_point_distance(l, uv2), jnp.zeros(16), atol=1e-2)


def test_line_projection_with_pose():
    """World line -> camera frame -> image; endpoints transformed the same way."""
    T_wc = se3.exp(jnp.array([0.1, -0.2, 0.3, 0.05, 0.1, -0.08]))
    T_cw = se3.inverse(T_wc)
    p1 = jnp.array([1.0, -0.5, 8.0])
    p2 = jnp.array([-1.0, 0.7, 9.0])
    L_w = plucker_from_endpoints(p1, p2)
    L_c = plucker_transform(T_cw, L_w)
    l = project_line(CAM, L_c)
    uv1, _ = project_points(CAM, se3.transform_points(T_cw, p1))
    np.testing.assert_allclose(line_point_distance(l, uv1), 0.0, atol=1e-2)


def test_umeyama_se3():
    R = so3.exp(jnp.array([0.4, -0.3, 0.2]))
    t = jnp.array([1.0, -2.0, 0.5])
    src = jax.random.normal(KEY, (50, 3))
    dst = src @ R.T + t
    s, R2, t2 = umeyama_alignment(src, dst, with_scale=False)
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-5)
    np.testing.assert_allclose(t2, t, atol=1e-5)


def test_umeyama_sim3_with_mask():
    R = so3.exp(jnp.array([-0.2, 0.1, 0.3]))
    t = jnp.array([0.3, 0.1, -0.7])
    scale = 2.5
    src = jax.random.normal(KEY, (60, 3))
    dst = scale * src @ R.T + t
    # Corrupt the masked-out tail; alignment must ignore it.
    dst = dst.at[50:].add(100.0)
    w = jnp.arange(60) < 50
    s, R2, t2 = umeyama_alignment(src, dst, weights=w.astype(jnp.float32), with_scale=True)
    np.testing.assert_allclose(s, scale, atol=1e-4)
    np.testing.assert_allclose(R2, R, atol=1e-5)
    np.testing.assert_allclose(t2, t, atol=1e-4)
