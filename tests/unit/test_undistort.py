"""geometry/undistort: radtan inverse + stereo rectification invariants."""

import numpy as np
import jax.numpy as jnp

from laneslam.geometry.undistort import (
    RectifyParams,
    radtan_distort,
    radtan_undistort,
    rectify_uv,
    stereo_rectify,
)

K0 = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1.0]])
K1 = np.array([[457.5, 0, 379.0], [0, 456.1, 255.0], [0, 0, 1.0]])
D0 = np.array([-0.28, 0.07, 1.8e-4, 1.5e-5])  # EuRoC-magnitude radtan
D1 = np.array([-0.28, 0.07, -1.0e-4, 1.0e-5])


def _rot(axis, ang):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx


def _project_raw(K, D, R_cw, t_cw, X):
    """Distorted projection of world points through an unrectified camera."""
    Xc = X @ R_cw.T + t_cw
    xy = Xc[:, :2] / Xc[:, 2:3]
    xyd = np.asarray(radtan_distort(jnp.asarray(xy), jnp.asarray(D)))
    u = K[0, 0] * xyd[:, 0] + K[0, 2]
    v = K[1, 1] * xyd[:, 1] + K[1, 2]
    return np.stack([u, v], axis=-1)


def test_radtan_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.45, 0.45, (500, 2))
    d = jnp.asarray(D0)
    back = np.asarray(radtan_undistort(radtan_distort(jnp.asarray(xy), d), d))
    np.testing.assert_allclose(back, xy, atol=1e-5)


def test_rectified_pair_is_row_aligned_with_metric_disparity():
    """Distorted, UNRECTIFIED stereo pair (rotated cam1): after rectify_uv
    the epipolar lines are rows and disparity gives metric depth."""
    rng = np.random.default_rng(1)
    # cam1: translated 11 cm mostly along x, rotated ~1.7 deg off-axis —
    # like EuRoC, same-row matching on raw coords would fail.
    R = _rot([0.3, 1.0, 0.2], np.deg2rad(1.7))
    t = np.array([-0.110, 0.0004, -0.0007])  # x1 = R x0 + t
    T_c1_c0 = np.eye(4)
    T_c1_c0[:3, :3] = R
    T_c1_c0[:3, 3] = t

    p0, p1, baseline = stereo_rectify(K0, D0, K1, D1, T_c1_c0, 752, 480)
    assert abs(baseline - np.linalg.norm(t)) < 1e-9

    X = np.stack([
        rng.uniform(-2, 2, 300), rng.uniform(-1.5, 1.5, 300), rng.uniform(2.0, 9.0, 300)
    ], axis=-1)  # world == cam0 frame
    uv0_raw = _project_raw(K0, D0, np.eye(3), np.zeros(3), X)
    uv1_raw = _project_raw(K1, D1, R, t, X)
    in_img = (
        (uv0_raw[:, 0] > 10) & (uv0_raw[:, 0] < 742) & (uv0_raw[:, 1] > 10)
        & (uv0_raw[:, 1] < 470) & (uv1_raw[:, 0] > 10) & (uv1_raw[:, 0] < 742)
        & (uv1_raw[:, 1] > 10) & (uv1_raw[:, 1] < 470)
    )
    # Raw rows do NOT align (the fixture really is unrectified).
    dv_raw = np.abs(uv0_raw[in_img, 1] - uv1_raw[in_img, 1])
    assert np.median(dv_raw) > 2.0

    uv0 = np.asarray(rectify_uv(jnp.asarray(uv0_raw), p0))
    uv1 = np.asarray(rectify_uv(jnp.asarray(uv1_raw), p1))
    dv = np.abs(uv0[in_img, 1] - uv1[in_img, 1])
    assert np.max(dv) < 0.1, f"rows misaligned: max dv {np.max(dv)}"

    disp = uv0[in_img, 0] - uv1[in_img, 0]
    assert np.all(disp > 0)
    f_new = float(p0.K_new[0, 0])
    z_rect = np.asarray(
        (jnp.einsum("ij,nj->ni", p0.R_rect, jnp.asarray(X)))
    )[in_img, 2]
    np.testing.assert_allclose(f_new * baseline / disp, z_rect, rtol=1e-3)
