import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fixtures.mini_kitti import write_mini_kitti

from laneslam.data.kitti import KittiOdometry
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame, scene_observations
from laneslam.eval.ate import ate_rmse, rpe
from laneslam.eval.writers import write_kitti_trajectory, write_tum_trajectory
from laneslam.geometry import se3


def test_synthetic_scene_deterministic():
    s1 = make_corridor_scene(seed=3, num_frames=5)
    s2 = make_corridor_scene(seed=3, num_frames=5)
    np.testing.assert_array_equal(s1.points, s2.points)
    np.testing.assert_array_equal(s1.segments, s2.segments)
    np.testing.assert_array_equal(
        render_scene_frame(s1, 2), render_scene_frame(s2, 2)
    )


def test_scene_observations_visible():
    s = make_corridor_scene(seed=0, num_frames=10)
    uv, vis, seg, vis_l = scene_observations(s, 0)
    assert vis.sum() > 50
    assert vis_l.sum() > 5


def test_mini_kitti_roundtrip(tmp_path):
    scene = write_mini_kitti(str(tmp_path), num_frames=6)
    ds = KittiOdometry(str(tmp_path), "00")
    assert len(ds) == 6
    img = ds.read_frame(0)
    assert img.shape == (480, 640) and img.dtype == np.uint8
    cam = ds.camera
    assert abs(float(cam.fx) - float(scene.cam.fx)) < 1e-6
    assert abs(cam.baseline - 0.5) < 1e-9
    np.testing.assert_allclose(ds.gt_poses, scene.poses_wc, atol=1e-6)


def test_ate_zero_for_identical():
    T = se3.exp(jax.random.normal(jax.random.PRNGKey(0), (10, 6)) * 0.3)
    rmse, err = ate_rmse(T, T)
    assert float(rmse) < 1e-5


def test_ate_invariant_to_sim3():
    T = se3.exp(jax.random.normal(jax.random.PRNGKey(1), (20, 6)) * 0.5)
    # Apply a global Sim(3) to the estimate: ATE (with scale) must stay ~0.
    s = 2.0
    G = se3.exp(jnp.array([1.0, -2.0, 0.5, 0.3, 0.2, -0.1]))
    T_est = T.at[:, :3, 3].set(s * (T[:, :3, 3] @ G[:3, :3].T) + G[:3, 3])
    rmse, _ = ate_rmse(T_est, T, align_scale=True)
    assert float(rmse) < 1e-4


def test_ate_detects_error():
    T = se3.exp(jax.random.normal(jax.random.PRNGKey(2), (30, 6)))
    T_bad = T.at[:, 0, 3].add(jax.random.normal(jax.random.PRNGKey(3), (30,)))
    rmse, _ = ate_rmse(T_bad, T, align_scale=False)
    assert float(rmse) > 0.3


def test_rpe_identity():
    T = se3.exp(jax.random.normal(jax.random.PRNGKey(4), (10, 6)) * 0.2)
    t_err, r_err = rpe(T, T)
    assert float(t_err) < 1e-5 and float(r_err) < 1e-3


def test_writers(tmp_path):
    T = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    T[:, 0, 3] = np.arange(5)
    kp = str(tmp_path / "kitti.txt")
    write_kitti_trajectory(kp, T)
    back = np.loadtxt(kp).reshape(-1, 3, 4)
    np.testing.assert_allclose(back, T[:, :3, :], atol=1e-7)
    tp = str(tmp_path / "tum.txt")
    write_tum_trajectory(tp, T)
    rows = np.loadtxt(tp)
    assert rows.shape == (5, 8)
    np.testing.assert_allclose(rows[:, 1], np.arange(5), atol=1e-7)
    np.testing.assert_allclose(rows[:, 7], np.ones(5), atol=1e-7)  # qw = 1
