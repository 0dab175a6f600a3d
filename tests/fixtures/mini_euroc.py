"""Write a EuRoC-ASL-layout directory from a synthetic scene, with REAL
distortion and an UNRECTIFIED stereo pair (SURVEY.md §4.2; VERDICT r2 #4).

The frames are rendered through two radial-tangentially distorted cameras
whose relative pose includes a small rotation (like the real MAV rig), and
GT is written as BODY poses through a non-trivial T_BS — so the loader's
rectification (geometry/undistort.py) and T_BS GT conversion are both on
the tested path, not bypassed.
"""

from __future__ import annotations

import os

import numpy as np

from laneslam.data.synthetic import (
    SyntheticScene,
    make_corridor_scene,
    render_distorted_frame,
)

W, H = 640, 480
K0 = np.array([[460.0, 0, 325.0], [0, 459.0, 242.0], [0, 0, 1.0]])
K1 = np.array([[461.5, 0, 335.0], [0, 460.2, 238.0], [0, 0, 1.0]])
D0 = np.array([-0.28, 0.07, 1.8e-4, 1.5e-5])
D1 = np.array([-0.28, 0.07, -1.0e-4, 1.0e-5])


def _rot(axis, ang):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx


def _T(R=np.eye(3), t=(0, 0, 0)):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


# cam1 relative to cam0: 11 cm along x plus ~1.5 deg off-axis rotation.
T_C1_C0 = _T(_rot([0.2, 1.0, 0.1], np.deg2rad(1.5)), (-0.110, 0.0005, -0.0008))
# Body->cam lever arm: ~10 cm offset + 5 deg tilt (makes the T_BS GT path
# observable: skipping it biases ATE by the lever arm).
T_BS0 = _T(_rot([1.0, 0.2, 0.0], np.deg2rad(5.0)), (0.08, -0.05, 0.03))
T_BS1 = T_BS0 @ np.linalg.inv(T_C1_C0)


def _sensor_yaml(K, D, T_BS):
    rows = ", ".join(f"{v:.9f}" for v in T_BS.reshape(-1))
    return f"""sensor_type: camera
comment: synthetic mini-euroc fixture
T_BS:
  cols: 4
  rows: 4
  data: [{rows}]
rate_hz: 20
resolution: [{W}, {H}]
camera_model: pinhole
intrinsics: [{K[0, 0]}, {K[1, 1]}, {K[0, 2]}, {K[1, 2]}]
distortion_model: radial-tangential
distortion_coefficients: [{D[0]}, {D[1]}, {D[2]}, {D[3]}]
"""


def write_mini_euroc(
    root: str, num_frames: int = 20, seed: int = 0,
    scene: SyntheticScene | None = None,
) -> SyntheticScene:
    import cv2

    cam = None
    scene = scene or make_corridor_scene(seed=seed, num_frames=num_frames, cam=cam)
    mav = os.path.join(root, "mav0")
    d0 = os.path.join(mav, "cam0", "data")
    d1 = os.path.join(mav, "cam1", "data")
    gt_dir = os.path.join(mav, "state_groundtruth_estimate0")
    os.makedirs(d0, exist_ok=True)
    os.makedirs(d1, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    rows0, rows1, gt_rows = [], [], []
    for f in range(len(scene.poses_wc)):
        stamp = 1403636579763555584 + f * 50_000_000
        name = f"{stamp}.png"
        T_wc0 = scene.poses_wc[f]  # scene trajectory = cam0 pose
        T_wc1 = T_wc0 @ np.linalg.inv(T_C1_C0)
        img0 = render_distorted_frame(scene, T_wc0, K0, D0, 977351 + f * 7, W, H)
        img1 = render_distorted_frame(scene, T_wc1, K1, D1, 977351 + f * 7 + 13, W, H)
        cv2.imwrite(os.path.join(d0, name), img0)
        cv2.imwrite(os.path.join(d1, name), img1)
        rows0.append(f"{stamp},{name}")
        rows1.append(f"{stamp},{name}")
        # GT row: BODY pose. T_WB = T_WC0 @ inv(T_BS0).
        T_wb = T_wc0 @ np.linalg.inv(T_BS0)
        R = T_wb[:3, :3]
        qw = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        p = T_wb[:3, 3]
        gt_rows.append(
            f"{stamp},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},{qw:.9f},{qx:.9f},{qy:.9f},{qz:.9f},"
            + ",".join(["0.0"] * 9)
        )

    for cam_dir, rows, K, D, T_BS in (
        (os.path.join(mav, "cam0"), rows0, K0, D0, T_BS0),
        (os.path.join(mav, "cam1"), rows1, K1, D1, T_BS1),
    ):
        with open(os.path.join(cam_dir, "data.csv"), "w") as fh:
            fh.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
        with open(os.path.join(cam_dir, "sensor.yaml"), "w") as fh:
            fh.write(_sensor_yaml(K, D, T_BS))
    with open(os.path.join(gt_dir, "data.csv"), "w") as fh:
        fh.write("#timestamp, p_RS_R_x ...\n" + "\n".join(gt_rows) + "\n")
    return scene
