"""Write a KITTI-odometry-layout directory from a synthetic scene.

Exercises the real KittiOdometry loader end-to-end with zero external data
(SURVEY.md §4.2): PNG frames rendered from the synthetic corridor, calib.txt
with P0/P1, times.txt, and GT poses.
"""

from __future__ import annotations

import os

import numpy as np

from laneslam.data.synthetic import SyntheticScene, make_corridor_scene, render_scene_frame


def write_mini_kitti(
    root: str, sequence: str = "00", num_frames: int = 20, seed: int = 0,
    scene: SyntheticScene | None = None,
) -> SyntheticScene:
    import cv2

    scene = scene or make_corridor_scene(seed=seed, num_frames=num_frames)
    cam = scene.cam
    seq_dir = os.path.join(root, "sequences", sequence)
    img_dir = os.path.join(seq_dir, "image_0")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    for f in range(len(scene.poses_wc)):
        img = render_scene_frame(scene, f)
        cv2.imwrite(os.path.join(img_dir, f"{f:06d}.png"), img)

    P0 = np.zeros((3, 4))
    P0[0, 0], P0[1, 1] = float(cam.fx), float(cam.fy)
    P0[0, 2], P0[1, 2] = float(cam.cx), float(cam.cy)
    P0[2, 2] = 1.0
    P1 = P0.copy()
    P1[0, 3] = -float(cam.fx) * 0.5  # fake 0.5 m baseline
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        for name, P in [("P0", P0), ("P1", P1), ("P2", P0), ("P3", P1)]:
            f.write(name + ": " + " ".join(f"{v:.12e}" for v in P.reshape(-1)) + "\n")

    np.savetxt(os.path.join(seq_dir, "times.txt"), np.arange(len(scene.poses_wc)) * 0.1)
    np.savetxt(
        os.path.join(root, "poses", sequence + ".txt"),
        scene.poses_wc[:, :3, :].reshape(len(scene.poses_wc), 12),
        fmt="%.9e",
    )
    return scene
