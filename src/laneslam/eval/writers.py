"""Trajectory file writers: KITTI (3x4 row-major) and TUM (t x y z qx qy qz qw)."""

from __future__ import annotations

import numpy as np


def write_kitti_trajectory(path: str, poses_wc: np.ndarray) -> None:
    """poses_wc: (N, 4, 4) -> KITTI odometry format (12 floats/row)."""
    rows = np.asarray(poses_wc)[:, :3, :].reshape(-1, 12)
    np.savetxt(path, rows, fmt="%.9e")


def _rot_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """(N, 3, 3) -> (N, 4) quaternions (x, y, z, w), numerically safe."""
    out = np.zeros((R.shape[0], 4), dtype=np.float64)
    for i, M in enumerate(R):
        tr = np.trace(M)
        if tr > 0:
            s = np.sqrt(tr + 1.0) * 2
            w = 0.25 * s
            x = (M[2, 1] - M[1, 2]) / s
            y = (M[0, 2] - M[2, 0]) / s
            z = (M[1, 0] - M[0, 1]) / s
        else:
            k = np.argmax(np.diag(M))
            if k == 0:
                s = np.sqrt(1.0 + M[0, 0] - M[1, 1] - M[2, 2]) * 2
                x, w = 0.25 * s, (M[2, 1] - M[1, 2]) / s
                y, z = (M[0, 1] + M[1, 0]) / s, (M[0, 2] + M[2, 0]) / s
            elif k == 1:
                s = np.sqrt(1.0 + M[1, 1] - M[0, 0] - M[2, 2]) * 2
                y, w = 0.25 * s, (M[0, 2] - M[2, 0]) / s
                x, z = (M[0, 1] + M[1, 0]) / s, (M[1, 2] + M[2, 1]) / s
            else:
                s = np.sqrt(1.0 + M[2, 2] - M[0, 0] - M[1, 1]) * 2
                z, w = 0.25 * s, (M[1, 0] - M[0, 1]) / s
                x, y = (M[0, 2] + M[2, 0]) / s, (M[1, 2] + M[2, 1]) / s
        out[i] = [x, y, z, w]
    return out


def write_tum_trajectory(path: str, poses_wc: np.ndarray, stamps: np.ndarray | None = None) -> None:
    poses_wc = np.asarray(poses_wc)
    n = poses_wc.shape[0]
    stamps = np.arange(n, dtype=np.float64) if stamps is None else np.asarray(stamps)
    q = _rot_to_quat_xyzw(poses_wc[:, :3, :3])
    t = poses_wc[:, :3, 3]
    rows = np.concatenate([stamps[:, None], t, q], axis=-1)
    np.savetxt(path, rows, fmt="%.9f")
