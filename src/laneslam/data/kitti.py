"""KITTI odometry dataset loader (SURVEY.md C15).

Layout (standard KITTI odometry benchmark):
  root/sequences/NN/image_0/*.png   grayscale left camera
  root/sequences/NN/calib.txt       P0..P3 3x4 projection matrices
  root/sequences/NN/times.txt       per-frame timestamps
  root/poses/NN.txt                 GT poses, 3x4 row-major (T_w_cam0)

Real data is absent in this environment; tests exercise this loader through
the mini-KITTI fixture writer (tests/fixtures/mini_kitti.py) which emits the
same layout.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

from laneslam.geometry.camera import Camera


def _imread_gray(path: str) -> np.ndarray:
    # Native C++ PNG decode (runtime/_imageio.cpp) with cv2 fallback.
    from laneslam.runtime.imageio import imread_gray

    return imread_gray(path)


@dataclass
class KittiOdometry:
    root: str
    sequence: str  # e.g. "00"

    def __post_init__(self) -> None:
        seq_dir = os.path.join(self.root, "sequences", self.sequence)
        self.image_dir = os.path.join(seq_dir, "image_0")
        self.image_dir_right = os.path.join(seq_dir, "image_1")
        self._frames = sorted(
            f for f in os.listdir(self.image_dir) if f.endswith(".png")
        )
        self.calib = self._read_calib(os.path.join(seq_dir, "calib.txt"))
        times_path = os.path.join(seq_dir, "times.txt")
        self.times = (
            np.loadtxt(times_path).reshape(-1) if os.path.exists(times_path) else None
        )
        poses_path = os.path.join(self.root, "poses", self.sequence + ".txt")
        self.gt_poses = self._read_poses(poses_path) if os.path.exists(poses_path) else None

    @staticmethod
    def _read_calib(path: str) -> dict:
        out = {}
        with open(path) as f:
            for line in f:
                if ":" not in line:
                    continue
                k, v = line.split(":", 1)
                out[k.strip()] = np.fromstring(v, sep=" ").reshape(3, 4)
        return out

    @staticmethod
    def _read_poses(path: str) -> np.ndarray:
        data = np.loadtxt(path).reshape(-1, 3, 4)
        n = data.shape[0]
        T = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        T[:, :3, :] = data
        return T.astype(np.float32)

    def __len__(self) -> int:
        return len(self._frames)

    @property
    def camera(self) -> Camera:
        P0 = self.calib["P0"]
        # Stereo baseline from P1 if present: P1[0,3] = -fx * b.
        baseline = 0.0
        if "P1" in self.calib and self.calib["P1"][0, 0] > 0:
            baseline = float(-self.calib["P1"][0, 3] / self.calib["P1"][0, 0])
        h, w = self.read_frame(0).shape
        return Camera(
            fx=float(P0[0, 0]),
            fy=float(P0[1, 1]),
            cx=float(P0[0, 2]),
            cy=float(P0[1, 2]),
            width=w,
            height=h,
            baseline=baseline,
        )

    def frame_path(self, i: int) -> str:
        """Path of frame i — lets the chunked feed batch-decode whole chunks
        through the native thread pool (runtime/prefetch.ChunkPrefetcher)."""
        return os.path.join(self.image_dir, self._frames[i])

    def read_frame(self, i: int) -> np.ndarray:
        return _imread_gray(os.path.join(self.image_dir, self._frames[i]))

    def read_frame_right(self, i: int) -> Optional[np.ndarray]:
        p = os.path.join(self.image_dir_right, self._frames[i])
        return _imread_gray(p) if os.path.exists(p) else None

    def frames(self, limit: Optional[int] = None) -> Iterator[Tuple[int, np.ndarray]]:
        n = len(self) if limit is None else min(limit, len(self))
        for i in range(n):
            yield i, self.read_frame(i)
