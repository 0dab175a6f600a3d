"""EuRoC MAV (ASL format) stereo loader (SURVEY.md C16).

Layout:
  root/mav0/cam0/data/*.png, root/mav0/cam0/data.csv (timestamps)
  root/mav0/cam0/sensor.yaml (intrinsics + T_BS extrinsics)
  root/mav0/cam1/...  (right camera)
  root/mav0/state_groundtruth_estimate0/data.csv (GT: t, p_RS, q_RS, ...)

YAML is parsed with a minimal hand parser (no yaml dep guaranteed): EuRoC
sensor.yaml files are flat except `T_BS` (4x4, row-major `data:` list) and
scalar/vector fields.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from laneslam.geometry.camera import Camera


def _parse_sensor_yaml(path: str) -> dict:
    out: dict = {}
    text = open(path).read()
    m = re.search(r"intrinsics:\s*\[([^\]]*)\]", text)
    if m:
        out["intrinsics"] = np.fromstring(m.group(1), sep=",")
    m = re.search(r"distortion_coefficients:\s*\[([^\]]*)\]", text)
    if m:
        out["distortion"] = np.fromstring(m.group(1), sep=",")
    m = re.search(r"resolution:\s*\[([^\]]*)\]", text)
    if m:
        out["resolution"] = np.fromstring(m.group(1), sep=",").astype(int)
    m = re.search(r"T_BS:.*?data:\s*\[([^\]]*)\]", text, re.DOTALL)
    if m:
        out["T_BS"] = np.fromstring(m.group(1), sep=",").reshape(4, 4)
    return out


def _read_data_csv(path: str):
    """EuRoC data.csv: `timestamp_ns,filename` rows (with # header)."""
    stamps, names = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.strip().split(",")
            stamps.append(int(parts[0]))
            names.append(parts[1].strip())
    return np.asarray(stamps, dtype=np.int64), names


@dataclass
class EurocStereo:
    root: str  # directory containing mav0/

    def __post_init__(self) -> None:
        mav = os.path.join(self.root, "mav0")
        self.cam0_dir = os.path.join(mav, "cam0")
        self.cam1_dir = os.path.join(mav, "cam1")
        self.stamps0, self.names0 = _read_data_csv(os.path.join(self.cam0_dir, "data.csv"))
        self.stamps1, self.names1 = _read_data_csv(os.path.join(self.cam1_dir, "data.csv"))
        self.sensor0 = _parse_sensor_yaml(os.path.join(self.cam0_dir, "sensor.yaml"))
        self.sensor1 = _parse_sensor_yaml(os.path.join(self.cam1_dir, "sensor.yaml"))
        gt_csv = os.path.join(mav, "state_groundtruth_estimate0", "data.csv")
        self.gt = self._read_gt(gt_csv) if os.path.exists(gt_csv) else None
        # Left->right extrinsics: T_c1_c0 = inv(T_BS1) @ T_BS0.
        T0 = self.sensor0.get("T_BS", np.eye(4))
        T1 = self.sensor1.get("T_BS", np.eye(4))
        self.T_BS0 = T0
        self.T_c1_c0 = np.linalg.inv(T1) @ T0
        self.baseline = float(np.linalg.norm(self.T_c1_c0[:3, 3]))
        # Rectification of FEATURE coordinates (geometry/undistort.py):
        # EuRoC frames are distorted and unrectified; the stereo frontend's
        # row gate needs the rectified pinhole model. Images stay raw.
        self.rect = None
        if "distortion" in self.sensor0 and "intrinsics" in self.sensor0:
            from laneslam.geometry.undistort import stereo_rectify

            def K_of(sensor):
                fu, fv, cu, cv = sensor["intrinsics"][:4]
                return np.array([[fu, 0, cu], [0, fv, cv], [0, 0, 1.0]])

            res = self.sensor0.get("resolution", np.array([752, 480]))
            d0 = np.asarray(self.sensor0["distortion"], float)[:4]
            d1 = np.asarray(self.sensor1.get("distortion", d0), float)[:4]
            p0, p1, self.baseline = stereo_rectify(
                K_of(self.sensor0), d0, K_of(self.sensor1), d1,
                self.T_c1_c0, int(res[0]), int(res[1]),
            )
            self.rect = (p0, p1)

    @staticmethod
    def _read_gt(path: str):
        rows = np.loadtxt(path, delimiter=",", comments="#")
        stamps = rows[:, 0].astype(np.int64)
        pos = rows[:, 1:4]
        quat = rows[:, 4:8]  # w, x, y, z
        return {"stamps": stamps, "positions": pos.astype(np.float32), "quaternions_wxyz": quat.astype(np.float32)}

    def gt_poses_at(self, stamps: np.ndarray) -> Optional[np.ndarray]:
        """Nearest-neighbor GT CAMERA pose (4,4) per camera timestamp.

        GT rows are body poses T_WB; the returned pose is the cam0 pose
        T_WC = T_WB @ T_BS0 (without this the ATE is biased by the
        body->camera lever arm; VERDICT r2 missing #3)."""
        if self.gt is None:
            return None
        gts = self.gt["stamps"]
        idx = np.searchsorted(gts, stamps)
        idx = np.clip(idx, 0, len(gts) - 1)
        pos = self.gt["positions"][idx]
        q = self.gt["quaternions_wxyz"][idx]
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = np.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        ).reshape(-1, 3, 3)
        T = np.tile(np.eye(4, dtype=np.float32), (len(stamps), 1, 1))
        T[:, :3, :3] = R
        T[:, :3, 3] = pos
        return (T @ self.T_BS0[None].astype(np.float32))

    def __len__(self) -> int:
        return len(self.names0)

    @property
    def camera(self) -> Camera:
        res = self.sensor0.get("resolution", np.array([752, 480]))
        if self.rect is not None:
            # Rectified pinhole model (all feature coords are mapped into it).
            K_new = np.asarray(self.rect[0].K_new)
            return Camera(
                fx=float(K_new[0, 0]), fy=float(K_new[1, 1]),
                cx=float(K_new[0, 2]), cy=float(K_new[1, 2]),
                width=int(res[0]), height=int(res[1]), baseline=self.baseline,
            )
        intr = self.sensor0["intrinsics"]  # fu, fv, cu, cv
        return Camera(
            fx=float(intr[0]), fy=float(intr[1]), cx=float(intr[2]), cy=float(intr[3]),
            width=int(res[0]), height=int(res[1]), baseline=self.baseline,
        )

    def read_pair(self, i: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        # Native C++ PNG decode (runtime/_imageio.cpp) with cv2 fallback.
        from laneslam.runtime.imageio import imread_gray

        left = imread_gray(os.path.join(self.cam0_dir, "data", self.names0[i]))
        rp = os.path.join(self.cam1_dir, "data", self.names1[min(i, len(self.names1) - 1)])
        right = imread_gray(rp) if os.path.exists(rp) else None
        return left, right
