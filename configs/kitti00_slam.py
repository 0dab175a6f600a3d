"""Configs 2+3 (BASELINE.json:8-9): KITTI 00 keyframe SLAM with
sliding-window point+line BA, covisibility, loop closure + PGO."""

import os

from laneslam.config import BaConfig, DataConfig, SlamConfig

ENTRY = {"script": "scripts/run_slam.py",
         "args": ["--dataset", "kitti", "--sequence", "00"]}


def get_config() -> SlamConfig:
    return SlamConfig(
        data=DataConfig(
            dataset="kitti",
            root=os.environ.get("LANESLAM_DATA_DIR", ""),
            sequence="00",
        ),
        ba=BaConfig(window_size=8, gn_iters=10, outlier_px=5.0),
        image_height=376,
        image_width=1241,
    )
