"""Config 1 (BASELINE.json:7): KITTI 00 monocular, first 500 frames,
frame-to-frame line odometry, CPU-runnable. Requires $LANESLAM_DATA_DIR
pointing at a KITTI odometry root (dataset absent in the build env —
SURVEY.md §7.1)."""

import os

from laneslam.config import DataConfig, SlamConfig

ENTRY = {"script": "scripts/run_odometry.py",
         "args": ["--dataset", "kitti", "--sequence", "00", "--frames", "500"]}


def get_config() -> SlamConfig:
    return SlamConfig(
        data=DataConfig(
            dataset="kitti",
            root=os.environ.get("LANESLAM_DATA_DIR", ""),
            sequence="00",
            max_frames=500,
        ),
        image_height=376,
        image_width=1241,
    )
