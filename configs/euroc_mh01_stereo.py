"""Config 4 (BASELINE.json:10): EuRoC MH_01 stereo with joint point+line BA
exercising mixed 3-dof/4-dof Schur landmark elimination."""

import os

from laneslam.config import BaConfig, DataConfig, SlamConfig

ENTRY = {"script": "scripts/run_stereo.py", "args": ["--dataset", "euroc"]}


def get_config() -> SlamConfig:
    return SlamConfig(
        data=DataConfig(
            dataset="euroc",
            root=os.environ.get("LANESLAM_DATA_DIR", ""),
            stereo=True,
        ),
        ba=BaConfig(window_size=8, gn_iters=10, outlier_px=5.0),
        image_height=480,
        image_width=752,
    )
