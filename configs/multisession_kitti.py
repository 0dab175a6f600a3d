"""Config 5 (BASELINE.json:11): multi-session KITTI (00+05+07) merged map,
cross-session loop closure, distributed joint PGO + BA over an N-device
mesh (fake 8-device CPU mesh in this env; pod slice on real hardware)."""

import os

from laneslam.config import DataConfig, MeshConfig, SlamConfig

ENTRY = {"script": "scripts/run_distributed.py", "args": []}


def get_config() -> SlamConfig:
    return SlamConfig(
        data=DataConfig(
            dataset="kitti",
            root=os.environ.get("LANESLAM_DATA_DIR", ""),
            sequence="00",  # sessions 00+05+07 are handled by the driver script
        ),
        mesh=MeshConfig(),
    )
