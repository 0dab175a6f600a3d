"""Config-1 preset on the synthetic corridor fixture — runs with zero
external data on CPU or TPU (SURVEY.md §7.4 minimum slice)."""

from laneslam.config import DataConfig, SlamConfig

ENTRY = {"script": "scripts/run_odometry.py", "args": ["--dataset", "synthetic", "--frames", "30"]}


def get_config() -> SlamConfig:
    return SlamConfig(data=DataConfig(dataset="synthetic", max_frames=30))
