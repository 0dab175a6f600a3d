"""Config-1 integration (SURVEY.md §4.1): full pipeline on synthetic data.

loader -> LSD -> LBD -> GEMM match + gating -> E-RANSAC pose -> trajectory
-> ATE. Also exercises the real KITTI loader through the mini-KITTI fixture.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.api import run_odometry
from laneslam.config import DataConfig, SlamConfig


@pytest.mark.slow
def test_synthetic_odometry_ate():
    cfg = SlamConfig(data=DataConfig(dataset="synthetic", max_frames=12))
    res = run_odometry(cfg, scale_mode="auto", verbose=False)
    assert res.ate_rmse is not None
    assert res.ate_rmse < 0.10, f"ATE {res.ate_rmse}"
    # Matching health: every frame pair found a healthy inlier set.
    inl = [d["inliers"] for d in res.diagnostics["per_frame"]]
    assert min(inl) > 30


@pytest.mark.slow
def test_mini_kitti_odometry(tmp_path):
    from fixtures.mini_kitti import write_mini_kitti

    write_mini_kitti(str(tmp_path), num_frames=10)
    cfg = SlamConfig(
        data=DataConfig(dataset="kitti", root=str(tmp_path), sequence="00")
    )
    res = run_odometry(cfg, scale_mode="auto", verbose=False)
    assert res.ate_rmse is not None
    assert res.ate_rmse < 0.15, f"ATE {res.ate_rmse}"
