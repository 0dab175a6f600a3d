"""Configs 2/3 integration: keyframe SLAM with window BA on synthetic data."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.api import run_slam
from laneslam.config import DataConfig, SlamConfig


@pytest.mark.slow
def test_synthetic_slam_with_ba():
    cfg = SlamConfig(data=DataConfig(dataset="synthetic", max_frames=20))
    res = run_slam(cfg, enable_loop=False, verbose=False)
    assert res.ate_rmse is not None
    # Mono SLAM with internal scale, Sim(3)-aligned ATE on a 3 m trajectory.
    assert res.ate_rmse < 0.25, f"ATE {res.ate_rmse}"
    assert res.diagnostics["num_keyframes"] >= 2
    assert res.diagnostics["num_points"] > 50
    assert res.diagnostics["num_lines"] > 10
    assert res.diagnostics["pt_overflow"] == 0


@pytest.mark.slow
def test_ba_improves_over_no_ba():
    """Window BA should not make the trajectory (much) worse; both bounded."""
    cfg = SlamConfig(data=DataConfig(dataset="synthetic", max_frames=16))
    res_ba = run_slam(cfg, enable_loop=False, enable_ba=True, verbose=False)
    res_no = run_slam(cfg, enable_loop=False, enable_ba=False, verbose=False)
    assert res_ba.ate_rmse < 0.3
    assert res_no.ate_rmse < 0.5
