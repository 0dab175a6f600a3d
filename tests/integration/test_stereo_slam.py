"""Config-4 integration: stereo point+line SLAM, metric SE(3) ATE."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.api import run_stereo
from laneslam.config import DataConfig, SlamConfig


@pytest.mark.slow
def test_synthetic_stereo_slam():
    cfg = SlamConfig(data=DataConfig(dataset="synthetic", max_frames=18, stereo=True))
    res = run_stereo(cfg, enable_loop=False, verbose=False)
    assert res.ate_rmse is not None
    # Metric, SE(3)-aligned: must be tight.
    assert res.ate_rmse < 0.06, f"ATE {res.ate_rmse}"
    assert res.diagnostics["num_points"] > 100
    assert res.diagnostics["num_lines"] > 20


@pytest.mark.slow
def test_stereo_loop_closure_fires():
    """Loop scene: the full detect->verify->PGO path executes without NaN."""
    cfg = SlamConfig(
        data=DataConfig(dataset="synthetic_loop", max_frames=90, stereo=True)
    )
    res = run_stereo(cfg, enable_loop=True, verbose=False)
    assert res.ate_rmse is not None
    import numpy as np

    assert np.isfinite(res.ate_rmse)
    assert res.ate_rmse < 1.0, f"ATE {res.ate_rmse}"
    assert res.diagnostics["num_loops"] >= 1
