"""Config-4 realism: the EuRoC loader path on a DISTORTED, UNRECTIFIED
synthetic fixture (VERDICT r2 #4). Exercises sensor.yaml parsing,
radial-tangential feature undistortion, stereo rectification of feature
coordinates, T_BS ground-truth conversion, and the full stereo SLAM loop.
"""

import numpy as np
import pytest

from laneslam.api import run_stereo
from laneslam.config import DataConfig, SlamConfig

from fixtures.mini_euroc import write_mini_euroc


@pytest.mark.slow
def test_distorted_unrectified_euroc_end_to_end(tmp_path):
    root = str(tmp_path / "euroc")
    write_mini_euroc(root, num_frames=16, seed=3)

    cfg = SlamConfig(
        data=DataConfig(dataset="euroc", root=root, max_frames=16, stereo=True)
    )
    res = run_stereo(cfg, enable_loop=False, verbose=False)
    assert res.ate_rmse is not None and np.isfinite(res.ate_rmse)
    # The corridor fixture moves ~2.3 m over 16 frames; without the
    # rectification + T_BS conversion this blows past 1 m (the stereo row
    # gate finds no disparities and GT is lever-arm-biased).
    assert res.ate_rmse < 0.25, f"ATE {res.ate_rmse}"
    assert res.diagnostics["num_points"] > 50


def test_euroc_loader_rectification_and_gt(tmp_path):
    """Loader-level invariants: rectified camera model + camera-frame GT."""
    root = str(tmp_path / "euroc")
    scene = write_mini_euroc(root, num_frames=4, seed=3)

    from laneslam.data.euroc import EurocStereo
    from fixtures.mini_euroc import T_BS0

    ds = EurocStereo(root)
    assert ds.rect is not None
    assert abs(ds.baseline - 0.110) < 5e-3
    # GT is the CAMERA pose: body GT @ T_BS must reproduce the scene poses.
    gt = ds.gt_poses_at(ds.stamps0[:4])
    np.testing.assert_allclose(gt, scene.poses_wc[:4], atol=1e-5)
    cam = ds.camera
    assert cam.baseline == ds.baseline
    # Rectified intrinsics, not the raw ones.
    K_new = np.asarray(ds.rect[0].K_new)
    assert cam.fx == pytest.approx(float(K_new[0, 0]))
