import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import SlamConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame, scene_observations
from laneslam.frontend.extract import extract_features
from laneslam.frontend.stereo import stereo_match

BASELINE = 0.5


def test_stereo_depths_match_gt():
    scene = make_corridor_scene(seed=3, num_frames=2)
    cfg = SlamConfig()
    L = extract_features(jnp.asarray(render_scene_frame(scene, 0), jnp.float32), cfg)
    R = extract_features(
        jnp.asarray(render_scene_frame(scene, 0, baseline=BASELINE), jnp.float32), cfg
    )
    d = stereo_match(L, R, float(scene.cam.fx), BASELINE, cfg)
    n = int(d.pt_valid.sum())
    assert n >= 30

    # Compare against GT depths: nearest GT projected point per feature.
    uv_gt, vis, _, _ = scene_observations(scene, 0)
    T_cw = np.linalg.inv(scene.poses_wc[0])
    Xc = scene.points @ T_cw[:3, :3].T + T_cw[:3, 3]
    z_gt = Xc[:, 2]
    uv = np.asarray(L.points.uv)
    val = np.asarray(d.pt_valid)
    zs = np.asarray(d.pt_depth)
    errs = []
    for i in np.where(val)[0]:
        dd = np.linalg.norm(uv_gt[vis] - uv[i], axis=-1)
        j = np.argmin(dd)
        if dd[j] < 3.0:
            errs.append(abs(zs[i] - z_gt[vis][j]) / z_gt[vis][j])
    assert len(errs) >= 20
    assert np.median(errs) < 0.05  # 5% relative depth error

    # Some stereo line depths too.
    assert int(d.ln_valid.sum()) >= 3


def test_stereo_rejects_monocular_pair():
    """Left==right (zero disparity): the positive-disparity gate + absolute
    similarity floor must reject almost everything (a few repetitive-texture
    ambiguities remain; BA outlier gating handles those downstream)."""
    scene = make_corridor_scene(seed=3, num_frames=1)
    cfg = SlamConfig()
    L = extract_features(jnp.asarray(render_scene_frame(scene, 0), jnp.float32), cfg)
    d = stereo_match(L, L, float(scene.cam.fx), BASELINE, cfg)
    n_feat = int(L.points.valid.sum())
    assert int(d.pt_valid.sum()) < 0.12 * n_feat
