"""P1 frame-parallel frontend: sharded extraction == single-device extraction.

The DP path must produce the FULL FrameFeatures (not lines only) and match
the unsharded per-frame extractor exactly — sharding is pure data
parallelism with no cross-talk (SURVEY.md §2.2 P1; VERDICT r3 #6).
"""

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import LsdConfig, SlamConfig
from laneslam.dist.frontend_dp import batched_extract_sharded, extract_features_sharded
from laneslam.dist.mesh import make_mesh
from laneslam.frontend.extract import extract_features


def _tiny_cfg(H, W):
    return SlamConfig(
        image_height=H, image_width=W,
        lsd=LsdConfig(max_segments=32, min_region_px=5, min_length_px=5.0,
                      prop_iters=4, local_sweeps=2),
    )


def test_sharded_extraction_matches_single_device():
    n_dev = len(jax.devices())
    mesh = make_mesh(jax.devices(), frame=n_dev, block=1)
    H, W = 64, 128
    cfg = _tiny_cfg(H, W)
    B = 2 * n_dev
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W), jnp.float32, 0, 255)

    feats = extract_features_sharded(imgs, cfg, mesh)
    # Full FrameFeatures contract: all four feature families present.
    assert feats.segments.xyxy.shape[0] == B
    assert feats.line_desc.shape[0] == B
    assert feats.points.uv.shape[0] == B
    assert feats.point_desc.shape[0] == B

    for i in range(B):
        ref = extract_features(imgs[i], cfg)
        np.testing.assert_allclose(
            np.asarray(feats.segments.xyxy[i]), np.asarray(ref.segments.xyxy),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(feats.points.valid[i]), np.asarray(ref.points.valid)
        )
        np.testing.assert_allclose(
            np.asarray(feats.point_desc[i]), np.asarray(ref.point_desc), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(feats.line_desc[i]), np.asarray(ref.line_desc), atol=1e-4
        )


def test_batched_extract_view():
    n_dev = len(jax.devices())
    mesh = make_mesh(jax.devices(), frame=n_dev, block=1)
    H, W = 64, 128
    cfg = _tiny_cfg(H, W)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (n_dev, H, W), jnp.float32, 0, 255)
    xyxy, counts = batched_extract_sharded(imgs, cfg, mesh)
    assert xyxy.shape == (n_dev, cfg.lsd.max_segments, 4)
    assert counts.shape == (n_dev,)
