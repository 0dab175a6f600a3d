"""Per-frame feature extraction: one jit program per frame.

Bundles LSD + LBD + points + descriptors into a single compiled step so the
image uploads once and everything else stays in HBM (BASELINE.json:5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laneslam.config import SlamConfig
from laneslam.features.containers import Points, Segments
from laneslam.features.lbd import describe_lines
from laneslam.features.lsd import detect_lines
from laneslam.features.points import describe_points, detect_points


class FrameFeatures(NamedTuple):
    segments: Segments
    line_desc: jnp.ndarray  # (Kl, 8m)
    points: Points
    point_desc: jnp.ndarray  # (Kp, D)


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(img: jnp.ndarray, cfg: SlamConfig = SlamConfig()) -> FrameFeatures:
    """Grayscale (H, W) float32 [0..255] -> fixed-capacity features."""
    img = img.astype(jnp.float32)
    # jax.named_scope: phases show up attributed in profiler traces
    # (scripts/profile.py; SURVEY.md §5.1).
    with jax.named_scope("lsd_detect"):
        segs = detect_lines(img, cfg.lsd)
    with jax.named_scope("lbd_describe"):
        ldesc = describe_lines(img, segs, cfg.lbd)
    with jax.named_scope("point_detect"):
        pts = detect_points(img, cfg.points)
    with jax.named_scope("point_describe"):
        pdesc = describe_points(img, pts, cfg.points)
    return FrameFeatures(segments=segs, line_desc=ldesc, points=pts, point_desc=pdesc)
