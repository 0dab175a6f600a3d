"""Stereo frontend (SURVEY.md C17, config 4 / BASELINE.json:10).

Rectified left-right matching: the epipolar constraint degenerates to
"same row, positive disparity", applied as a fused gate on the descriptor
GEMM. Disparity -> metric depth = fx * baseline / d. Landmarks are born
metric from a single stereo pair — no parallax wait, no mono scale gauge.

Stereo line matching uses the same GEMM+gate machinery with a row-overlap
gate; line endpoints get depths by intersecting the right segment at the
same scanline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laneslam.config import SlamConfig
from laneslam.features.containers import Points, Segments
from laneslam.features.match import match_descriptors
from laneslam.frontend.extract import FrameFeatures


class StereoDepths(NamedTuple):
    """Per-left-feature-slot stereo results."""

    pt_depth: jnp.ndarray  # (Kp,) metric depth, 0 where invalid
    pt_valid: jnp.ndarray  # (Kp,) bool
    ln_depth12: jnp.ndarray  # (Kl, 2) endpoint depths
    ln_valid: jnp.ndarray  # (Kl,) bool


@partial(jax.jit, static_argnames=("cfg", "fx", "baseline"))
def stereo_match(
    left: FrameFeatures,
    right: FrameFeatures,
    fx: float,
    baseline: float,
    cfg: SlamConfig,
) -> StereoDepths:
    """Match left->right along rectified rows; return per-slot depths."""
    # --- points: same-row + positive-disparity gate on the GEMM.
    uv_l = left.points.uv
    uv_r = right.points.uv
    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    gate = (dv < 2.0) & (disp > 0.5) & (disp < 0.35 * fx)
    # Absolute similarity floor: a sole in-gate candidate trivially passes
    # the ratio test (no competitor), so repetitive structure along a row
    # needs this to avoid false disparities.
    pm = match_descriptors(
        left.point_desc, right.point_desc, left.points.valid, right.points.valid,
        gate=gate, ratio=cfg.match.ratio, cross_check=True, min_similarity=0.5,
    )
    d_matched = uv_l[:, 0] - uv_r[jnp.maximum(pm.idx, 0), 0]
    pt_depth = fx * baseline / jnp.maximum(d_matched, 1e-6)
    pt_ok = pm.valid & (d_matched > 0.5)

    # --- lines: orientation + vertical-overlap gate; endpoint depths from
    # the right line evaluated at the left endpoints' rows.
    sl = left.segments
    sr = right.segments
    da = sl.angle[:, None] - sr.angle[None, :]
    da = jnp.abs(jnp.arctan2(jnp.sin(da), jnp.cos(da)))
    da = jnp.minimum(da, jnp.pi - da)
    # Vertical interval overlap.
    ly1 = jnp.minimum(sl.xyxy[:, 1], sl.xyxy[:, 3])
    ly2 = jnp.maximum(sl.xyxy[:, 1], sl.xyxy[:, 3])
    ry1 = jnp.minimum(sr.xyxy[:, 1], sr.xyxy[:, 3])
    ry2 = jnp.maximum(sr.xyxy[:, 1], sr.xyxy[:, 3])
    ovl = jnp.minimum(ly2[:, None], ry2[None, :]) - jnp.maximum(ly1[:, None], ry1[None, :])
    lgate = (da < jnp.deg2rad(10.0)) & (ovl > 5.0)
    lm = match_descriptors(
        left.line_desc, right.line_desc, sl.valid, sr.valid,
        gate=lgate, ratio=cfg.match.ratio, cross_check=True, min_similarity=0.7,
    )
    # Right segment as infinite line x = a*y + b (near-vertical lines) or
    # solve x at given y generally via the two endpoints.
    rj = jnp.maximum(lm.idx, 0)
    rx1, ry1m = sr.xyxy[rj, 0], sr.xyxy[rj, 1]
    rx2, ry2m = sr.xyxy[rj, 2], sr.xyxy[rj, 3]
    dy = ry2m - ry1m
    slope = (rx2 - rx1) / jnp.where(jnp.abs(dy) < 1e-3, 1e-3, dy)

    def x_at(y):
        return rx1 + slope * (y - ry1m)

    xl1, yl1 = sl.xyxy[:, 0], sl.xyxy[:, 1]
    xl2, yl2 = sl.xyxy[:, 2], sl.xyxy[:, 3]
    disp1 = xl1 - x_at(yl1)
    disp2 = xl2 - x_at(yl2)
    zd1 = fx * baseline / jnp.maximum(disp1, 1e-6)
    zd2 = fx * baseline / jnp.maximum(disp2, 1e-6)
    # Near-horizontal lines are stereo-degenerate (disparity unobservable).
    near_horiz = jnp.abs(jnp.sin(sl.angle)) < 0.15
    ln_ok = (
        lm.valid & (disp1 > 0.5) & (disp2 > 0.5) & ~near_horiz
        & (jnp.abs(dy) > 3.0)
    )
    return StereoDepths(
        pt_depth=jnp.where(pt_ok, pt_depth, 0.0),
        pt_valid=pt_ok,
        ln_depth12=jnp.where(
            ln_ok[:, None], jnp.stack([zd1, zd2], axis=-1), 0.0
        ),
        ln_valid=ln_ok,
    )
