"""LBD line-band descriptor as a batched XLA program (SURVEY.md C2).

Algorithm: Zhang & Koch, "An efficient and robust line segment matching
approach based on LBD descriptor and pairwise geometric consistency", JVCIR
2013. `cv2.line_descriptor` is absent in this environment, so this is built
from the paper and golden-tested against hand-computed fixtures
(tests/golden/test_lbd_fixtures.py).

Formulation: the Line Support Region of each segment is an (M rows x S
samples) rotated grid (M = num_bands * band_width rows parallel to the
line). Image gradients are sampled bilinearly at all K*M*S grid points in
one gather, projected onto the segment frame (d_L, d_perp), reduced to
per-row 4-vectors (positive/negative parts of both projections), then
band means/stds are taken with Gaussian row weights — band j aggregates
rows of bands j-1, j, j+1 (paper §3.2). Descriptor = [means | stds],
each half L2-normalized. Everything is dense: batched gathers + two
matmuls — MXU/VPU friendly by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from laneslam.config import LbdConfig
from laneslam.features.containers import Segments


def _image_gradients(img: jnp.ndarray):
    """Central-difference gradients of a lightly smoothed image."""
    # 3x3 binomial smoothing (separable [1 2 1]/4).
    k = jnp.array([0.25, 0.5, 0.25], img.dtype)
    x = img
    x = (
        jnp.roll(x, 1, 0) * k[0] + x * k[1] + jnp.roll(x, -1, 0) * k[2]
    )
    x = (
        jnp.roll(x, 1, 1) * k[0] + x * k[1] + jnp.roll(x, -1, 1) * k[2]
    )
    gx = 0.5 * (jnp.roll(x, -1, 1) - jnp.roll(x, 1, 1))
    gy = 0.5 * (jnp.roll(x, -1, 0) - jnp.roll(x, 1, 0))
    return gx, gy


def _bilinear(imgs, pos):
    """Bilinear sample a stack of planes at positions.

    imgs: (C, H, W); pos: (..., 2) as (x, y). Returns (C, ...).
    Out-of-bounds positions clamp to the border.
    """
    C, H, W = imgs.shape
    x = jnp.clip(pos[..., 0], 0.0, W - 1.001)
    y = jnp.clip(pos[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    def gather(yi, xi):
        return imgs[:, yi, xi]  # (C, ...)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@partial(jax.jit, static_argnames=("cfg",))
def describe_lines(
    img: jnp.ndarray, segs: Segments, cfg: LbdConfig = LbdConfig()
) -> jnp.ndarray:
    """LBD descriptors for all segment slots: (K, 8 * num_bands) float32.

    Invalid slots produce zero rows.
    """
    img = img.astype(jnp.float32)
    gx, gy = _image_gradients(img)
    grads = jnp.stack([gx, gy])  # (2, H, W)

    m, w, S = cfg.num_bands, cfg.band_width, cfg.num_samples
    M = m * w

    p1 = segs.xyxy[:, :2]
    p2 = segs.xyxy[:, 2:]
    d = p2 - p1
    length = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    dL = d / length  # (K, 2) direction along the line
    dP = jnp.stack([-dL[:, 1], dL[:, 0]], axis=-1)  # orthogonal

    s_frac = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S  # (S,)
    r_off = jnp.arange(M, dtype=jnp.float32) - (M - 1) / 2.0  # (M,)

    # Grid positions: (K, M, S, 2).
    base = p1[:, None, None, :] + s_frac[None, None, :, None] * d[:, None, None, :]
    pos = base + r_off[None, :, None, None] * dP[:, None, None, :]

    g = _bilinear(grads, pos)  # (2, K, M, S)
    gL = g[0] * dL[:, 0, None, None] + g[1] * dL[:, 1, None, None]
    gP = g[0] * dP[:, 0, None, None] + g[1] * dP[:, 1, None, None]

    # Per-row 4-vectors with the paper's global Gaussian row weight.
    sigma_g = 0.5 * (M - 1.0)
    f_g = jnp.exp(-0.5 * (r_off / sigma_g) ** 2)  # (M,)
    feats = jnp.stack(
        [
            jnp.maximum(gP, 0.0),
            jnp.maximum(-gP, 0.0),
            jnp.maximum(gL, 0.0),
            jnp.maximum(-gL, 0.0),
        ],
        axis=-1,
    )  # (K, M, S, 4)
    rowvec = jnp.sum(feats, axis=2) * f_g[None, :, None]  # (K, M, 4)

    # Band weights: band j aggregates rows of bands j-1, j, j+1 with a local
    # Gaussian over row distance to the band center (sigma_l = band width).
    band_center = (jnp.arange(m, dtype=jnp.float32) + 0.5) * w - 0.5  # row index
    row_idx = jnp.arange(M, dtype=jnp.float32)
    dist = row_idx[None, :] - band_center[:, None]  # (m, M)
    sigma_l = jnp.float32(w)
    w_local = jnp.exp(-0.5 * (dist / sigma_l) ** 2)
    band_of_row = (row_idx // w)[None, :]  # (1, M)
    in_window = jnp.abs(band_of_row - jnp.arange(m, dtype=jnp.float32)[:, None]) <= 1.0
    Wb = jnp.where(in_window, w_local, 0.0)  # (m, M)
    Wb = Wb / jnp.maximum(jnp.sum(Wb, axis=1, keepdims=True), 1e-12)

    # Band reduction (two weighted contractions + variance + normalize +
    # clip + renormalize + mask) — fused Pallas kernel on TPU, XLA
    # reference elsewhere (kernels/lbd.py; dispatch via LANESLAM_KERNELS).
    from laneslam.kernels.lbd import lbd_reduce

    return lbd_reduce(rowvec, Wb, segs.valid, clip=0.4)
