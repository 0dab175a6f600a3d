"""LSD-style line segment detection as one XLA program (SURVEY.md C1).

Algorithm (von Gioi et al., "LSD: a Line Segment Detector", IPOL 2012),
reformulated for TPU (BASELINE.json:5 "LSD-style line segment detection ...
batched Pallas kernels"; this module is the pure-XLA reference/CPU path, the
Pallas kernel in laneslam/kernels/ is numerically equivalent):

  1. 2x2 gradient field -> level-line angles + magnitudes.
  2. Aligned-pixel mask (magnitude threshold).
  3. Region growing  ->  *bounded-iteration connected-component labeling*:
     max-label propagation over the 8-neighborhood restricted to
     angle-compatible neighbors, accelerated by pointer jumping
     (label <- label[label]), giving O(local_sweeps * iters + log) coverage
     instead of the reference's inherently-sequential seed growth.
  4. Region moments via one scatter-add pass -> magnitude-weighted centroid
     + principal axis (rectangle fit).
  5. Extent pass: scatter-min/max of projections along/across the axis ->
     endpoints + width.
  6. NFA-style validation via a Chernoff bound on the binomial tail
     (log10 NFA <= (5/2) log10(HW) - n KL(k/n || p) / ln 10), plus density
     and length gates. Metric parity with cv2 LSD is asserted by golden
     tests (exact segment sets differ; SURVEY.md §4.1).

Everything is static-shape: regions land in `max_segments` slots chosen by
aligned-pixel count (top-k).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from laneslam.config import LsdConfig
from laneslam.features.containers import Segments


def _gradient_field(img: jnp.ndarray):
    """2x2 gradient (LSD §3): returns (gx, gy, magnitude, angle, mask-pad).

    The value at (y, x) uses pixels {(y,x), (y,x+1), (y+1,x), (y+1,x+1)}.
    """
    i00 = img
    i01 = jnp.roll(img, -1, axis=1)
    i10 = jnp.roll(img, -1, axis=0)
    i11 = jnp.roll(jnp.roll(img, -1, axis=0), -1, axis=1)
    gx = 0.5 * (i01 - i00 + i11 - i10)
    gy = 0.5 * (i10 - i00 + i11 - i01)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Level-line angle: orthogonal to the gradient.
    angle = jnp.arctan2(gx, -gy)
    H, W = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (yy < H - 1) & (xx < W - 1)
    return gx, gy, mag * border, angle


def _label_components(mask: jnp.ndarray, angle: jnp.ndarray, cfg: LsdConfig) -> jnp.ndarray:
    """Angle-compatible connected components by max-label propagation.

    Returns int32 (H, W) root labels (linear indices), -1 outside the mask.
    """
    H, W = mask.shape
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    labels0 = jnp.where(mask, lin, -1)

    # Connectivity is angle-compatibility of 8-neighbors — invariant across
    # sweeps AND outer iterations, so it is computed once and packed into one
    # int32 bit plane (kernels/lsd_sweep.py). The sweep itself dispatches to
    # the Pallas kernel or the XLA path; both were measured at parity on TPU
    # v5e (~540us per 4 sweeps on KITTI-size images — XLA fuses this stencil
    # well), so the default stays XLA and the kernel remains available for
    # LANESLAM_KERNELS=pallas.
    from laneslam import kernels
    from laneslam.kernels.lsd_sweep import conn_bits, lsd_sweep_pallas, lsd_sweep_xla

    import math

    bits = conn_bits(mask, angle, math.radians(cfg.angle_tol_deg))
    forced = __import__("os").environ.get("LANESLAM_KERNELS", "") == "pallas"

    def do_sweeps(labels):
        if forced:
            return lsd_sweep_pallas(
                labels, bits, cfg.local_sweeps, interpret=kernels.interpret()
            )
        return lsd_sweep_xla(labels, bits, cfg.local_sweeps)

    def outer(_, labels):
        labels = do_sweeps(labels)
        # Pointer jumping: follow label chains (monotone increasing), so the
        # propagation distance doubles. labels.flat[l] for l >= 0.
        flat = labels.reshape(-1)
        jumped = flat[jnp.maximum(labels, 0)]
        return jnp.where(labels >= 0, jnp.maximum(labels, jumped), -1)

    return jax.lax.fori_loop(0, cfg.prop_iters, outer, labels0)


def _binomial_tail_log10(n, k, p):
    """Chernoff upper bound: log10 P[Bin(n, p) >= k] <= -n KL(k/n || p)/ln10."""
    q = jnp.clip(k / jnp.maximum(n, 1.0), 1e-6, 1.0 - 1e-6)
    kl = q * jnp.log(q / p) + (1.0 - q) * jnp.log((1.0 - q) / (1.0 - p))
    kl = jnp.where(q <= p, 0.0, kl)  # bound only valid for q > p
    return -n * kl / jnp.log(10.0)


def _gauss_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian (LSD §2 smooths before gradients to kill staircase
    aliasing on shallow-angle edges)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    import numpy as _np

    xs = _np.arange(-radius, radius + 1)
    k = _np.exp(-0.5 * (xs / sigma) ** 2)
    k = jnp.asarray(k / k.sum(), img.dtype)

    def conv(a, axis):
        out = jnp.zeros_like(a)
        for i, off in enumerate(range(-radius, radius + 1)):
            out = out + k[i] * jnp.roll(a, -off, axis=axis)
        return out

    return conv(conv(img, 0), 1)


@partial(jax.jit, static_argnames=("cfg",))
def detect_lines(img: jnp.ndarray, cfg: LsdConfig = LsdConfig()) -> Segments:
    """Detect line segments in a grayscale image (H, W) float32 [0, 255].

    Returns fixed-capacity `Segments` (cfg.max_segments slots).
    """
    img = img.astype(jnp.float32)
    if cfg.blur_sigma > 0:
        img = _gauss_blur(img, cfg.blur_sigma)
    H, W = img.shape
    HW = H * W
    gx, gy, mag, angle = _gradient_field(img)
    mask = mag > cfg.grad_threshold

    labels = _label_components(mask, angle, cfg)  # (H, W) in [-1, HW)
    lab = jnp.maximum(labels.reshape(-1), 0)
    on = (labels.reshape(-1) >= 0).astype(jnp.float32)

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    w = mag.reshape(-1) * on  # magnitude-weighted moments (LSD center/axis)

    def scat(vals):
        return jnp.zeros((HW,), jnp.float32).at[lab].add(vals * on)

    count = scat(jnp.ones_like(w))
    sw = scat(w)
    sx = scat(w * xx)
    sy = scat(w * yy)
    sxx = scat(w * xx * xx)
    syy = scat(w * yy * yy)
    sxy = scat(w * xx * yy)

    # Top-K regions by pixel count.
    K = cfg.max_segments
    topc, top_lab = jax.lax.top_k(count, K)  # (K,)
    swk = jnp.maximum(sw[top_lab], 1e-12)
    cx = sx[top_lab] / swk
    cy = sy[top_lab] / swk
    mxx = sxx[top_lab] / swk - cx * cx
    myy = syy[top_lab] / swk - cy * cy
    mxy = sxy[top_lab] / swk - cx * cy
    # Principal axis (largest-eigenvalue eigenvector of [[mxx,mxy],[mxy,myy]]).
    tr = mxx + myy
    det = mxx * myy - mxy * mxy
    disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    lam1 = 0.5 * tr + disc  # major
    # Eigenvector for lam1: (mxy, lam1 - mxx) or (lam1 - myy, mxy).
    v1 = jnp.stack([mxy, lam1 - mxx], axis=-1)
    v2 = jnp.stack([lam1 - myy, mxy], axis=-1)
    use2 = jnp.abs(mxy) < 1e-9
    v = jnp.where(use2[:, None], jnp.stack([jnp.ones_like(mxy), jnp.zeros_like(mxy)], -1), v1 + v2)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    seg_angle = jnp.arctan2(v[:, 1], v[:, 0])

    # Extent pass: project each masked pixel onto its region's axis.
    # Gather per-pixel region params via a dense (HW,) lookup built from top-K.
    slot_of_label = jnp.full((HW,), -1, jnp.int32).at[top_lab].set(
        jnp.arange(K, dtype=jnp.int32)
    )
    pix_slot = jnp.where(on > 0, slot_of_label[lab], -1)
    in_top = pix_slot >= 0
    ps = jnp.maximum(pix_slot, 0)
    dxp = xx - cx[ps]
    dyp = yy - cy[ps]
    ca = jnp.cos(seg_angle)[ps]
    sa = jnp.sin(seg_angle)[ps]
    proj_l = dxp * ca + dyp * sa  # along axis
    proj_w = -dxp * sa + dyp * ca  # across axis
    big = jnp.float32(1e9)
    lmin = jnp.full((K,), big).at[ps].min(jnp.where(in_top, proj_l, big))
    lmax = jnp.full((K,), -big).at[ps].max(jnp.where(in_top, proj_l, -big))
    wmin = jnp.full((K,), big).at[ps].min(jnp.where(in_top, proj_w, big))
    wmax = jnp.full((K,), -big).at[ps].max(jnp.where(in_top, proj_w, -big))

    length = jnp.maximum(lmax - lmin, 0.0)
    width = jnp.clip(wmax - wmin, 1.0, None)
    x1 = cx + lmin * jnp.cos(seg_angle)
    y1 = cy + lmin * jnp.sin(seg_angle)
    x2 = cx + lmax * jnp.cos(seg_angle)
    y2 = cy + lmax * jnp.sin(seg_angle)

    # Validation: density, size, NFA bound.
    area = jnp.maximum(length * width, 1.0)
    density = topc / area
    p_align = cfg.angle_tol_deg / 180.0
    log_nfa = 2.5 * jnp.log10(jnp.float32(HW)) + _binomial_tail_log10(area, topc, p_align)
    valid = (
        (topc >= cfg.min_region_px)
        & (length >= cfg.min_length_px)
        & (density >= cfg.min_density)
        & (log_nfa < cfg.log_nfa_threshold)
    )

    z = jnp.zeros_like(length)
    return Segments(
        xyxy=jnp.where(valid[:, None], jnp.stack([x1, y1, x2, y2], axis=-1), 0.0),
        angle=jnp.where(valid, seg_angle, z),
        width=jnp.where(valid, width, z),
        score=jnp.where(valid, -log_nfa, z),
        valid=valid,
    )
