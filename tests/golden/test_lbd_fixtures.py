"""LBD descriptor vs paper-derived NumPy fixtures (SURVEY.md §4.1 golden tier).

`cv2.line_descriptor` is absent in this environment (SURVEY.md §2.1 C2), so
the oracle is an independent NumPy implementation of Zhang & Koch (JVCIR
2013) written here from the paper's definitions, sharing no code with
laneslam.features.lbd. It reproduces the module's documented discretization
choices (S midpoints along the line, M = num_bands*band_width unit-spaced
rows, global Gaussian sigma_g = (M-1)/2, local Gaussian sigma_l = band
width over the 3-band window, mean|std halves L2-normalized, clipped at
0.4, renormalized) — the test pins the implementation against an
independent rendering of the same math, plus structural invariants.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from laneslam.config import LbdConfig
from laneslam.features.containers import Segments
from laneslam.features.lbd import describe_lines


def _numpy_lbd(img, p1, p2, m, w, S):
    """Independent LBD for ONE segment, NumPy end to end."""
    img = np.asarray(img, np.float64)
    H, W = img.shape

    # 3x3 binomial smooth, then central differences (mirrors the module's
    # documented gradient pipeline — part of the fixture definition).
    k = np.array([0.25, 0.5, 0.25])
    sm = img.copy()
    sm = k[0] * np.roll(sm, 1, 0) + k[1] * sm + k[2] * np.roll(sm, -1, 0)
    sm = k[0] * np.roll(sm, 1, 1) + k[1] * sm + k[2] * np.roll(sm, -1, 1)
    gx = 0.5 * (np.roll(sm, -1, 1) - np.roll(sm, 1, 1))
    gy = 0.5 * (np.roll(sm, -1, 0) - np.roll(sm, 1, 0))

    def bilin(plane, x, y):
        x = np.clip(x, 0.0, W - 1.001)
        y = np.clip(y, 0.0, H - 1.001)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx, fy = x - x0, y - y0
        x1 = np.minimum(x0 + 1, W - 1)
        y1 = np.minimum(y0 + 1, H - 1)
        return (plane[y0, x0] * (1 - fx) * (1 - fy)
                + plane[y0, x1] * fx * (1 - fy)
                + plane[y1, x0] * (1 - fx) * fy
                + plane[y1, x1] * fx * fy)

    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    d = p2 - p1
    dL = d / max(np.linalg.norm(d), 1e-6)
    dP = np.array([-dL[1], dL[0]])

    M = m * w
    s_frac = (np.arange(S) + 0.5) / S
    r_off = np.arange(M) - (M - 1) / 2.0

    # Row vectors: per-row sums of the 4 rectified gradient projections,
    # weighted by the global Gaussian (paper eq. for f_g).
    sigma_g = 0.5 * (M - 1.0)
    f_g = np.exp(-0.5 * (r_off / sigma_g) ** 2)
    rowvec = np.zeros((M, 4))
    for i, r in enumerate(r_off):
        xs = p1[0] + s_frac * d[0] + r * dP[0]
        ys = p1[1] + s_frac * d[1] + r * dP[1]
        gxv = bilin(gx, xs, ys)
        gyv = bilin(gy, xs, ys)
        gL = gxv * dL[0] + gyv * dL[1]
        gP = gxv * dP[0] + gyv * dP[1]
        rowvec[i] = [
            np.maximum(gP, 0).sum(),
            np.maximum(-gP, 0).sum(),
            np.maximum(gL, 0).sum(),
            np.maximum(-gL, 0).sum(),
        ]
    rowvec *= f_g[:, None]

    # Band means/stds over the 3-band local-Gaussian window (paper §3.2).
    band_center = (np.arange(m) + 0.5) * w - 0.5
    row_idx = np.arange(M, dtype=float)
    desc_mean = np.zeros((m, 4))
    desc_std = np.zeros((m, 4))
    for b in range(m):
        dist = row_idx - band_center[b]
        wl = np.exp(-0.5 * (dist / w) ** 2)
        in_win = np.abs(row_idx // w - b) <= 1.0
        wl = np.where(in_win, wl, 0.0)
        wl = wl / max(wl.sum(), 1e-12)
        mu = (wl[:, None] * rowvec).sum(0)
        ex2 = (wl[:, None] * rowvec**2).sum(0)
        desc_mean[b] = mu
        desc_std[b] = np.sqrt(np.maximum(ex2 - mu**2, 0.0))

    def norm(x):
        return x / max(np.linalg.norm(x), 1e-12)

    mean_f = norm(desc_mean.reshape(-1))
    std_f = norm(desc_std.reshape(-1))
    full = np.concatenate([np.clip(mean_f, -0.4, 0.4),
                           np.clip(std_f, -0.4, 0.4)])
    h = full.size // 2
    return np.concatenate([norm(full[:h]), norm(full[h:])])


def _segments(xyxy_list, K=8):
    xy = np.zeros((K, 4), np.float32)
    valid = np.zeros((K,), bool)
    for i, s in enumerate(xyxy_list):
        xy[i] = s
        valid[i] = True
    d = xy[:, 2:] - xy[:, :2]
    return Segments(
        xyxy=jnp.asarray(xy),
        angle=jnp.arctan2(jnp.asarray(d[:, 1]), jnp.asarray(d[:, 0])),
        width=jnp.full((K,), 2.0),
        score=jnp.ones((K,)),
        valid=jnp.asarray(valid),
    )


@pytest.fixture(scope="module")
def edge_image():
    """Vertical step edge + a diagonal ramp: non-trivial gradients."""
    H, W = 80, 100
    img = np.zeros((H, W), np.float32)
    img[:, 50:] = 200.0
    yy, xx = np.mgrid[0:H, 0:W]
    img += 0.3 * (xx + 2 * yy)
    return img


def test_lbd_matches_numpy_oracle(edge_image):
    cfg = LbdConfig()
    segs_xyxy = [
        (50.0, 10.0, 50.0, 60.0),   # along the step edge
        (20.0, 20.0, 70.0, 55.0),   # oblique, crossing the edge
        (10.0, 70.0, 80.0, 70.0),   # horizontal in the ramp region
    ]
    segs = _segments(segs_xyxy)
    out = np.asarray(describe_lines(jnp.asarray(edge_image), segs, cfg))
    for i, (x1, y1, x2, y2) in enumerate(segs_xyxy):
        ref = _numpy_lbd(edge_image, (x1, y1), (x2, y2),
                         cfg.num_bands, cfg.band_width, cfg.num_samples)
        np.testing.assert_allclose(out[i], ref, atol=2e-4, err_msg=f"seg {i}")


def test_lbd_structvideo_invariants(edge_image):
    """Descriptor halves are unit-norm; invalid slots zero; edge segment's
    perpendicular-gradient channels dominate (the step edge is all gP)."""
    cfg = LbdConfig()
    segs = _segments([(50.0, 10.0, 50.0, 60.0)])
    out = np.asarray(describe_lines(jnp.asarray(edge_image), segs, cfg))
    h = out.shape[-1] // 2
    assert np.isclose(np.linalg.norm(out[0, :h]), 1.0, atol=1e-4)
    assert np.isclose(np.linalg.norm(out[0, h:]), 1.0, atol=1e-4)
    assert (out[1:] == 0.0).all()
    mean_half = out[0, :h].reshape(cfg.num_bands, 4)
    # One of the two gP channels carries the edge; gL channels are ramp-only.
    assert mean_half[:, :2].max() > 3.0 * np.abs(mean_half[:, 2:]).max()
