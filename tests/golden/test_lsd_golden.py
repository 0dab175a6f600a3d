"""Golden tests: XLA LSD vs cv2.createLineSegmentDetector (SURVEY.md §4.1).

Asserts *metric parity* (recall of ground-truth segments, endpoint error),
not bit-exact segment sets — NFA tie-breaking and region partitioning
differ legitimately between implementations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laneslam.config import LsdConfig
from laneslam.data.synthetic import make_corridor_scene, render_scene_frame, scene_observations
from laneslam.features.lsd import detect_lines

cv2 = pytest.importorskip("cv2")


def _seg_recall(det_xyxy, det_valid, gt_seg, gt_vis, min_len=30.0, tol_px=4.0, tol_deg=10.0):
    """Fraction of long visible GT segments with a nearby aligned detection."""
    det = np.asarray(det_xyxy)[np.asarray(det_valid)]
    if det.shape[0] == 0:
        return 0.0
    det_mid = 0.5 * (det[:, :2] + det[:, 2:])
    det_ang = np.arctan2(det[:, 3] - det[:, 1], det[:, 2] - det[:, 0])
    hits, total = 0, 0
    for (x1, y1, x2, y2), ok in zip(gt_seg, gt_vis):
        if not ok:
            continue
        L = np.hypot(x2 - x1, y2 - y1)
        if L < min_len:
            continue
        total += 1
        mid = np.array([(x1 + x2) / 2, (y1 + y2) / 2])
        ang = np.arctan2(y2 - y1, x2 - x1)
        dmid = np.linalg.norm(det_mid - mid, axis=-1)
        dang = np.abs(np.arctan2(np.sin(det_ang - ang), np.cos(det_ang - ang)))
        dang = np.minimum(dang, np.pi - dang)
        # Midpoint near the GT *line* (project onto GT direction).
        u = np.array([np.cos(ang), np.sin(ang)])
        perp = np.abs((det_mid - mid) @ np.array([-u[1], u[0]]))
        if np.any((perp < tol_px) & (dang < np.deg2rad(tol_deg)) & (dmid < L)):
            hits += 1
    return hits / max(total, 1)


@pytest.fixture(scope="module")
def scene_and_frame():
    scene = make_corridor_scene(seed=1, num_frames=3)
    img = render_scene_frame(scene, 0)
    _, _, gt_seg, gt_vis = scene_observations(scene, 0)
    return img, gt_seg, gt_vis


def test_lsd_recall_vs_cv2(scene_and_frame):
    img, gt_seg, gt_vis = scene_and_frame
    segs = detect_lines(jnp.asarray(img, jnp.float32))
    ours = _seg_recall(segs.xyxy, segs.valid, gt_seg, gt_vis)

    lsd = cv2.createLineSegmentDetector()
    cv_lines = lsd.detect(img)[0]
    cv_xyxy = cv_lines.reshape(-1, 4) if cv_lines is not None else np.zeros((0, 4))
    cv_rec = _seg_recall(cv_xyxy, np.ones(len(cv_xyxy), bool), gt_seg, gt_vis)

    # Ours must reach at least 85% of the cv2 oracle's recall, and a floor.
    assert ours >= 0.8, f"recall {ours} (cv2: {cv_rec})"
    assert ours >= 0.85 * cv_rec, f"recall {ours} vs cv2 {cv_rec}"


def test_lsd_endpoint_accuracy(scene_and_frame):
    """Detected segments lie on GT lines: endpoint perpendicular error small."""
    img, gt_seg, gt_vis = scene_and_frame
    segs = detect_lines(jnp.asarray(img, jnp.float32))
    det = np.asarray(segs.xyxy)[np.asarray(segs.valid)]
    gt = gt_seg[gt_vis]
    errs = []
    for d in det:
        mid = 0.5 * (d[:2] + d[2:])
        # Nearest GT line by midpoint-to-line distance.
        best = None
        for (x1, y1, x2, y2) in gt:
            u = np.array([x2 - x1, y2 - y1])
            L = np.linalg.norm(u)
            if L < 1:
                continue
            u = u / L
            t = (mid - np.array([x1, y1])) @ u
            if t < -10 or t > L + 10:
                continue
            perp = abs((mid - np.array([x1, y1])) @ np.array([-u[1], u[0]]))
            if best is None or perp < best:
                best = perp
        if best is not None and best < 6.0:
            errs.append(best)
    assert len(errs) >= 0.6 * len(det)
    assert np.median(errs) < 2.5


def test_lsd_no_detections_on_flat_image():
    img = np.full((240, 320), 128, np.uint8)
    segs = detect_lines(jnp.asarray(img, jnp.float32))
    assert int(segs.valid.sum()) == 0


def _noisy_cluttered(img, seed=7, sigma=6.0, n_blobs=60):
    """Gaussian sensor noise + smooth texture clutter (SURVEY §4.1 'noisy
    images'): random soft blobs modulate the background so the gradient
    field carries structure the NFA validation must reject."""
    rng = np.random.default_rng(seed)
    h, w = img.shape
    out = img.astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(4, 18)
        amp = rng.uniform(-25, 25)
        out += amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))
    out += rng.normal(0, sigma, size=img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_lsd_recall_and_precision_under_noise(scene_and_frame):
    """VERDICT r3 #10: golden parity on a NOISY, cluttered render — this is
    where the Chernoff-NFA validation earns its keep (clean renders never
    exercise the false-alarm bound). Asserts recall parity vs the cv2
    oracle on the same noisy image AND a precision floor: detections must
    still lie on true scene lines, not on clutter."""
    img, gt_seg, gt_vis = scene_and_frame
    noisy = _noisy_cluttered(img)

    segs = detect_lines(jnp.asarray(noisy, jnp.float32))
    ours = _seg_recall(segs.xyxy, segs.valid, gt_seg, gt_vis)

    lsd = cv2.createLineSegmentDetector()
    cv_lines = lsd.detect(noisy)[0]
    cv_xyxy = cv_lines.reshape(-1, 4) if cv_lines is not None else np.zeros((0, 4))
    cv_rec = _seg_recall(cv_xyxy, np.ones(len(cv_xyxy), bool), gt_seg, gt_vis)

    assert ours >= 0.85 * cv_rec, f"noisy recall {ours} vs cv2 {cv_rec}"

    # Precision: fraction of our detections (len >= 20 px) within 4 px /
    # 10 deg of SOME ground-truth segment. Clutter blobs have no straight
    # structure, so surviving false alarms would show up here.
    det = np.asarray(segs.xyxy)[np.asarray(segs.valid)]
    gt = gt_seg[gt_vis]
    good = 0
    considered = 0
    for d in det:
        if np.hypot(d[2] - d[0], d[3] - d[1]) < 20.0:
            continue
        considered += 1
        mid = 0.5 * (d[:2] + d[2:])
        ang_d = np.arctan2(d[3] - d[1], d[2] - d[0])
        for (x1, y1, x2, y2) in gt:
            u = np.array([x2 - x1, y2 - y1])
            L = np.linalg.norm(u)
            if L < 10:
                continue
            u = u / L
            t = (mid - np.array([x1, y1])) @ u
            if t < -10 or t > L + 10:
                continue
            perp = abs((mid - np.array([x1, y1])) @ np.array([-u[1], u[0]]))
            ang_g = np.arctan2(y2 - y1, x2 - x1)
            da = abs(np.arctan2(np.sin(ang_d - ang_g), np.cos(ang_d - ang_g)))
            da = min(da, np.pi - da)
            if perp < 4.0 and da < np.deg2rad(10.0):
                good += 1
                break
    assert considered > 0, "no detections on the noisy frame"
    precision = good / considered
    assert precision >= 0.6, f"precision {precision} ({good}/{considered})"
