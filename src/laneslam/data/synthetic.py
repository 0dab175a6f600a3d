"""Synthetic 3D scene generator: the backbone of property/convergence tests
and the no-external-data integration path (SURVEY.md §4.2).

Generates a deterministic world of 3D points and 3D line segments plus a
smooth camera trajectory, and renders images by drawing the projected
segments — so the *real* LSD/LBD/match/BA pipeline can run end-to-end with
known ground truth and zero external data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from laneslam.geometry.camera import Camera


@dataclass(frozen=True)
class SyntheticScene:
    """A deterministic world + trajectory, all numpy (host-side fixture)."""

    points: np.ndarray  # (P, 3)
    segments: np.ndarray  # (L, 2, 3) endpoint pairs
    poses_wc: np.ndarray  # (F, 4, 4) camera-to-world per frame
    cam: Camera


def make_corridor_scene(
    seed: int = 0,
    num_frames: int = 30,
    num_points: int = 300,
    num_lines: int = 80,
    cam: Camera | None = None,
) -> SyntheticScene:
    """A corridor-like scene: structured lines along walls + random points.

    The camera moves forward with small rotations — KITTI-like motion.
    """
    rng = np.random.default_rng(seed)
    cam = cam or Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)

    length = 4.0 * num_frames * 0.15 + 30.0
    # Points on two walls (x = ±4) and scattered.
    pts = []
    for xw in (-4.0, 4.0):
        n = num_points // 3
        pts.append(
            np.stack(
                [
                    np.full(n, xw) + rng.normal(0, 0.2, n),
                    rng.uniform(-2, 2, n),
                    rng.uniform(0.5, length, n),
                ],
                axis=-1,
            )
        )
    n = num_points - 2 * (num_points // 3)
    pts.append(
        np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(0.5, length, n)],
            axis=-1,
        )
    )
    points = np.concatenate(pts, axis=0).astype(np.float32)

    # Lines: vertical/horizontal structure on the walls.
    segs = []
    for _ in range(num_lines):
        xw = rng.choice([-4.0, 4.0])
        z0 = rng.uniform(1.0, length)
        if rng.random() < 0.5:  # vertical
            y0 = rng.uniform(-2, 1)
            p1 = [xw, y0, z0]
            p2 = [xw, y0 + rng.uniform(0.8, 2.0), z0]
        else:  # along corridor
            y0 = rng.uniform(-2, 2)
            p1 = [xw, y0, z0]
            p2 = [xw, y0, z0 + rng.uniform(1.0, 4.0)]
        segs.append([p1, p2])
    segments = np.asarray(segs, dtype=np.float32)

    # Trajectory: forward motion + gentle yaw oscillation.
    poses = []
    for f in range(num_frames):
        z = 0.15 * f
        yaw = 0.03 * np.sin(0.15 * f)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        t = np.array([0.3 * np.sin(0.1 * f), 0.02 * np.sin(0.23 * f), z], dtype=np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    return SyntheticScene(points=points, segments=segments, poses_wc=np.stack(poses), cam=cam)


def make_loop_scene(
    seed: int = 0,
    num_frames: int = 90,
    num_points: int = 900,
    num_lines: int = 160,
    cam: Camera | None = None,
    radius: float = 2.0,
    room: float = 12.0,
    laps: float = 1.0,
) -> SyntheticScene:
    """A room scene with a closed-loop trajectory (exercises loop closure).

    Four textured walls of a square room (side 2*room); the camera circles
    inside (radius `radius`) looking outward and returns to its start pose
    on the final frames. `laps` > 1 circles multiple times — every revisit
    of the first lap's keyframes is a loop-closure opportunity (the
    full-scale rehearsal uses this for repeated closures).
    """
    rng = np.random.default_rng(seed)
    cam = cam or Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)

    pts = []
    lines = []
    walls = [
        (np.array([0.0, 0.0, room]), np.array([1.0, 0.0, 0.0])),   # +z wall, spans x
        (np.array([0.0, 0.0, -room]), np.array([1.0, 0.0, 0.0])),  # -z wall
        (np.array([room, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),   # +x wall, spans z
        (np.array([-room, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),  # -x wall
    ]
    for center, span in walls:
        n = num_points // 4
        s = rng.uniform(-room, room, n)
        y = rng.uniform(-2.5, 2.5, n)
        pts.append(center[None, :] + s[:, None] * span[None, :] + np.stack([np.zeros(n), y, np.zeros(n)], -1))
        for _ in range(num_lines // 4):
            s0 = rng.uniform(-room, room)
            if rng.random() < 0.5:  # vertical line on the wall
                y0 = rng.uniform(-2.5, 0.5)
                p1 = center + s0 * span + np.array([0, y0, 0])
                p2 = p1 + np.array([0, rng.uniform(1.0, 2.5), 0])
            else:  # horizontal along the wall
                y0 = rng.uniform(-2.5, 2.5)
                p1 = center + s0 * span + np.array([0, y0, 0])
                p2 = p1 + rng.uniform(1.0, 4.0) * span
            lines.append([p1, p2])
    points = np.concatenate(pts, axis=0).astype(np.float32)
    segments = np.asarray(lines, dtype=np.float32)

    poses = []
    for f in range(num_frames):
        th = 2.0 * np.pi * laps * f / (num_frames - 3)  # closes before the end
        pos = np.array([radius * np.sin(th), 0.0, -radius * np.cos(th)], dtype=np.float32)
        yaw = th  # camera z-axis looks outward (away from room center)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T)
    return SyntheticScene(points=points, segments=segments, poses_wc=np.stack(poses), cam=cam)


def _project_np(cam: Camera, T_wc: np.ndarray, X: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    T_cw = np.linalg.inv(T_wc)
    Xc = X @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = Xc[:, 2]
    zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
    u = float(cam.fx) * Xc[:, 0] / zs + float(cam.cx)
    v = float(cam.fy) * Xc[:, 1] / zs + float(cam.cy)
    return np.stack([u, v], axis=-1), z


def scene_observations(
    scene: SyntheticScene, frame: int, noise_px: float = 0.0, seed: int = 0,
    baseline: float = 0.0,
):
    """Exact (or noisy) projections for property tests.

    baseline > 0 shifts the camera by +baseline along its x axis (the right
    camera of a rectified stereo pair).

    Returns (uv_points (P,2), vis_points (P,), seg_uv (L,4), vis_lines (L,)).
    """
    rng = np.random.default_rng(seed * 1000 + frame)
    cam = scene.cam
    T = scene.poses_wc[frame]
    if baseline != 0.0:
        shift = np.eye(4, dtype=T.dtype)
        shift[0, 3] = baseline
        T = T @ shift
    uv, z = _project_np(cam, T, scene.points)
    vis = (z > 0.3) & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    uv1, z1 = _project_np(cam, T, scene.segments[:, 0])
    uv2, z2 = _project_np(cam, T, scene.segments[:, 1])
    in_img = lambda p: (p[:, 0] >= 0) & (p[:, 0] < cam.width) & (p[:, 1] >= 0) & (p[:, 1] < cam.height)
    vis_l = (z1 > 0.3) & (z2 > 0.3) & in_img(uv1) & in_img(uv2)
    if noise_px > 0:
        uv = uv + rng.normal(0, noise_px, uv.shape)
        uv1 = uv1 + rng.normal(0, noise_px, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise_px, uv2.shape)
    seg = np.concatenate([uv1, uv2], axis=-1).astype(np.float32)
    return uv.astype(np.float32), vis, seg, vis_l


def _draw_frame(
    H: int, W: int, uv: np.ndarray, vis_p: np.ndarray,
    seg: np.ndarray, vis_l: np.ndarray, noise_rng: np.random.Generator,
) -> np.ndarray:
    """Rasterize point blobs + segments onto a noisy background.

    World points draw as bright 5x5 blobs with deterministic per-landmark
    brightness/asymmetry (fixed seed 4242, keyed by landmark index) so BRIEF
    descriptors can tell them apart.
    """
    img = (noise_rng.normal(110, 3, (H, W))).astype(np.float32)
    pt_rng = np.random.default_rng(4242)  # landmark appearance, world-fixed
    peak = pt_rng.uniform(170.0, 250.0, size=len(uv))
    tilt = pt_rng.uniform(-0.5, 0.5, size=(len(uv), 2))
    for k, ((x, y), ok) in enumerate(zip(uv, vis_p)):
        if not ok:
            continue
        xi, yi = int(round(x)), int(round(y))
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                xx, yy = xi + dx, yi + dy
                if 0 <= xx < W and 0 <= yy < H:
                    fall = 22.0 * max(abs(dx), abs(dy))
                    asym = 28.0 * (tilt[k, 0] * dx + tilt[k, 1] * dy)
                    val = peak[k] - fall + asym
                    img[yy, xx] = max(img[yy, xx], val)

    for (x1, y1, x2, y2), ok in zip(seg, vis_l):
        if not ok:
            continue
        n = int(max(abs(x2 - x1), abs(y2 - y1)) * 2) + 2
        xs = np.linspace(x1, x2, n)
        ys = np.linspace(y1, y2, n)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                xi = np.clip(np.round(xs + dx).astype(int), 0, W - 1)
                yi = np.clip(np.round(ys + dy).astype(int), 0, H - 1)
                val = 230.0 if (dx == 0 and dy == 0) else 190.0
                img[yi, xi] = np.maximum(img[yi, xi], val)
    return np.clip(img, 0, 255).astype(np.uint8)


def render_scene_frame(
    scene: SyntheticScene, frame: int, baseline: float = 0.0
) -> np.ndarray:
    """Render a grayscale uint8 image: world-anchored segments AND points.

    Crucial fixture property: everything with repeatable image structure is
    anchored in the 3D world. The per-pixel noise is re-drawn per frame
    (different seed each frame) so it cannot form stable fake corners — a
    fixed noise pattern would be a static image-space overlay that matches
    across frames and votes for the identity pose, poisoning VO/SLAM tests.
    """
    cam = scene.cam
    rng = np.random.default_rng(977351 + frame * 7 + (13 if baseline != 0.0 else 0))
    uv, vis_p, seg, vis = scene_observations(scene, frame, baseline=baseline)
    return _draw_frame(cam.height, cam.width, uv, vis_p, seg, vis, rng)


def render_distorted_frame(
    scene: SyntheticScene,
    T_wc: np.ndarray,
    K: np.ndarray,
    dist: np.ndarray,
    noise_seed: int,
    width: int,
    height: int,
) -> np.ndarray:
    """Render through an arbitrary camera pose with radial-tangential
    distortion — the distorted UNRECTIFIED fixture for the EuRoC path
    (tests/fixtures/mini_euroc.py): features land at their true distorted
    pixels, so only geometry.undistort's coordinate rectification can make
    the stereo/SLAM pipeline work on it."""
    T_cw = np.linalg.inv(T_wc)

    def proj(X):
        Xc = X @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = Xc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        xy = Xc[:, :2] / zs[:, None]
        k1, k2, p1, p2 = dist[:4]
        x, y = xy[:, 0], xy[:, 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        u = K[0, 0] * xd + K[0, 2]
        v = K[1, 1] * yd + K[1, 2]
        return np.stack([u, v], axis=-1), z

    uv, z = proj(scene.points)
    vis = (z > 0.3) & (uv[:, 0] >= 0) & (uv[:, 0] < width) & (uv[:, 1] >= 0) & (uv[:, 1] < height)
    uv1, z1 = proj(scene.segments[:, 0])
    uv2, z2 = proj(scene.segments[:, 1])
    in_img = lambda p: (p[:, 0] >= 0) & (p[:, 0] < width) & (p[:, 1] >= 0) & (p[:, 1] < height)
    vis_l = (z1 > 0.3) & (z2 > 0.3) & in_img(uv1) & in_img(uv2)
    seg = np.concatenate([uv1, uv2], axis=-1).astype(np.float32)
    rng = np.random.default_rng(noise_seed)
    return _draw_frame(height, width, uv, vis, seg, vis_l, rng)
