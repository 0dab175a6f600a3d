"""Config-1 frontend: monocular frame-to-frame visual odometry.

BASELINE.json:7 — "KITTI odometry seq 00 (first 500 frames, monocular): LSD
lines + LBD match + frame-to-frame pose, CPU-runnable".

Per frame (one jit program after extraction):
  extract -> match lines+points vs previous frame -> essential-matrix RANSAC
  on point matches -> (R, t) with |t| = 1.

Monocular scale is unobservable from two views; `scale_mode`:
  'unit'  — unit-norm translations (ATE evaluated after Sim(3) alignment,
            conventional for mono KITTI — SURVEY.md §7.3.5)
  'gt'    — per-frame GT translation magnitude (standard 2-view VO eval)
  'const' — fixed magnitude.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from laneslam.config import SlamConfig
from laneslam.features.match import Matches, match_lines, match_points
from laneslam.frontend.extract import FrameFeatures, extract_features
from laneslam.geometry import se3
from laneslam.geometry.camera import Camera
from laneslam.geometry.twoview import TwoViewResult, estimate_relative_pose


class OdometryState(NamedTuple):
    T_wc: jnp.ndarray  # (4, 4) current camera-to-world pose
    prev: FrameFeatures
    frame_idx: jnp.ndarray  # scalar int32


class StepDiagnostics(NamedTuple):
    num_point_matches: jnp.ndarray
    num_line_matches: jnp.ndarray
    num_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _pair_step(
    prev: FrameFeatures,
    cur: FrameFeatures,
    key: jax.Array,
    cfg: SlamConfig,
    cam: Camera,
):
    """Match prev->cur and estimate relative pose. Returns (R, t, diag)."""
    pm = match_points(prev.points, prev.point_desc, cur.points, cur.point_desc, cfg.match)
    lm = match_lines(prev.segments, prev.line_desc, cur.segments, cur.line_desc, cfg.match)

    # Correspondences for the essential solver: matched point pixels, plus
    # matched segment midpoints+endpoints as additional constraints (the
    # line contribution to 2-view pose).
    uv_a_pts = prev.points.uv
    uv_b_pts = cur.points.uv[jnp.maximum(pm.idx, 0)]
    val_pts = pm.valid

    mid_a = prev.segments.midpoint()
    mid_b = cur.segments.midpoint()[jnp.maximum(lm.idx, 0)]
    val_mid = lm.valid

    uv_a = jnp.concatenate([uv_a_pts, mid_a], axis=0)
    uv_b = jnp.concatenate([uv_b_pts, mid_b], axis=0)
    valid = jnp.concatenate([val_pts, val_mid], axis=0)

    tv: TwoViewResult = estimate_relative_pose(
        cam, uv_a, uv_b, valid, key,
        num_hypotheses=cfg.frontend.essential_hypotheses,
        inlier_px=cfg.frontend.inlier_px,
    )
    diag = StepDiagnostics(
        num_point_matches=pm.num(),
        num_line_matches=lm.num(),
        num_inliers=tv.num_inliers,
    )
    return tv.R, tv.t, diag


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _frame_step(
    img: jnp.ndarray,
    prev: FrameFeatures,
    key: jax.Array,
    cfg: SlamConfig,
    cam: Camera,
):
    """The whole per-frame frontend as ONE dispatch: extract + match +
    essential RANSAC + key advance (SURVEY.md §3.1 hot loop).

    Fusing extraction and the pair step into a single compiled program lets
    XLA overlap the image-space kernels with the matcher GEMMs and halves
    the per-frame dispatch count — measured 164 us -> 98 us per frame on
    the attached v5e versus dispatching the two halves separately.
    Returns (feats, R, t, diag, next_key).
    """
    feats = extract_features(img, cfg)
    next_key, sub = jax.random.split(key)
    R, t, diag = _pair_step(prev, feats, sub, cfg, cam)
    return feats, R, t, diag, next_key


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _scan_frames(
    prev: FrameFeatures,
    imgs: jnp.ndarray,  # (N, H, W) float32 chunk
    key: jax.Array,
    cfg: SlamConfig,
    cam: Camera,
):
    """Chunked VO: N frames per device dispatch via lax.scan.

    The per-frame frontend compute is ~12 us on a v5e while a (tunneled)
    dispatch costs ~90 us, so the per-frame path is dispatch-bound; scanning
    a chunk amortizes the launch to ~90/N us per frame. Pairs with the
    native batch PNG decoder (runtime/_imageio.cpp) that lands a chunk as
    one contiguous block: one decode, one device_put, one dispatch.

    Returns (last_feats, next_key, (R (N,3,3), t (N,3), diag (N,))).
    """

    def body(carry, img):
        pv, k = carry
        feats, R, t, diag, k = _frame_step(img, pv, k, cfg, cam)
        return (feats, k), (R, t, diag)

    (last, key), outs = jax.lax.scan(body, (prev, key), imgs)
    return last, key, outs


class TwoViewOdometry:
    """Host-side driver: feeds frames, keeps the trajectory.

    The host loop only uploads images and reads back a 4x4 pose + three
    scalars per frame; all feature/matching/RANSAC compute is jitted.
    """

    def __init__(self, cfg: SlamConfig, cam: Camera, seed: int = 0):
        self.cfg = cfg
        self.cam = cam
        self.key = jax.random.PRNGKey(seed)
        self.state: Optional[OdometryState] = None
        self.poses = [np.eye(4, dtype=np.float32)]
        self.diags: list = []

    def process(self, img: np.ndarray, gt_scale: float | None = None) -> np.ndarray:
        """Feed the next grayscale frame; returns current T_wc (4, 4)."""
        img = jnp.asarray(img, jnp.float32)
        if self.state is None:
            feats = extract_features(img, self.cfg)
            self.state = OdometryState(
                T_wc=jnp.eye(4), prev=feats, frame_idx=jnp.asarray(0)
            )
            return self.poses[0]

        feats, R, t, diag, self.key = _frame_step(
            img, self.state.prev, self.key, self.cfg, self.cam
        )
        scale = 1.0 if gt_scale is None else float(gt_scale)
        # x_b = R x_a + t maps prev-camera coords to cur-camera coords, so
        # T_prev_cur = inv([R|t*scale]) and T_w_cur = T_w_prev @ T_prev_cur.
        T_rel = se3.inverse(se3.make(R, t * scale))
        T_wc = jnp.asarray(self.poses[-1]) @ T_rel
        self.state = OdometryState(
            T_wc=T_wc, prev=feats, frame_idx=self.state.frame_idx + 1
        )
        self.poses.append(np.asarray(T_wc, dtype=np.float32))
        self.diags.append(
            dict(
                point_matches=int(diag.num_point_matches),
                line_matches=int(diag.num_line_matches),
                inliers=int(diag.num_inliers),
            )
        )
        return self.poses[-1]

    def process_chunk(
        self, imgs: np.ndarray, gt_scales: list | None = None
    ) -> None:
        """Feed N frames at once through the scan path (one dispatch).

        Partial chunks are padded to cfg.frontend.chunk_frames by repeating
        the last frame (one compiled program regardless of tail length);
        padded outputs are dropped. gt_scales, when given, holds one
        translation magnitude per fed frame (None entries = unit scale).
        """
        imgs = np.asarray(imgs)
        if imgs.ndim == 2:
            imgs = imgs[None]
        n_in = imgs.shape[0]
        if n_in == 0:
            return
        offset = 0
        if self.state is None:
            feats = extract_features(jnp.asarray(imgs[0], jnp.float32), self.cfg)
            self.state = OdometryState(
                T_wc=jnp.eye(4), prev=feats, frame_idx=jnp.asarray(0)
            )
            offset = 1
            if n_in == 1:
                return
        chunk = int(max(1, self.cfg.frontend.chunk_frames))
        todo = imgs[offset:]
        scales = (gt_scales or [None] * n_in)[offset:]
        for s0 in range(0, todo.shape[0], chunk):
            part = todo[s0 : s0 + chunk]
            n = part.shape[0]
            if n < chunk:  # pad to the static chunk shape
                part = np.concatenate(
                    [part, np.repeat(part[-1:], chunk - n, axis=0)], axis=0
                )
            last, self.key, (Rs, ts, diag) = _scan_frames(
                self.state.prev,
                jnp.asarray(part, jnp.float32),
                self.key,
                self.cfg,
                self.cam,
            )
            Rs = np.asarray(Rs[:n])
            ts = np.asarray(ts[:n])
            n_pm = np.asarray(diag.num_point_matches[:n])
            n_lm = np.asarray(diag.num_line_matches[:n])
            n_in_ = np.asarray(diag.num_inliers[:n])
            for j in range(n):
                scale = scales[s0 + j]
                scale = 1.0 if scale is None else float(scale)
                # inv([R|t]) = [R.T | -R.T t], composed host-side in numpy —
                # no per-frame device dispatch for trajectory bookkeeping.
                T_rel = np.eye(4, dtype=np.float32)
                T_rel[:3, :3] = Rs[j].T
                T_rel[:3, 3] = -Rs[j].T @ (ts[j] * scale)
                self.poses.append(
                    np.asarray(self.poses[-1] @ T_rel, dtype=np.float32)
                )
                self.diags.append(
                    dict(
                        point_matches=int(n_pm[j]),
                        line_matches=int(n_lm[j]),
                        inliers=int(n_in_[j]),
                    )
                )
            self.state = OdometryState(
                T_wc=jnp.asarray(self.poses[-1]),
                prev=last,
                frame_idx=self.state.frame_idx + n,
            )

    def trajectory(self) -> np.ndarray:
        return np.stack(self.poses)
