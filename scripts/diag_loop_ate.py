#!/usr/bin/env python
"""Diagnose WHY accepted loop closures do not reduce global Sim(3) ATE on
the rehearsal fixture (BASELINE.md §6 loop-off control). Decomposes the
error: keyframe-only vs full-trajectory ATE, Sim(3) vs SE(3) alignment
(scale drift vs rigid drift), and per-lap scale of the estimate vs GT.

    python scripts/diag_loop_ate.py --frames 1200 --laps 2.5
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def run_once(frames, cam, cfg, enable_loop):
    from laneslam.system import SlamSystem

    n = len(frames)
    sys_ = SlamSystem(cfg, cam, enable_loop=enable_loop, enable_ba=True)
    sys_.defer_readback = True
    i = 0
    while not sys_.bootstrapped or i < 4:
        sys_.process_frame(frames[i])
        i += 1
    sys_.resync()
    chunk = cfg.frontend.chunk_frames
    while i + chunk <= n:
        sys_.process_chunk(frames[i:i + chunk])
        i += chunk
    for k in range(i, n):
        sys_.process_frame(frames[k])
    sys_.flush_chunks()
    return sys_


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1200)
    ap.add_argument("--laps", type=float, default=2.5)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from laneslam.config import SlamConfig
    from laneslam.data.synthetic import make_loop_scene, render_scene_frame
    from laneslam.eval.ate import ate_rmse
    from laneslam.geometry.camera import Camera
    from laneslam.system import SlamSystem

    n = args.frames
    cfg = SlamConfig()
    cfg = cfg.override(
        frontend=dataclasses.replace(
            cfg.frontend, chunk_frames=args.chunk, kf_max_interval=args.chunk
        )
    )
    scene = make_loop_scene(
        seed=0, num_frames=n, radius=6.0, room=18.0,
        num_points=2400, num_lines=420, laps=args.laps,
    )
    cam = Camera(
        fx=float(scene.cam.fx), fy=float(scene.cam.fy),
        cx=float(scene.cam.cx), cy=float(scene.cam.cy),
        width=scene.cam.width, height=scene.cam.height,
    )
    t0 = time.perf_counter()
    frames = np.stack([render_scene_frame(scene, i) for i in range(n)])
    print(f"[diag] rendered {n} frames in {time.perf_counter()-t0:.1f}s",
          flush=True)

    gt = np.asarray(scene.poses_wc)

    for loops_on in (True, False):
        s = run_once(frames, cam, cfg, loops_on)
        traj = s.trajectory()
        m = len(traj)
        g = jnp.asarray(gt[:m])
        t = jnp.asarray(traj)
        ate_s3, _ = ate_rmse(t, g, align_scale=True)
        ate_se3, _ = ate_rmse(t, g, align_scale=False)
        # Per-segment scale of the estimate vs GT: localizes WHERE scale
        # drift lives (uniform offset would be aligned away by Sim(3)).
        est_t = np.asarray(t[:, :3, 3])
        gt_t = np.asarray(g[:, :3, 3])
        seg = max(1, m // 8)
        scales = []
        for a in range(0, m - seg, seg):
            de = np.linalg.norm(np.diff(est_t[a:a + seg], axis=0), axis=1).sum()
            dg = np.linalg.norm(np.diff(gt_t[a:a + seg], axis=0), axis=1).sum()
            scales.append(round(float(de / max(dg, 1e-9)), 4))
        print(json.dumps({
            "loops_on": loops_on,
            "num_loops": int(s.num_loops),
            "ate_sim3": round(float(ate_s3), 4),
            "ate_se3": round(float(ate_se3), 4),
            "kf_count": int(s.map.kf_count),
            "per_segment_scale_est_over_gt": scales,
        }), flush=True)
        t0 = time.perf_counter()
        gba_cost = s.global_ba()
        t_gba = time.perf_counter() - t0
        t2 = jnp.asarray(s.trajectory())
        ate_gba, _ = ate_rmse(t2, g, align_scale=True)
        print(json.dumps({
            "loops_on": loops_on,
            "ate_sim3_after_global_ba": round(float(ate_gba), 4),
            "gba_cost": gba_cost, "gba_s": round(t_gba, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
