#!/usr/bin/env python
"""Full-scale synthetic rehearsal of configs 2/3 (VERDICT r3 #3).

KITTI 00 is ~4,541 frames / ~450 keyframes with multiple loop closures —
unavailable in this environment (no datasets, no network), so this is the
accuracy-at-scale proxy: a 4,500-frame multi-lap synthetic loop sequence at
PRODUCTION capacities through the fused chunk path (process_chunk, deferred
readbacks), recording ATE, steady-state fps, loop closures, and every
overflow counter.

    python scripts/rehearsal.py                 # full 4,500 frames on TPU
    python scripts/rehearsal.py --frames 600    # reduced smoke

Frames are pre-rendered to memory so the measured fps is the SLAM system's,
not the synthetic renderer's. Results are recorded in BASELINE.md §6.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--laps", type=float, default=4.0)
    ap.add_argument("--chunk", type=int, default=10,
                    help="frames per keyframe/dispatch (10 -> 450 KFs at 4500)")
    ap.add_argument("--scene", default="loop", choices=("loop", "corridor"),
                    help="loop = multi-lap room (loop closures); corridor = "
                         "KITTI-like forward motion (landmark-capacity "
                         "pressure: ~45k landmarks born vs 16k capacity)")
    ap.add_argument("--backend", default="")
    ap.add_argument("--global-ba", action="store_true", dest="global_ba",
                    help="final full-map BA refinement (SlamSystem.global_ba)")
    ap.add_argument("--no-loop", action="store_true", dest="no_loop",
                    help="disable loop closure (the BASELINE.md §6 control)")
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from laneslam.config import SlamConfig
    from laneslam.data.synthetic import (
        make_corridor_scene, make_loop_scene, render_scene_frame,
    )
    from laneslam.eval.ate import ate_rmse
    from laneslam.geometry.camera import Camera
    from laneslam.system import SlamSystem

    n = args.frames
    cfg = SlamConfig()  # PRODUCTION capacities (512 KF / 16384 pts / 4096 ln)
    cfg = cfg.override(
        frontend=dataclasses.replace(
            cfg.frontend, chunk_frames=args.chunk, kf_max_interval=args.chunk
        )
    )
    if args.scene == "corridor":
        # Landmark density ~ num_points * (visible span / corridor length);
        # scaled so ~200 landmarks are visible per frame, which makes the
        # total born far exceed capacity — the arena/culling pressure test
        # at production scale (SURVEY §7.3.8).
        scene = make_corridor_scene(
            seed=0, num_frames=n, num_points=14000, num_lines=2200,
        )
    else:
        scene = make_loop_scene(
            seed=0, num_frames=n, radius=6.0, room=18.0,
            num_points=2400, num_lines=420, laps=args.laps,
        )
    cam = Camera(
        fx=float(scene.cam.fx), fy=float(scene.cam.fy),
        cx=float(scene.cam.cx), cy=float(scene.cam.cy),
        width=scene.cam.width, height=scene.cam.height,
    )

    cache = os.environ.get("LANESLAM_RENDER_CACHE", "")
    cache_path = (
        os.path.join(cache, f"rehearsal_{args.scene}_{n}_{args.laps}.npy")
        if cache else ""
    )
    if cache_path and os.path.exists(cache_path):
        frames = np.load(cache_path, mmap_mode="r")
        print(f"[rehearsal] loaded {n} frames from cache", flush=True)
    else:
        t0 = time.perf_counter()
        frames = np.stack([render_scene_frame(scene, i) for i in range(n)])
        t_render = time.perf_counter() - t0
        print(f"[rehearsal] rendered {n} frames in {t_render:.1f}s "
              f"({frames.nbytes / 1e9:.2f} GB)", flush=True)
        if cache_path:
            np.save(cache_path, frames)

    sys_ = SlamSystem(cfg, cam, enable_loop=not args.no_loop, enable_ba=True)
    sys_.defer_readback = True
    i = 0
    while not sys_.bootstrapped or i < 4:
        sys_.process_frame(frames[i])
        i += 1
    sys_.resync()
    print(f"[rehearsal] bootstrapped after {i} frames", flush=True)

    chunk = args.chunk
    # Warm/compile two chunks outside the timed region.
    warm_end = i + 2 * chunk
    while i < warm_end and i + chunk <= n:
        sys_.process_chunk(frames[i:i + chunk])
        i += chunk
    jax.block_until_ready(sys_.T_cur)
    t0 = time.perf_counter()
    steady0 = i
    while i + chunk <= n:
        sys_.process_chunk(frames[i:i + chunk])
        i += chunk
    jax.block_until_ready(sys_.T_cur)
    t_steady = time.perf_counter() - t0
    fps = (i - steady0) / max(t_steady, 1e-9)
    for k in range(i, n):  # tail through the per-frame path
        sys_.process_frame(frames[k])
    sys_.flush_chunks()

    traj = sys_.trajectory()
    gt = scene.poses_wc[: len(traj)]
    ate, _ = ate_rmse(jnp.asarray(traj), jnp.asarray(gt), align_scale=True)
    # None (-> JSON null) when --global-ba is off: a NaN literal is not
    # valid strict JSON and breaks downstream parsers (ADVICE r4).
    result = {
        "frames": n,
        "laps": args.laps,
        "keyframes": int(sys_.map.kf_count),
        "points": int(sys_.map.pt_count),
        "lines": int(sys_.map.ln_count),
        "loops": int(sys_.num_loops),
        "ate_rmse_sim3": round(float(ate), 4),
        "ate_rmse_sim3_after_global_ba": None,
        "global_ba_s": None,
        "steady_fps": round(fps, 1),
        "pt_overflow": int(sys_.map.pt_overflow),
        "ln_overflow": int(sys_.map.ln_overflow),
        "edge_overflow": int(sys_.edges.overflow),
        "finite": bool(np.all(np.isfinite(traj))),
    }
    # Pre-global-BA record printed FIRST: a global-BA failure (e.g. an OOM
    # at an untried window bucket) must not lose the run's measurements.
    print("REHEARSAL " + json.dumps(result), flush=True)
    if args.global_ba:
        t0 = time.perf_counter()
        sys_.global_ba()
        result["global_ba_s"] = round(time.perf_counter() - t0, 2)
        a, _ = ate_rmse(
            jnp.asarray(sys_.trajectory()), jnp.asarray(gt), align_scale=True
        )
        result["ate_rmse_sim3_after_global_ba"] = round(float(a), 4)
        print("REHEARSAL " + json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
