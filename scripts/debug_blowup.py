#!/usr/bin/env python
"""Localize the 4500-frame mono rehearsal divergence (round 5): run the
chunked pipeline with periodic flush+finite-checks and print per-window
diagnostics (max |t|, loop events, per-chunk BA costs) so the exploding
chunk and its trigger are identifiable.

    LANESLAM_RENDER_CACHE=/tmp/ls_cache python scripts/debug_blowup.py \
        --frames 4500 --laps 4 --check-every 20
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--laps", type=float, default=4.0)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--check-every", type=int, default=20, dest="check_every")
    ap.add_argument("--no-loop", action="store_true", dest="no_loop")
    ap.add_argument("--stop-after", type=int, default=0, dest="stop_after",
                    help="process only the first N chunks (scene geometry "
                         "still comes from --frames/--laps, so a truncated "
                         "run sees the SAME trajectory as the full one)")
    ap.add_argument("--ckpt-dir", default="", dest="ckpt_dir",
                    help="save a full system checkpoint at every check "
                         "(post-mortem: load the state preceding the "
                         "divergent chunk and dissect on host)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from laneslam.config import SlamConfig
    from laneslam.data.synthetic import make_loop_scene, render_scene_frame
    from laneslam.geometry.camera import Camera
    from laneslam.system import SlamSystem

    n = args.frames
    cfg = SlamConfig()
    cfg = cfg.override(frontend=dataclasses.replace(
        cfg.frontend, chunk_frames=args.chunk, kf_max_interval=args.chunk))
    scene = make_loop_scene(seed=0, num_frames=n, radius=6.0, room=18.0,
                            num_points=2400, num_lines=420, laps=args.laps)
    cam = Camera(fx=float(scene.cam.fx), fy=float(scene.cam.fy),
                 cx=float(scene.cam.cx), cy=float(scene.cam.cy),
                 width=scene.cam.width, height=scene.cam.height)
    cache = os.environ.get("LANESLAM_RENDER_CACHE", "")
    cp = os.path.join(cache, f"rehearsal_loop_{n}_{args.laps}.npy") if cache else ""
    if cp and os.path.exists(cp):
        frames = np.load(cp, mmap_mode="r")
        print(f"[dbg] cache hit {cp}", flush=True)
    else:
        t0 = time.perf_counter()
        frames = np.stack([render_scene_frame(scene, i) for i in range(n)])
        print(f"[dbg] rendered in {time.perf_counter()-t0:.0f}s", flush=True)
        if cp:
            np.save(cp, frames)

    s = SlamSystem(cfg, cam, enable_loop=not args.no_loop, enable_ba=True)
    s.defer_readback = True
    i = 0
    while not s.bootstrapped or i < 4:
        s.process_frame(frames[i])
        i += 1
    s.resync()
    chunk = args.chunk
    ci = 0
    stat_cursor = 0
    while i + chunk <= n and (args.stop_after <= 0 or ci < args.stop_after):
        s.process_chunk(frames[i:i + chunk])
        i += chunk
        ci += 1
        if ci % args.check_every == 0:
            s.flush_chunks()
            kfc = int(np.asarray(s.map.kf_count))
            kt = np.asarray(s.map.kf_T_wc[:kfc, :3, 3])
            finite = bool(np.all(np.isfinite(kt)))
            events = [
                (j, st) for j, st in enumerate(s.stats[stat_cursor:],
                                               start=stat_cursor)
                if "loop" in st or "reloc" in st
                or st.get("ba_costN", 0) > 1e5
            ]
            for j, st in events[-6:]:
                print(f"  stat[{j}]: {st}", flush=True)
            stat_cursor = len(s.stats)
            print(f"[dbg] chunk {ci} frame {i} kf {kfc} "
                  f"max|t| {np.abs(kt).max():.3f} finite={finite} "
                  f"loops={s.num_loops}", flush=True)
            if args.ckpt_dir:
                from laneslam.runtime.checkpoint import save_system_state

                os.makedirs(args.ckpt_dir, exist_ok=True)
                save_system_state(
                    os.path.join(args.ckpt_dir, f"chunk_{ci:04d}.ckpt"), s
                )
            if not finite:
                print("[dbg] DIVERGED — last stats above", flush=True)
                return 1
            s.resync()
    print("[dbg] completed without divergence", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
