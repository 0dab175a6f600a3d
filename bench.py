#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Current headline: frontend frames/s per chip (full per-frame compute of
config 1 — LSD + LBD + points + GEMM match + essential RANSAC) on 640x480
frames, jitted on the attached accelerator.

vs_baseline: the reference family's frontend is OpenCV C++ single-core; the
LSD paper reports tens of ms per VGA frame for detection alone (BASELINE.md
§3), so the full reference frontend is ~15 fps. vs_baseline = value / 15.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from laneslam.config import SlamConfig
    from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
    from laneslam.frontend.extract import extract_features
    from laneslam.frontend.odometry import _scan_frames
    from laneslam.geometry.camera import Camera

    cfg = SlamConfig()
    scene = make_corridor_scene(seed=0, num_frames=8)
    cam = Camera(
        fx=float(scene.cam.fx), fy=float(scene.cam.fy),
        cx=float(scene.cam.cx), cy=float(scene.cam.cy),
        width=scene.cam.width, height=scene.cam.height,
    )
    imgs = [
        jnp.asarray(render_scene_frame(scene, i), jnp.float32) for i in range(8)
    ]
    imgs = [jax.device_put(im) for im in imgs]
    key = jax.random.PRNGKey(0)

    chunk = max(1, cfg.frontend.chunk_frames)
    img_chunk = jnp.stack([imgs[i % 8] for i in range(chunk)])

    # Warm up / compile.
    feats0 = extract_features(imgs[0], cfg)
    prev0, key, _ = _scan_frames(feats0, img_chunk, key, cfg, cam)
    jax.block_until_ready(prev0.point_desc)

    def run_loop(iters: int) -> float:
        """Per-frame work of config 1 through the production chunked-scan
        path (frontend.odometry._scan_frames): extract + match + RANSAC +
        key advance for chunk_frames frames per device dispatch."""
        nonlocal key
        prev = prev0
        t0 = time.perf_counter()
        for _ in range(0, iters, chunk):
            # prev/key thread through every chunk, so blocking on the last
            # chunk's outputs forces the whole chain.
            prev, key, (R, t, diag) = _scan_frames(prev, img_chunk, key, cfg, cam)
        jax.block_until_ready((R, t, diag.num_inliers))
        return iters / (time.perf_counter() - t0)

    # First pass pays one-time executable finalization / device warmup
    # (~8 ms/frame measured on the tunneled v5e chip, vs ~0.2 ms/frame
    # steady state); discard it and report steady-state throughput —
    # the MEDIAN of 3 runs (max would cherry-pick; VERDICT r3 weak #8).
    run_loop(48)
    fps = sorted(run_loop(400) for _ in range(3))[1]

    # Second headline (VERDICT r2 #2): FULL SLAM loop frames/s — tracking +
    # keyframing + window BA + cond-gated loop/PGO on the synthetic
    # corridor, through the readback-free chunked path (configs 2/3).
    # Median of 3 timed segments + min/max spread (VERDICT r4 weak #2: a
    # single-run number over-reported; the dispatch-rate variance is real
    # and belongs in the record).
    slam_med, slam_min, slam_max = _bench_slam(cfg, cam)

    print(
        json.dumps(
            {
                "metric": "frontend_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s (640x480, LSD+LBD+points+match+RANSAC)",
                "vs_baseline": round(fps / 15.0, 3),
                "extra": {
                    "slam_frames_per_sec_per_chip": round(slam_med, 3),
                    "slam_fps_spread": [round(slam_min, 3), round(slam_max, 3)],
                    "slam_unit": "frames/s (full track+BA+loop SlamSystem "
                                 "loop; median of 3 segments)",
                    "slam_vs_baseline": round(slam_med / 15.0, 3),
                    "scaling": _bench_scaling(),
                },
            }
        )
    )
    return 0


def _bench_scaling():
    """Fake-mesh weak-scaling proxy (VERDICT r3 #8): subprocess with
    JAX_PLATFORMS=cpu + 8 virtual devices (can't coexist with the TPU
    backend in this process). Returns the parsed JSON or None on failure."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "benchmarks", "bench_scaling.py")],
            env=env, capture_output=True, text=True, timeout=540,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.SubprocessError, ValueError, OSError):
        pass
    return None


def _bench_slam(cfg, cam):
    """Steady-state frames/s of the full SLAM loop (BA + loop on), through
    the chunked on-device path (SlamSystem.process_chunk: track + keyframe
    + window BA + cond-gated loop verify/PGO fused into one dispatch per
    chunk) in the deferred-readback throughput mode: the steady-state loop
    is readback-free (runtime/hostsync.py), outputs are flushed after the
    timed region. Returns (median, min, max) over 3 timed segments."""
    import time

    import jax
    import numpy as np

    from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
    from laneslam.system import SlamSystem

    n = 404
    chunk = max(cfg.frontend.chunk_frames, 1)
    scene = make_corridor_scene(seed=1, num_frames=n)
    frames = [np.asarray(render_scene_frame(scene, i)) for i in range(n)]
    sys_ = SlamSystem(cfg, cam, enable_loop=True, enable_ba=True)
    sys_.defer_readback = True
    i = 0
    while not sys_.bootstrapped or i < 4:
        sys_.process_frame(frames[i])  # bootstrap reads back scalars
        i += 1
    sys_.resync()  # restore pipelined dispatch before the readback-free loop
    warm_end = i + 2 * chunk
    while i < warm_end:  # compile + warm the fused chunk program
        sys_.process_chunk(np.stack(frames[i:i + chunk]))
        i += chunk
    jax.block_until_ready(sys_.T_cur)  # exclude warmup compute from timing
    # 3 timed segments over the remaining chunks -> median + spread.
    remaining = (n - i) // chunk
    seg_chunks = max(remaining // 3, 1)
    rates = []
    for _seg in range(3):
        t0 = time.perf_counter()
        done = 0
        for _c in range(seg_chunks):
            if i + chunk > n:
                break
            sys_.process_chunk(np.stack(frames[i:i + chunk]))
            i += chunk
            done += chunk
        jax.block_until_ready(sys_.T_cur)  # force the dispatched chain
        if done:
            rates.append(done / (time.perf_counter() - t0))
    sys_.flush_chunks()  # outside the timed region; validates the outputs
    assert np.all(np.isfinite(sys_.trajectory()))
    rates = sorted(rates)
    return rates[len(rates) // 2], rates[0], rates[-1]


if __name__ == "__main__":
    raise SystemExit(main())
