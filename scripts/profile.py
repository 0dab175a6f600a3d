#!/usr/bin/env python
"""Wrap any judged config in a jax.profiler trace (SURVEY.md §5.1).

Writes a TensorBoard-viewable trace (trace viewer: MXU utilization per
named phase — kernels are annotated with jax.named_scope).

    python scripts/profile.py --what frontend --out /tmp/laneslam-trace
    python scripts/profile.py --what ba --out /tmp/laneslam-trace
    tensorboard --logdir /tmp/laneslam-trace
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def profile_frontend(iters: int) -> None:
    import jax
    import jax.numpy as jnp

    from laneslam.config import SlamConfig
    from laneslam.data.synthetic import make_corridor_scene, render_scene_frame
    from laneslam.frontend.extract import extract_features
    from laneslam.frontend.odometry import _pair_step
    from laneslam.geometry.camera import Camera

    cfg = SlamConfig()
    scene = make_corridor_scene(seed=0, num_frames=8)
    cam = Camera(fx=float(scene.cam.fx), fy=float(scene.cam.fy),
                 cx=float(scene.cam.cx), cy=float(scene.cam.cy),
                 width=scene.cam.width, height=scene.cam.height)
    imgs = [jnp.asarray(render_scene_frame(scene, i), jnp.float32) for i in range(8)]
    key = jax.random.PRNGKey(0)
    prev = extract_features(imgs[0], cfg)
    cur = extract_features(imgs[1], cfg)
    jax.block_until_ready(_pair_step(prev, cur, key, cfg, cam)[0])  # compile
    for i in range(iters):
        with jax.profiler.StepTraceAnnotation("frontend", step_num=i):
            cur = extract_features(imgs[2 + (i % 6)], cfg)
            out = _pair_step(prev, cur, key, cfg, cam)
            prev = cur
    jax.block_until_ready(out[0])


def profile_ba(iters: int) -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from backend.test_ba import CAM, make_problem, perturb

    from laneslam.backend.ba import ba_solve
    from laneslam.config import BaConfig

    prob, _ = make_problem(jax.random.PRNGKey(0), W=8, Np=512, Nl=128)
    pert = perturb(prob, jax.random.PRNGKey(1), num_fixed=2)
    cfg = BaConfig(gn_iters=10, damping=1e-4)
    out, info = ba_solve(pert, CAM, cfg, num_fixed_poses=2)  # compile
    jax.block_until_ready(info.cost)
    for i in range(iters):
        with jax.profiler.StepTraceAnnotation("ba_solve", step_num=i):
            out, info = ba_solve(pert, CAM, cfg, num_fixed_poses=2)
    jax.block_until_ready(info.cost)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", default="frontend", choices=["frontend", "ba"])
    ap.add_argument("--out", default="/tmp/laneslam-trace")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--backend", default="", help="'cpu' to force CPU")
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        {"frontend": profile_frontend, "ba": profile_ba}[args.what](args.iters)
    dt = time.perf_counter() - t0
    print(f"RESULT trace={args.out} what={args.what} iters={args.iters} wall_s={dt:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
