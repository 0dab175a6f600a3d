#!/usr/bin/env python
"""Config 4 (BASELINE.json:10): stereo point+line SLAM with joint BA.

  python scripts/run_stereo.py --dataset synthetic --frames 30 --backend cpu
  python scripts/run_stereo.py --dataset euroc --root $LANESLAM_DATA_DIR/MH_01
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "synthetic_loop", "kitti", "euroc"])
    ap.add_argument("--root", default=os.environ.get("LANESLAM_DATA_DIR", ""))
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--backend", default="auto", choices=["auto", "cpu", "tpu"])
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from laneslam.api import run_stereo
    from laneslam.config import DataConfig, SlamConfig

    cfg = SlamConfig(
        data=DataConfig(
            dataset=args.dataset, root=args.root,
            sequence=args.sequence, max_frames=args.frames, stereo=True,
        )
    )
    print(f"[run_stereo] backend={jax.default_backend()} dataset={args.dataset}")
    result = run_stereo(cfg, enable_loop=not args.no_loop, enable_ba=not args.no_ba)
    if args.out:
        from laneslam.eval.writers import write_kitti_trajectory

        write_kitti_trajectory(args.out, result.poses)
    d = result.diagnostics
    print(
        f"RESULT ate_rmse={result.ate_rmse} fps={result.frames_per_sec:.2f} "
        f"kf={d['num_keyframes']} pts={d['num_points']} lines={d['num_lines']} "
        f"loops={d['num_loops']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
