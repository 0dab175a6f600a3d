#!/usr/bin/env python
"""Config 1 (BASELINE.json:7): monocular frame-to-frame odometry CLI.

Examples:
  python scripts/run_odometry.py --dataset synthetic --frames 30 --backend cpu
  python scripts/run_odometry.py --dataset kitti --root $LANESLAM_DATA_DIR/kitti \
      --sequence 00 --frames 500
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic", choices=["synthetic", "kitti", "euroc"])
    ap.add_argument("--root", default=os.environ.get("LANESLAM_DATA_DIR", ""))
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--backend", default="auto", choices=["auto", "cpu", "tpu"])
    ap.add_argument("--scale", default="auto", choices=["auto", "unit", "gt"])
    ap.add_argument("--out", default="", help="write KITTI-format trajectory here")
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from laneslam.config import DataConfig, SlamConfig
    from laneslam.api import run_odometry

    cfg = SlamConfig(
        data=DataConfig(
            dataset=args.dataset,
            root=args.root,
            sequence=args.sequence,
            max_frames=args.frames,
        )
    )
    print(f"[run_odometry] backend={jax.default_backend()} dataset={args.dataset}")
    result = run_odometry(cfg, scale_mode=args.scale)
    if args.out:
        from laneslam.eval.writers import write_kitti_trajectory

        write_kitti_trajectory(args.out, result.poses)
        print(f"[run_odometry] wrote {args.out}")
    print(
        f"RESULT ate_rmse={result.ate_rmse} fps={result.frames_per_sec:.2f} "
        f"frames={len(result.poses)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
