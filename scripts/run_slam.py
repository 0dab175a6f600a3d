#!/usr/bin/env python
"""Configs 2/3 (BASELINE.json:8-9): keyframe SLAM with window BA, loop
closure + PGO.

  python scripts/run_slam.py --dataset synthetic --frames 30 --backend cpu
  python scripts/run_slam.py --dataset kitti --root $LANESLAM_DATA_DIR \
      --sequence 00
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic", choices=["synthetic", "synthetic_loop", "kitti", "euroc"])
    ap.add_argument("--root", default=os.environ.get("LANESLAM_DATA_DIR", ""))
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--backend", default="auto", choices=["auto", "cpu", "tpu"])
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--out", default="")
    ap.add_argument("--checkpoint", default="", help="checkpoint file path (SURVEY.md §5.4)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="write the checkpoint every N frames")
    ap.add_argument("--resume", action="store_true",
                    help="restore from --checkpoint and continue mid-sequence")
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from laneslam.api import run_slam
    from laneslam.config import DataConfig, SlamConfig

    cfg = SlamConfig(
        data=DataConfig(
            dataset=args.dataset, root=args.root,
            sequence=args.sequence, max_frames=args.frames,
        )
    )
    print(f"[run_slam] backend={jax.default_backend()} dataset={args.dataset}")
    result = run_slam(
        cfg, enable_loop=not args.no_loop, enable_ba=not args.no_ba,
        checkpoint_path=args.checkpoint or None,
        checkpoint_every=args.checkpoint_every, resume=args.resume,
    )
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
