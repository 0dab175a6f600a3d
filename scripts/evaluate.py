#!/usr/bin/env python
"""Evaluate a trajectory file against ground truth (SURVEY.md L11, C19).

Prints the judged metric tuple (BASELINE.json:2): ATE RMSE after Umeyama
alignment (Sim(3) for monocular, SE(3) with --no-scale), plus RPE.

    python scripts/evaluate.py est.txt gt.txt [--format kitti|tum] [--plot out.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def load_trajectory(path: str, fmt: str) -> np.ndarray:
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    if fmt == "kitti" or (fmt == "auto" and rows.shape[1] == 12):
        T = np.tile(np.eye(4), (rows.shape[0], 1, 1))
        T[:, :3, :] = rows.reshape(-1, 3, 4)
        return T
    # TUM: t x y z qx qy qz qw
    t = rows[:, 1:4]
    q = rows[:, 4:8]  # xyzw
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    T = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    return T


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("est", help="estimated trajectory file")
    ap.add_argument("gt", help="ground-truth trajectory file")
    ap.add_argument("--format", default="auto", choices=["auto", "kitti", "tum"])
    ap.add_argument("--no-scale", action="store_true",
                    help="SE(3) alignment (stereo/metric) instead of Sim(3)")
    ap.add_argument("--rpe-delta", type=int, default=1)
    ap.add_argument("--plot", default="", help="write trajectory plot PNG")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from laneslam.eval.ate import ate_rmse, rpe

    est = load_trajectory(args.est, args.format)
    gt = load_trajectory(args.gt, args.format)
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]

    rmse, err = ate_rmse(
        jnp.asarray(est), jnp.asarray(gt), align_scale=not args.no_scale
    )
    t_rmse, r_rmse = rpe(jnp.asarray(est), jnp.asarray(gt), delta=args.rpe_delta)
    if args.plot:
        from laneslam.eval.viz import plot_trajectory

        plot_trajectory(args.plot, est, gt, title=f"ATE RMSE {float(rmse):.4f} m")
        print(f"[evaluate] wrote {args.plot}")
    print(
        f"RESULT ate_rmse={float(rmse):.6f} rpe_trans={float(t_rmse):.6f} "
        f"rpe_rot_deg={float(r_rmse) * 180.0 / np.pi:.6f} frames={n} "
        f"align={'sim3' if not args.no_scale else 'se3'}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
