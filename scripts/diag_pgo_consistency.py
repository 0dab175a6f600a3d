#!/usr/bin/env python
"""Post-mortem of a Sim(3)-PGO event from debug_blowup checkpoints.

For each keyframe: mean reprojection error of its stored point observations
against the current map (the internal consistency the tracker's PnP and the
window BA depend on). Comparing the checkpoint before a loop-closure chunk
with the one after isolates what the in-chunk PGO + correction application
did to map consistency.

    python scripts/diag_pgo_consistency.py /tmp/ckpts_sim3/chunk_0019.ckpt \
        /tmp/ckpts_sim3/chunk_0020.ckpt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def per_kf_consistency(m, cam):
    import jax.numpy as jnp

    from laneslam.geometry import se3
    from laneslam.geometry.camera import project_points

    K = m.kf_T_wc.shape[0]
    T_cw = se3.inverse(m.kf_T_wc)  # (K,4,4)
    idx = m.obs_pt_idx  # (K, Op)
    valid = (idx >= 0) & m.pt_valid[jnp.maximum(idx, 0)] & m.kf_valid[:, None]
    X = m.pt_xyz[jnp.maximum(idx, 0)]  # (K, Op, 3)
    Xc = se3.transform_points(T_cw[:, None], X)
    uv, z = project_points(cam, Xc.reshape(-1, 3))
    uv = uv.reshape(K, -1, 2)
    z = z.reshape(K, -1)
    ok = valid & (z > 1e-3)
    err = jnp.linalg.norm(uv - m.obs_pt_uv, axis=-1)
    err = jnp.where(ok, err, 0.0)
    n = jnp.maximum(jnp.sum(ok, axis=-1), 1)
    return np.asarray(jnp.sum(err, axis=-1) / n), np.asarray(jnp.sum(ok, axis=-1))


def main() -> int:
    from laneslam.config import SlamConfig
    from laneslam.geometry.camera import Camera
    from laneslam.runtime.checkpoint import load_map_state

    cfg = SlamConfig()
    # The rehearsal/debug fixture camera (synthetic.py defaults).
    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)

    for path in sys.argv[1:]:
        m, es, extra = load_map_state(path)
        kfc = int(np.asarray(m.kf_count))
        err, n = per_kf_consistency(m, cam)
        print(f"== {os.path.basename(path)}  kf={kfc} "
              f"edges={int(np.asarray(es.count))}")
        row = " ".join(
            f"{k}:{err[k]:.1f}px/{n[k]}" for k in range(kfc)
        )
        print("   " + row)
        t = np.asarray(m.kf_T_wc[:kfc, :3, 3])
        print(f"   max|t|={np.abs(t).max():.2f}  "
              f"mean kf err={err[:kfc].mean():.2f}px")
        if es is not None:
            ei = np.asarray(es.edge_i)[: int(np.asarray(es.count))]
            ej = np.asarray(es.edge_j)[: int(np.asarray(es.count))]
            s = np.asarray(es.edge_s)[: int(np.asarray(es.count))]
            nz = [
                (int(a), int(b), float(x))
                for a, b, x in zip(ei, ej, s)
                if abs(x - 1.0) > 1e-3
            ]
            print(f"   edges with scale != 1: {nz}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
