#!/usr/bin/env python
"""BA iterations/s — the BASELINE.json:2 judged backend metric.

Times full LM iterations of the windowed point+line BA (linearize +
assemble + Schur reduce + dense camera solve + back-substitute + retract +
re-linearize for accept/reject) on realistic window sizes, entirely
on-device (the loop never leaves HBM, BASELINE.json:5). Problems come from
the convergence-tested synthetic generator (tests/backend/test_ba.py).
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_HERE, "..", "src"))
sys.path.insert(0, os.path.join(_HERE, "..", "tests"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from backend.test_ba import CAM, make_problem, perturb
    from laneslam.backend.ba import ba_solve
    from laneslam.config import BaConfig

    from functools import partial

    from laneslam.runtime import hostsync

    for W, Np, Nl in ((8, 512, 128), (8, 2048, 512), (8, 8192, 2048)):
        # Keys are re-created per size: the client reset below invalidates
        # every pre-reset device array.
        key = jax.random.PRNGKey(0)
        # Jit the generators: run op-by-op they pay one XLA compile per
        # primitive over the device tunnel (~60 s per problem).
        prob, _ = jax.jit(partial(make_problem, W=W, Np=Np, Nl=Nl))(key)
        pert = jax.jit(perturb)(prob, jax.random.PRNGKey(1))
        iters = 10
        cfg = BaConfig(gn_iters=iters, damping=1e-4)
        out, info = ba_solve(pert, CAM, cfg)
        jax.block_until_ready(out.T_cw)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out, _ = ba_solve(pert, CAM, cfg)
        jax.block_until_ready(out.T_cw)
        dt = (time.perf_counter() - t0) / reps
        # Host readbacks happen AFTER the timed loop: on the tunneled client
        # a single readback permanently degrades dispatch until a client
        # reset (runtime/hostsync.py) — the r3 numbers for the 2nd/3rd
        # problem sizes were measured in that degraded mode.
        cost0, costN = float(info.cost[0]), float(info.cost[-1])
        print(
            json.dumps(
                {
                    "window": W, "points": Np, "lines": Nl,
                    "obs": int(prob.pt_uv.shape[0] + prob.ln_seg.shape[0]),
                    "ba_iters_per_sec": round(iters / dt, 1),
                    "ms_per_iter": round(dt / iters * 1e3, 3),
                    "cost_drop": round(cost0 / max(costN, 1e-12), 1),
                }
            )
        )
        # Restore pipelined dispatch for the next size's timing.
        hostsync.reset_client(retain_executables=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
