#!/usr/bin/env python
"""Weak-scaling proxy on the fake CPU mesh (VERDICT r3 #8; BASELINE.json:5
">= 0.7 scaling efficiency" — real multi-chip is unavailable on this 1-chip
box, so this measures the SPMD programs on N virtual host devices).

Per-shard work is held FIXED while the device count grows (weak scaling):
  - sharded BA GN step (P2): 512 point + 128 line landmark blocks per shard
  - sharded PGO solve (P4): 32 pose-chain nodes per shard, halo variant

Caveat printed in the output: the host has 2 physical cores, so virtual
devices beyond 2 SERIALIZE their compute — step times at n=4/8 measure core
oversubscription, not interconnect. The honest efficiency figure on this
machine is the 1 -> 2 device one (matching physical cores); n=4/8 rows are
reported as lower bounds only.

Prints ONE JSON line. Run standalone or via bench.py (subprocess with
JAX_PLATFORMS=cpu).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_HERE, "..", "src"))


def _time(fn, reps=5):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from laneslam.testing import (
        TEST_CAM as CAM, chain_with_loops as _chain_with_loops,
        make_ba_problem as make_problem, perturb_ba_problem as perturb,
    )
    from laneslam.config import BaConfig, PgoConfig
    from laneslam.dist.ba_tp import ba_gn_step_sharded, shard_problem
    from laneslam.dist.mesh import make_mesh
    from laneslam.dist.pgo_sp import pgo_solve_sharded_halo

    ba_rows = []
    pgo_rows = []
    for n in (1, 2, 4, 8):
        devs = jax.devices()[:n]
        # --- P2: landmark-block-sharded BA GN step, fixed work per shard.
        mesh_b = make_mesh(devs, frame=1, block=n)
        prob = jax.jit(
            lambda k, n=n: make_problem(k, W=8, Np=512 * n, Nl=128 * n)[0]
        )(jax.random.PRNGKey(0))
        pert = jax.jit(perturb)(prob, jax.random.PRNGKey(1))
        sp = shard_problem(pert, n)

        def ba_step(sp=sp, mesh_b=mesh_b):
            out, cost, _ = ba_gn_step_sharded(
                sp, jnp.asarray(1e-4, jnp.float32), CAM, mesh_b,
                BaConfig(gn_iters=1), num_fixed_poses=2,
            )
            return cost

        ba_rows.append(round(_time(ba_step) * 1e3, 2))

        # --- P4: trajectory-sharded halo PGO, fixed nodes per shard.
        mesh_f = make_mesh(devs, frame=n, block=1)
        N = 32 * n
        pgo_prob = _chain_with_loops(N, 40 * n, loops=((0, None),))

        def pgo_step(pgo_prob=pgo_prob, mesh_f=mesh_f):
            out, costs, ok = pgo_solve_sharded_halo(
                pgo_prob, mesh_f, PgoConfig(gn_iters=2), cg_iters=20,
                interface_cap=8,
            )
            return costs

        pgo_rows.append(round(_time(pgo_step) * 1e3, 2))

    eff_ba = round(ba_rows[0] / max(ba_rows[1], 1e-9), 3)
    eff_pgo = round(pgo_rows[0] / max(pgo_rows[1], 1e-9), 3)
    print(json.dumps({
        "devices": [1, 2, 4, 8],
        "ba_gn_step_ms": ba_rows,
        "pgo_solve_ms": pgo_rows,
        "weak_scaling_efficiency_2dev": {"ba": eff_ba, "pgo": eff_pgo},
        "note": "8 virtual devices on 2 physical cores: n>2 rows measure "
                "core oversubscription; the 1->2 figure matches physical "
                "cores and is the honest proxy on this host",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
