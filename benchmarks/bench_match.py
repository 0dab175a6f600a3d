#!/usr/bin/env python
"""Fused matcher benchmark: Pallas kernel vs XLA path + MXU utilization.

BASELINE.json:5: "line matching runs as a dense descriptor-distance GEMM
with geometric gating on-chip". The GEMM is (Ka, D) x (D, Kb); at the
frontend's sizes this is latency- not FLOP-bound, so the relevant number
is end-to-end selection latency, reported alongside GEMM TFLOP/s vs the
v5e MXU peak (197 TFLOP/s bf16 / ~half that for f32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from laneslam.features.match import match_descriptors
    from laneslam.kernels.match import match_fits_vmem, match_topk_pallas

    ITERS = 200
    key = jax.random.PRNGKey(0)
    for Ka, Kb, D in ((256, 256, 72), (512, 512, 256), (2048, 2048, 256)):
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.normal(k1, (Ka, D))
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = jax.random.normal(k2, (Kb, D))
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        va = jnp.ones((Ka,), bool)
        vb = jnp.ones((Kb,), bool)
        gate = jax.random.uniform(k3, (Ka, Kb)) < 0.9
        mask = va[:, None] & vb[None, :] & gate

        def bench(f):
            def body(carry, _):
                out = f(a + 1e-6 * carry, b)
                return out[0].astype(jnp.float32).sum() * 0 + carry, None

            g = jax.jit(
                lambda: jax.lax.scan(body, jnp.float32(0), None, length=ITERS)[0]
            )
            g().block_until_ready()
            t0 = time.perf_counter()
            g().block_until_ready()
            return (time.perf_counter() - t0) / ITERS

        # The fused kernel is single-program VMEM-resident; above the VMEM
        # budget the production dispatcher takes the XLA path (see
        # kernels/match.py: match_fits_vmem), so benchmark what ships.
        fits = match_fits_vmem(a.shape, b.shape)
        t_pal = (
            bench(lambda x, y: match_topk_pallas(x, y, mask, ratio=0.9))
            if fits else None
        )
        t_xla = bench(
            lambda x, y: match_descriptors(x, y, va, vb, gate=gate, ratio=0.9)
        )
        flops = 2 * Ka * Kb * D
        best = t_pal if (t_pal is not None and t_pal < t_xla) else t_xla
        print(
            json.dumps(
                {
                    "Ka": Ka, "Kb": Kb, "D": D,
                    "pallas_us": None if t_pal is None else round(t_pal * 1e6, 1),
                    "xla_us": round(t_xla * 1e6, 1),
                    "best_gemm_tflops": round(flops / best / 1e12, 2),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
