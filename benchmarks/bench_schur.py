#!/usr/bin/env python
"""Schur-reduce kernel roofline benchmark (SURVEY.md §4.1 perf tier).

Measures the per-call latency of the landmark-block Schur reduction —
the inner kernel of the BA-iters/s judged metric (BASELINE.json:2) — for
the Pallas kernel, the closed-form XLA path, and the jnp.linalg.inv (LU)
path XLA would emit naively. Also reports effective HBM bandwidth on the
dominant B-array read against the v5e roofline (~820 GB/s).

Measured 2026-08-18 on TPU v5e (this repo, post-equilibration):
    d=3 N=2048: pallas 161us  xla_closed 150us  linalg_inv 1912us
    d=3 N=8192: pallas 138us  xla_closed 160us  linalg_inv 7203us
    d=4 N=2048: pallas 124us  xla_closed 130us  linalg_inv 2439us
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from laneslam.kernels.schur import schur_reduce_pallas, schur_reduce_xla

    ITERS = 200

    def bench(fn, Hd, g, B):
        def body(carry, _):
            Hinv, S, gr = fn(Hd + 1e-6 * carry, g, B)
            return S[0, 0], None

        f = jax.jit(
            lambda: jax.lax.scan(body, jnp.float32(0), None, length=ITERS)[0]
        )
        f().block_until_ready()
        t0 = time.perf_counter()
        f().block_until_ready()
        return (time.perf_counter() - t0) / ITERS

    def legacy(Hd, g, B):
        Hinv = jnp.linalg.inv(Hd)
        C = jnp.einsum("nwd,nde->nwe", B, Hinv)
        return Hinv, jnp.einsum("nwe,nve->wv", C, B), jnp.einsum("nwe,ne->w", C, g)

    key = jax.random.PRNGKey(0)
    rows = []
    for d, N in ((3, 2048), (3, 8192), (4, 2048), (4, 8192)):
        k1, k2, k3, key = jax.random.split(key, 4)
        W6 = 48
        J = jax.random.normal(k1, (N, 8, d))
        Hd = jnp.einsum("nia,nib->nab", J, J) + 1e-2 * jnp.eye(d)
        g = jax.random.normal(k2, (N, d))
        B = jax.random.normal(k3, (N, W6, d))
        row = {"d": d, "N": N}
        for name, fn in (
            ("pallas", schur_reduce_pallas),
            ("xla_closed", schur_reduce_xla),
            ("linalg_inv", legacy),
        ):
            dt = bench(fn, Hd, g, B)
            row[f"{name}_us"] = round(dt * 1e6, 1)
        # Bandwidth on the dominant stream (read B + write Hinv).
        bytes_moved = N * (W6 * d + 2 * d * d) * 4
        best = min(row["pallas_us"], row["xla_closed_us"]) * 1e-6
        row["best_gbps"] = round(bytes_moved / best / 1e9, 1)
        rows.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
