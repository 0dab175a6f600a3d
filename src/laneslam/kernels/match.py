"""Fused descriptor matching kernel (SURVEY.md C4; BASELINE.json:5).

One Pallas program computes, entirely in VMEM:

  similarity GEMM (MXU)  ->  gate mask  ->  row top-2  ->  column argmax
  (mutual-nearest cross check)  ->  Lowe ratio test  ->  (idx, ok, sim)

The XLA path materializes the (Ka, Kb) similarity matrix in HBM and reads
it three times (top_k, argmax over rows, argmax over columns); the fused
kernel reads the descriptors once and never spills the matrix. Semantics
are bit-compatible with `features.match.match_descriptors`'s selection
logic (first-index tie-breaking matches XLA argmax/top_k).

All gathers are expressed as one-hot masked reductions — TPU Pallas has no
efficient arbitrary gather, but `sum(onehot * vec)` is a pure VPU reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def match_fits_vmem(a_shape, b_shape, budget_bytes: int = 12 * 2**20) -> bool:
    """True iff the single-program kernel's working set fits scoped VMEM.

    The kernel materializes the (Ka, Kb) similarity matrix plus the gate
    mask and several same-shape intermediates in VMEM (measured: the
    compiler's scoped allocation is ~2x sim+mask at Ka=Kb=2048, which
    blows the 16 MiB limit). Above the budget the caller must use the
    XLA path — at those sizes the GEMM is HBM-streaming anyway and XLA's
    tiled emission is at parity (benchmarks/bench_match.py).
    """
    Ka, D = a_shape
    Kb = b_shape[0]
    matrix = Ka * Kb * 4
    inputs = (Ka + Kb) * D * 4
    return 2.5 * matrix + inputs < budget_bytes


def _match_kernel(ratio, min_similarity, cross_check, a_ref, b_ref, mask_ref,
                  idx_ref, sim_ref, ok_ref):
    neg = jnp.float32(-1e9)
    sim = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Ka, Kb)
    simm = jnp.where(mask_ref[:] > 0, sim, neg)
    Ka, Kb = simm.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (Ka, Kb), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Ka, Kb), 0)

    best = jnp.max(simm, axis=1)  # (Ka,)
    # First-index argmax (ties resolve like XLA argmax).
    bidx = jnp.min(jnp.where(simm >= best[:, None], col, Kb), axis=1)
    at_best = col == bidx[:, None]  # one-hot row selection
    second = jnp.max(jnp.where(at_best, neg, simm), axis=1)

    # Lowe ratio on distances of unit-norm descriptors: d^2 = 2 - 2 sim.
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 1e-12))
    thresh = max(float(min_similarity), -5e8)
    ok = (best > thresh) & (d1 < ratio * d2)

    if cross_check:
        colmax = jnp.max(simm, axis=0)  # (Kb,)
        rev = jnp.min(jnp.where(simm >= colmax[None, :], row, Ka), axis=0)
        # Gather rev at bidx via the one-hot trick.
        rev_at_bidx = jnp.sum(jnp.where(at_best, rev[None, :], 0), axis=1)
        my_row = jax.lax.broadcasted_iota(jnp.int32, (Ka, 1), 0)[:, 0]
        ok = ok & (rev_at_bidx == my_row)

    idx_ref[:] = jnp.where(ok, bidx, -1)
    sim_ref[:] = jnp.where(ok, best, 0.0)
    ok_ref[:] = ok.astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("ratio", "min_similarity", "cross_check", "interpret"),
)
def match_topk_pallas(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    mask: jnp.ndarray,
    ratio: float = 0.85,
    min_similarity: float = -jnp.inf,
    cross_check: bool = True,
    interpret: bool = False,
):
    """Fused matcher. mask: (Ka, Kb) bool. Returns (idx, ok, sim) per A slot."""
    Ka = desc_a.shape[0]
    kern = partial(
        _match_kernel, float(ratio), float(min_similarity), bool(cross_check)
    )
    idx, sim, ok = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Ka,), jnp.int32),
            jax.ShapeDtypeStruct((Ka,), jnp.float32),
            jax.ShapeDtypeStruct((Ka,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        desc_a.astype(jnp.float32),
        desc_b.astype(jnp.float32),
        mask.astype(jnp.float32),
    )
    return idx, ok.astype(bool), sim
