"""Fused LBD band-reduction kernel (SURVEY.md C2, L1 `lbd_describe`).

The LBD descriptor pipeline (features/lbd.py) has two halves:

  1. *Sampling*: bilinear gather of image gradients on each segment's
     rotated Line Support Region grid, reduced along the sample axis to
     per-row 4-vectors `rowvec` (K, M, 4). Arbitrary-index gather is XLA
     territory on TPU (there is no per-lane vector gather for Pallas to
     beat), so this half stays in XLA for both paths.
  2. *Band reduction*: two weighted contractions over rows (mean and
     second moment per band), variance, sqrt, per-half L2 normalization,
     SIFT-style clipping, renormalization, and invalid-slot masking.
     The XLA path runs this as two einsums plus a chain of elementwise
     ops with `rowvec` and both (K, m, 4) moments round-tripping through
     HBM; this kernel fuses the whole chain so `rowvec` is read once and
     only the final (K, 8m) descriptor is written.

Single-GEMM formulation: with `rowvec` flattened to (K, 4M) in M-major /
feature-minor column order, both band contractions become one MXU matmul
against a constant block-structured weight

    Wbig[M*4 + f, b*4 + f'] = Wb[b, M] * (f == f')

of shape (4M, 4m), so band means for all four gradient-projection
features come out as one (K, 4m) product with segment slots staying on
sublanes — no in-kernel transposes at all.

Numerics are bit-compatible with the XLA path up to reassociation of the
two contractions (tests/kernels/test_lbd_kernel.py asserts 1e-5 parity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expand_band_weights(Wb: jnp.ndarray) -> jnp.ndarray:
    """(m, M) band-weight matrix -> (4M, 4m) block-diagonal-per-feature."""
    m, M = Wb.shape
    eye4 = jnp.eye(4, dtype=Wb.dtype)
    # Wbig[M, f, b, f'] = Wb[b, M] * eye4[f, f']
    big = Wb.T[:, None, :, None] * eye4[None, :, None, :]
    return big.reshape(4 * M, 4 * m)


def _descriptor_tail(mean, std, valid_f, clip: float):
    """Shared tail: [norm(mean) | norm(std)] -> clip -> renorm -> mask.

    mean/std: (K, 4m); valid_f: (K, 1) float {0,1}. Returns (K, 8m).
    """

    def _norm(x):
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return x / jnp.maximum(n, 1e-12)

    mean_n = jnp.clip(_norm(mean), -clip, clip)
    std_n = jnp.clip(_norm(std), -clip, clip)
    return jnp.concatenate([_norm(mean_n), _norm(std_n)], axis=-1) * valid_f


def lbd_reduce_xla(rowvec: jnp.ndarray, Wb: jnp.ndarray, valid: jnp.ndarray,
                   clip: float = 0.4) -> jnp.ndarray:
    """Reference band reduction. rowvec (K, M, 4), Wb (m, M), valid (K,).

    Returns descriptors (K, 8m) float32 (zero rows for invalid slots).
    """
    K = rowvec.shape[0]
    m = Wb.shape[0]
    flat = rowvec.reshape(K, -1)  # (K, 4M), M-major / f-minor
    Wbig = _expand_band_weights(Wb)
    mean = flat @ Wbig  # (K, 4m), b-major / f-minor
    ex2 = (flat * flat) @ Wbig
    std = jnp.sqrt(jnp.maximum(ex2 - mean * mean, 0.0))
    return _descriptor_tail(mean, std, valid.astype(flat.dtype)[:, None], clip)


def _lbd_kernel(clip, rv_ref, w_ref, valid_ref, out_ref):
    flat = rv_ref[:]
    w = w_ref[:]
    mean = jax.lax.dot_general(
        flat, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ex2 = jax.lax.dot_general(
        flat * flat, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    std = jnp.sqrt(jnp.maximum(ex2 - mean * mean, 0.0))
    out_ref[:] = _descriptor_tail(mean, std, valid_ref[:], clip)


@partial(jax.jit, static_argnames=("clip", "interpret"))
def lbd_reduce_pallas(rowvec: jnp.ndarray, Wb: jnp.ndarray, valid: jnp.ndarray,
                      clip: float = 0.4, interpret: bool = False) -> jnp.ndarray:
    """Same contract as `lbd_reduce_xla`, fused in one VMEM-resident pass."""
    K, M, _ = rowvec.shape
    m = Wb.shape[0]
    flat = rowvec.reshape(K, 4 * M).astype(jnp.float32)
    Wbig = _expand_band_weights(Wb.astype(jnp.float32))
    valid_f = valid.astype(jnp.float32)[:, None]  # (K, 1)
    return pl.pallas_call(
        partial(_lbd_kernel, float(clip)),
        out_shape=jax.ShapeDtypeStruct((K, 8 * m), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, Wbig, valid_f)


def lbd_reduce(rowvec: jnp.ndarray, Wb: jnp.ndarray, valid: jnp.ndarray,
               clip: float = 0.4) -> jnp.ndarray:
    """Dispatching entry (LANESLAM_KERNELS, like match/schur/lsd_sweep)."""
    from laneslam import kernels

    if kernels.use_pallas():
        return lbd_reduce_pallas(rowvec, Wb, valid, clip,
                                 interpret=kernels.interpret())
    return lbd_reduce_xla(rowvec, Wb, valid, clip)
