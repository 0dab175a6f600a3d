"""LSD label-propagation sweep kernel (SURVEY.md C1, §7.3.1).

The region-growing step of the LSD detector is reformulated as bounded-
iteration connected-component labeling: max-label propagation over the
8-neighborhood restricted to angle-compatible neighbors (features/lsd.py).
The XLA path materializes 8 rolled copies of the label image in HBM per
sweep; this kernel keeps the labels and the connectivity plane in VMEM for
all `local_sweeps` sweeps of one outer iteration — zero HBM traffic
between sweeps.

Connectivity is computed ONCE per image (it never changes across sweeps or
outer iterations) by `conn_bits`: direction k of the 8-neighborhood is bit
k of an (H, W) int32 plane, so the kernel's VMEM footprint is 3 int32
planes (labels in/out + bits) regardless of sweep count. Angle
compatibility |wrap(a - nb)| < tol is evaluated as cos(a-nb) > cos(tol) on
(cos a, sin a) planes — no transcendentals anywhere on the hot path.

Shifts use `pltpu.roll` (circular, shift >= 0, >= 32-bit lanes only) with
border validity folded into the bits — the same fill semantics as
features/lsd.py::_shift2.

The pointer-jumping step (labels <- labels.flat[labels], an arbitrary
gather) stays in XLA between kernel calls: TPU Pallas has no efficient
arbitrary gather, and one gather per outer iteration is cheap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEIGHBORS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _border_ok(H, W, dy, dx):
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = jnp.ones((H, W), jnp.bool_)
    if dy > 0:
        ok &= yy >= dy
    if dy < 0:
        ok &= yy < H + dy
    if dx > 0:
        ok &= xx >= dx
    if dx < 0:
        ok &= xx < W + dx
    return ok


def conn_bits(mask: jnp.ndarray, angle: jnp.ndarray, tol_rad: float) -> jnp.ndarray:
    """(H, W) int32: bit k set iff neighbor k is angle-compatible + in-mask.

    Pure XLA — runs once per image, shared by the Pallas and XLA sweeps.
    """
    H, W = mask.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    cos_tol = jnp.cos(tol_rad)
    bits = jnp.zeros((H, W), jnp.int32)
    for k, (dy, dx) in enumerate(_NEIGHBORS):
        ok = _border_ok(H, W, dy, dx)
        nb_mask = jnp.where(ok, jnp.roll(jnp.roll(mask, dy, 0), dx, 1), False)
        nb_ca = jnp.roll(jnp.roll(ca, dy, 0), dx, 1)
        nb_sa = jnp.roll(jnp.roll(sa, dy, 0), dx, 1)
        close = ca * nb_ca + sa * nb_sa > cos_tol
        bits = bits | ((mask & nb_mask & close & ok).astype(jnp.int32) << k)
    return bits


def _roll2(x, dy, dx):
    out = x
    if dy:
        out = pltpu.roll(out, dy % x.shape[0], axis=0)  # roll needs shift >= 0
    if dx:
        out = pltpu.roll(out, dx % x.shape[1], axis=1)
    return out


def _sweep_kernel(n_sweeps, labels_ref, bits_ref, out_ref):
    bits = bits_ref[:]

    def sweep(_, labels):
        # Hoist the 2 expensive lane (x-axis) rotates; the 8 neighbor views
        # are then cheap sublane (y-axis) rotates of {x-1, x, x+1}.
        by_dx = {
            -1: _roll2(labels, 0, -1),
            0: labels,
            1: _roll2(labels, 0, 1),
        }
        best = labels
        for k, (dy, dx) in enumerate(_NEIGHBORS):
            nb = _roll2(by_dx[dx], dy, 0)
            best = jnp.maximum(best, jnp.where((bits >> k) & 1 > 0, nb, -1))
        return best

    out_ref[:] = jax.lax.fori_loop(0, n_sweeps, sweep, labels_ref[:])


@partial(jax.jit, static_argnames=("n_sweeps", "interpret"))
def lsd_sweep_pallas(labels, bits, n_sweeps, interpret: bool = False):
    """n_sweeps max-label propagation sweeps entirely in VMEM.

    labels: (H, W) int32 (-1 outside mask); bits: from `conn_bits`.
    """
    H, W = labels.shape
    return pl.pallas_call(
        partial(_sweep_kernel, n_sweeps),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(labels.astype(jnp.int32), bits)


def lsd_sweep_xla(labels, bits, n_sweeps):
    """Pure-XLA reference with identical semantics (also the CPU path)."""

    def sweep(_, labels):
        by_dx = {d: jnp.roll(labels, d, 1) for d in (-1, 0, 1)}
        best = labels
        for k, (dy, dx) in enumerate(_NEIGHBORS):
            nb = jnp.roll(by_dx[dx], dy, 0)
            best = jnp.maximum(best, jnp.where((bits >> k) & 1 > 0, nb, -1))
        return best

    return jax.lax.fori_loop(0, n_sweeps, sweep, labels)
