"""Thin named collective wrappers (SURVEY.md §2.3 L7, §4.2 fake-pod).

Every cross-device exchange in the framework goes through this module so
that (a) the communication vocabulary of the build is auditable in one
place — `psum` / `all_gather` / `ppermute` rings / `all_to_all` are the
XLA collectives BASELINE.json:5 mandates in place of the reference
family's (nonexistent) NCCL/MPI backend — and (b) the same kernel code
runs unchanged on a 1-device mesh, the 8-virtual-device CPU mesh used by
tests/dist/, and a real multi-host pod slice, where the axis sizes make
each wrapper degenerate to identity or a local reduce automatically.

All wrappers must be called inside `shard_map` (or `vmap` with a bound
axis name); they are pure forwarding plus the small derived patterns the
build reuses (ring shifts, halo exchange, streaming top-k merge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_size(axis: str) -> int:
    """Size of a bound mesh axis (static under shard_map)."""
    return jax.lax.axis_size(axis)


def axis_index(axis: str):
    """This device's coordinate along a bound mesh axis."""
    return jax.lax.axis_index(axis)


def psum(x, axis: str):
    """Sum across a mesh axis (ICI/DCN chosen by mesh layout, not code)."""
    return jax.lax.psum(x, axis)


def pmean(x, axis: str):
    return jax.lax.pmean(x, axis)


def pmax(x, axis: str):
    return jax.lax.pmax(x, axis)


def all_gather(x, axis: str, *, tiled: bool = False):
    """Gather shards along a mesh axis; tiled=True concatenates on axis 0."""
    return jax.lax.all_gather(x, axis, tiled=tiled)


def all_to_all(x, axis: str, *, split_axis: int, concat_axis: int):
    """The P6 (Ulysses-analogue) layout flip primitive."""
    return jax.lax.all_to_all(x, axis, split_axis=split_axis,
                              concat_axis=concat_axis)


def ring_perm(axis: str, shift: int = 1):
    """Permutation list sending device i -> i+shift (mod n) along `axis`."""
    n = jax.lax.axis_size(axis)
    return [(i, (i + shift) % n) for i in range(n)]


def ppermute_shift(x, axis: str, shift: int = 1):
    """Rotate shards around the ring by `shift` hops (P5 schedule hop)."""
    return jax.lax.ppermute(x, axis, ring_perm(axis, shift))


def halo_exchange(left_edge, right_edge, axis: str):
    """Exchange boundary values with ring neighbors (P4 trajectory PGO).

    Each device offers its own `left_edge` / `right_edge` (e.g. boundary
    keyframe poses of its contiguous trajectory span) and receives
    `(from_left, from_right)`: the right edge of the left neighbor and
    the left edge of the right neighbor. Wrap-around pairs are the
    caller's job to mask (a trajectory is a chain, not a ring).
    """
    from_left = ppermute_shift(right_edge, axis, shift=1)
    from_right = ppermute_shift(left_edge, axis, shift=-1)
    return from_left, from_right


def topk_merge(best_sim, best_idx, new_sim, new_idx, k: int):
    """Merge a running per-row top-k with new candidates (P5 streaming).

    best_sim/best_idx: (Q, k); new_sim/new_idx: (Q, c). Returns updated
    (Q, k) pair. Pure local compute — lives here because it is the
    accumulation half of the ring-retrieval schedule.
    """
    all_sim = jnp.concatenate([best_sim, new_sim], axis=1)
    all_idx = jnp.concatenate([best_idx, new_idx], axis=1)
    top_sim, sel = jax.lax.top_k(all_sim, k)
    return top_sim, jnp.take_along_axis(all_idx, sel, axis=1)
