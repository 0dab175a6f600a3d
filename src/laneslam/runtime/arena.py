"""Static-shape slot arena allocator (SURVEY.md §1 L0 runtime).

Every dynamic collection in the framework (landmarks, keyframes, edges)
lives in fixed-capacity SoA arrays with a validity mask — the TPU-native
answer to the reference family's growable Python lists (SURVEY.md §7.3.2).
This module is the allocator for those arrays: pure, jit-compatible
functions over the validity mask itself, so the "free list" is implicit
(free slot == invalid slot) and allocation state needs no side tables.

`alloc` assigns the lowest-index free slots to requests in request order.
When no slot has ever been freed this reproduces bump allocation exactly;
after `free` (landmark culling, C14 "add/cull/merge") the holes are
reused, which is what keeps 1000+ frame sequences inside a fixed HBM
budget (SURVEY.md §7.3.8) instead of dropping every landmark past the
high-water mark.

Overflow is returned, never silent — callers surface it in telemetry.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def alloc(valid: jnp.ndarray, want: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign free slots to requested items.

    valid: (C,) bool occupancy mask (True = slot in use).
    want:  (N,) bool per-item request mask.

    Returns (ids, new_valid, dropped):
      ids (N,) int32 — assigned slot per item, -1 for unrequested items
        and for requests that overflowed capacity;
      new_valid (C,) — occupancy with the assigned slots marked used;
      dropped () int32 — number of requests that found no free slot.
    """
    C = valid.shape[0]
    # Free slots in ascending index order: stable argsort puts False first.
    order = jnp.argsort(valid, stable=True).astype(jnp.int32)  # (C,)
    n_free = C - jnp.sum(valid.astype(jnp.int32))
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # request rank
    ok = want & (rank < n_free)
    ids = jnp.where(ok, order[jnp.clip(rank, 0, C - 1)], -1)
    new_valid = valid.at[jnp.where(ok, ids, C + 1)].set(True, mode="drop")
    dropped = jnp.sum(want.astype(jnp.int32)) - jnp.sum(ok.astype(jnp.int32))
    return ids, new_valid, dropped


def free(valid: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Release slots: ids (N,) int32 (-1 entries ignored). Returns new mask."""
    C = valid.shape[0]
    return valid.at[jnp.where(ids >= 0, ids, C + 1)].set(False, mode="drop")


def free_mask(valid: jnp.ndarray, release: jnp.ndarray) -> jnp.ndarray:
    """Release every slot where `release` (C,) bool is set."""
    return valid & ~release


def live_count(valid: jnp.ndarray) -> jnp.ndarray:
    """Number of occupied slots (int32)."""
    return jnp.sum(valid.astype(jnp.int32))
