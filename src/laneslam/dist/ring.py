"""P5 — ring retrieval: the ring-attention analogue for loop closure
(SURVEY.md §2.2, §5.7).

The keyframe descriptor DB is sharded over 'frame' and stays stationary;
each step every device GEMMs its local queries against the DB shard it
currently holds, merges a running top-k, then passes the DB shard to its
ring neighbor with `jax.lax.ppermute` — identical communication schedule to
ring attention (stationary KV <-> rotating DB shard), with streaming top-k
in place of softmax accumulation.

P6 — all_to_all resharding lives in `reshard_frame_to_block` below: the
observation table flips between frame-major (front-end layout) and
landmark-major (Schur layout) with one jax.lax.all_to_all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from laneslam.dist import collectives as coll


def ring_topk_query(
    db: jnp.ndarray,  # (K, C) keyframe descriptor DB (global layout)
    db_valid: jnp.ndarray,  # (K,)
    queries: jnp.ndarray,  # (Q, C)
    mesh: Mesh,
    top_k: int = 5,
):
    """Global top-k similarity search via a ppermute ring.

    Returns (ids (Q, top_k) global indices, sims (Q, top_k)) — equal to the
    dense global GEMM + top_k (asserted by tests/dist/test_ring.py).
    """
    n = mesh.shape["frame"]
    K, C = db.shape
    Q = queries.shape[0]
    assert K % n == 0 and Q % n == 0
    kb = K // n

    def inner(db_loc, valid_loc, q_loc):
        my = coll.axis_index("frame")
        qn = q_loc.shape[0]
        best_sim = jnp.full((qn, top_k), -jnp.inf, db.dtype)
        best_idx = jnp.full((qn, top_k), -1, jnp.int32)

        def step(carry, s):
            db_s, valid_s, bsim, bidx = carry
            # The shard currently held started life on device (my - s) % n.
            owner = (my - s) % n
            base = owner * kb
            sim = jnp.einsum(
                "qc,kc->qk", q_loc, db_s, preferred_element_type=jnp.float32
            )
            sim = jnp.where(valid_s[None, :], sim, -jnp.inf)
            ids = base + jax.lax.broadcasted_iota(jnp.int32, (qn, kb), 1)
            # Merge running top-k with this shard's candidates.
            top_sim, top_idx = coll.topk_merge(bsim, bidx, sim, ids, top_k)
            # Rotate the DB shard to the right neighbor (the ring hop).
            db_next = coll.ppermute_shift(db_s, "frame")
            valid_next = coll.ppermute_shift(valid_s, "frame")
            return (db_next, valid_next, top_sim, top_idx), None

        (_, _, bsim, bidx), _ = jax.lax.scan(
            step, (db_loc, valid_loc, best_sim, best_idx), jnp.arange(n)
        )
        return bidx, bsim

    frame = P("frame")
    fn = jax.jit(
        jax.shard_map(
            inner, mesh=mesh,
            in_specs=(frame, frame, frame),
            out_specs=(frame, frame), check_vma=False,
        )
    )
    return fn(db, db_valid, queries)


def reshard_frame_to_block(x: jnp.ndarray, mesh: Mesh):
    """P6: flip a (D, X, ...) array from row-sharded ('frame' on axis 0) to
    column-sharded ('frame' on axis 1) with one all_to_all.

    This is the Ulysses-style layout switch the observation table uses
    between the front-end (frame-major) and Schur (landmark-major) phases.
    Requires D and X divisible by the axis size.
    """
    n = mesh.shape["frame"]
    D, X = x.shape[0], x.shape[1]
    assert D % n == 0 and X % n == 0

    def inner(x_loc):  # (D/n, X, ...)
        # Split the second axis into n chunks and exchange: after all_to_all
        # each device holds (D, X/n, ...).
        split = x_loc.reshape((x_loc.shape[0], n, X // n) + x_loc.shape[2:])
        out = coll.all_to_all(split, "frame", split_axis=1, concat_axis=0)
        return out.reshape((D, X // n) + x_loc.shape[2:])

    fn = jax.jit(
        jax.shard_map(
            inner, mesh=mesh, in_specs=(P("frame"),),
            out_specs=P(None, "frame"), check_vma=False,
        )
    )
    return fn(x)
