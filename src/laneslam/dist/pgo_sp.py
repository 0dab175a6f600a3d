"""P4 — trajectory-parallel PGO (SURVEY.md §2.2, §5.7).

The pose chain (the SLAM "sequence") is sharded in contiguous keyframe
spans over mesh axis 'frame'. Each shard owns N/n nodes and the edges whose
SOURCE node it owns. The CG matvec needs x at both edge endpoints; endpoint
values are exchanged with one all_gather over 'frame' per matvec (pose
vectors are 6 floats/node — for SLAM-scale graphs the gather is tiny; a
ppermute halo exchange for the chain edges is the pod-scale optimization,
the ring pattern itself is exercised by dist/ring.py).

Numerical contract: equal to backend.pgo.pgo_solve on one device — asserted
on the fake 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from laneslam.backend.pgo import PgoProblem, _edge_linearize, _huber_w
from laneslam.dist import collectives as coll
from laneslam.config import PgoConfig
from laneslam.geometry import se3


def pgo_solve_sharded(
    problem: PgoProblem,
    mesh: Mesh,
    cfg: PgoConfig = PgoConfig(),
    num_fixed: int = 1,
    cg_iters: int = 50,
) -> Tuple[PgoProblem, jnp.ndarray]:
    """GN + preconditioned CG with nodes and edges sharded over 'frame'.

    problem.T_wc: (N, 4, 4) with N divisible by the 'frame' axis size;
    edges: (E,) with E divisible likewise (pad with zero-weight edges).
    """
    N = problem.T_wc.shape[0]
    dtype = problem.T_wc.dtype
    n_shards = mesh.shape["frame"]
    assert N % n_shards == 0
    E = problem.edge_i.shape[0]
    assert E % n_shards == 0

    free_mask = (
        (jnp.arange(N) >= num_fixed) & problem.node_valid
    ).astype(dtype)[:, None]

    def inner(T_wc_loc, nv_loc, ei_loc, ej_loc, eT_loc, ew_loc, free_loc):
        """Shard body: local nodes (N/n, ...), local edges (E/n, ...)."""
        my = coll.axis_index("frame")
        n_local = T_wc_loc.shape[0]
        base = my * n_local

        # Full pose array via all_gather (the DCN/ICI crossing).
        T_all = coll.all_gather(T_wc_loc, "frame").reshape(N, 4, 4)
        nv_all = coll.all_gather(nv_loc, "frame").reshape(N)

        prob_rep = PgoProblem(
            T_wc=T_all, node_valid=nv_all,
            edge_i=ei_loc, edge_j=ej_loc, edge_T=eT_loc, edge_weight=ew_loc,
        )
        r, Ji, Jj = _edge_linearize(prob_rep)  # local edges only
        w = _huber_w(r, cfg.huber) * ew_loc * nv_all[ei_loc] * nv_all[ej_loc]
        live = (w > 0)[:, None, None]
        r = jnp.where(live[..., 0], jnp.nan_to_num(r), 0.0)
        Ji = jnp.where(live, jnp.nan_to_num(Ji), 0.0)
        Jj = jnp.where(live, jnp.nan_to_num(Jj), 0.0)
        cost = coll.psum(0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1)), "frame")

        free_all = coll.all_gather(free_loc, "frame").reshape(N, 1)

        def scatter_global(vi, vj):
            out = (
                jnp.zeros((N, 6), dtype)
                .at[ei_loc].add(vi)
                .at[ej_loc].add(vj)
            )
            return coll.psum(out, "frame")

        g = scatter_global(
            jnp.einsum("eab,ea->eb", Ji * w[:, None, None], r),
            jnp.einsum("eab,ea->eb", Jj * w[:, None, None], r),
        ) * free_all
        diag = scatter_global(
            jnp.einsum("eab,eab->eb", Ji * w[:, None, None], Ji),
            jnp.einsum("eab,eab->eb", Jj * w[:, None, None], Jj),
        ) + cfg.damping
        Minv = jnp.where(free_all > 0, 1.0 / jnp.maximum(diag, 1e-12), 0.0)

        def hvp(x):  # x replicated (N, 6)
            x = x * free_all
            y = (
                jnp.einsum("eab,eb->ea", Ji, x[ei_loc])
                + jnp.einsum("eab,eb->ea", Jj, x[ej_loc])
            ) * w[:, None]
            out = scatter_global(
                jnp.einsum("eab,ea->eb", Ji, y),
                jnp.einsum("eab,ea->eb", Jj, y),
            )
            return (out + cfg.damping * x) * free_all

        b = -g

        def cg_body(carry, _):
            x, rr, p, rz = carry
            Hp = hvp(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = Minv * rr
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return (x, rr, z + beta * p, rz_new), None

        x0 = jnp.zeros((N, 6), dtype)
        z0 = Minv * b
        (delta, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, b, z0, jnp.sum(b * z0)), None, length=cg_iters
        )
        delta = delta * free_all
        # Each shard retracts only its own span.
        d_loc = jax.lax.dynamic_slice_in_dim(delta, base, n_local, axis=0)
        return T_wc_loc @ se3.exp(d_loc), cost

    frame = P("frame")
    rep = P()
    step = jax.jit(
        jax.shard_map(
            inner, mesh=mesh,
            in_specs=(frame, frame, frame, frame, frame, frame, frame),
            out_specs=(frame, rep), check_vma=False,
        )
    )

    T_wc = problem.T_wc
    costs = []
    for _ in range(cfg.gn_iters):
        T_wc, cost = step(
            T_wc, problem.node_valid, problem.edge_i, problem.edge_j,
            problem.edge_T, problem.edge_weight, free_mask,
        )
        costs.append(cost)
    return problem._replace(T_wc=T_wc), jnp.stack(costs)
