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

from laneslam.backend.pgo import (
    PgoProblem, _clamp_step, _edge_cost, _edge_linearize, _huber_w,
)
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
        # Same safeguard as pgo_solve (numerical contract): per-node trust
        # region + catastrophic-step rejection. Candidate cost = psum of
        # local-edge robust costs at the gathered new poses.
        delta = _clamp_step(delta * free_all, cfg.step_cap) * free_all
        # Each shard retracts only its own span.
        d_loc = jax.lax.dynamic_slice_in_dim(delta, base, n_local, axis=0)
        T_loc_new = T_wc_loc @ se3.exp(d_loc)
        T_all_new = coll.all_gather(T_loc_new, "frame").reshape(N, 4, 4)
        cost_new = coll.psum(
            _edge_cost(T_all_new, prob_rep._replace(node_valid=nv_all), cfg),
            "frame",
        )
        take = jnp.isfinite(cost_new) & (cost_new <= 4.0 * cost + 1e-6)
        return jnp.where(take, T_loc_new, T_wc_loc), cost

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


# ---------------------------------------------------------------------------
# P4 halo-exchange variant: O(boundary + loop endpoints) bytes per CG matvec.
# ---------------------------------------------------------------------------


def pgo_solve_sharded_halo(
    problem: PgoProblem,
    mesh: Mesh,
    cfg: PgoConfig = PgoConfig(),
    num_fixed: int = 1,
    cg_iters: int = 50,
    interface_cap: int = 8,
) -> Tuple[PgoProblem, jnp.ndarray, jnp.ndarray]:
    """Trajectory-sharded PGO whose CG inner loop exchanges only INTERFACE
    pose updates (SURVEY §2.2 P4, §5.7; VERDICT r3 #7).

    Layout: nodes in contiguous spans over 'frame'; edges sharded by table
    slice. A node is an *interface* node of its owner iff some OTHER
    shard's edge references it — for a pose chain that is the span
    boundaries (O(1) per shard) plus loop-edge endpoints (O(loops)).
    Each shard publishes at most `interface_cap` interface values per CG
    matvec via one small all_gather, and returns remote J^T-contributions
    through one psum over the same (n_shards * interface_cap, 6) table —
    per-matvec traffic is O(interfaces), NOT O(N) like the all_gather
    variant above (whose docstring called this the pod-scale optimization).

    Per GN step (not per matvec) there is one O(N) pose gather for edge
    linearization and one O(E) connectivity gather — both amortized over
    `cg_iters` matvecs.

    Returns (problem', costs (gn_iters,), ok). `ok`=False means some shard
    had more interface nodes than `interface_cap` (raise it and re-run;
    results are invalid). Numerical contract: equal to backend.pgo.pgo_solve
    to f32 tolerance — asserted on the fake 8-device mesh
    (tests/dist/test_pgo_halo.py).
    """
    N = problem.T_wc.shape[0]
    dtype = problem.T_wc.dtype
    n_shards = mesh.shape["frame"]
    assert N % n_shards == 0
    E = problem.edge_i.shape[0]
    assert E % n_shards == 0
    nl = N // n_shards
    el = E // n_shards
    IC = interface_cap

    free_mask = (
        (jnp.arange(N) >= num_fixed) & problem.node_valid
    ).astype(dtype)[:, None]

    def inner(T_wc_loc, nv_loc, ei_loc, ej_loc, eT_loc, ew_loc, free_loc):
        my = coll.axis_index("frame")
        base = my * nl

        # --- per-GN-step (amortized) exchanges ---------------------------
        T_all = coll.all_gather(T_wc_loc, "frame").reshape(N, 4, 4)
        nv_all = coll.all_gather(nv_loc, "frame").reshape(N)
        ei_all = coll.all_gather(ei_loc, "frame").reshape(E)
        ej_all = coll.all_gather(ej_loc, "frame").reshape(E)
        ew_all = coll.all_gather(ew_loc, "frame").reshape(E)

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

        # Interface detection: owned nodes referenced by other shards' live
        # edges. Edge owner = slice index (static block layout).
        e_owner = jnp.arange(E, dtype=jnp.int32) // el
        foreign = (e_owner != my) & (ew_all > 0)
        g = jnp.arange(nl, dtype=jnp.int32) + base  # my owned global ids
        ref_i = jnp.zeros((N,), bool).at[
            jnp.where(foreign, ei_all, N + 1)
        ].set(True, mode="drop")
        ref_j = jnp.zeros((N,), bool).at[
            jnp.where(foreign, ej_all, N + 1)
        ].set(True, mode="drop")
        iface = (ref_i | ref_j)[g]  # (nl,)
        n_iface = jnp.sum(iface.astype(jnp.int32))
        ok_local = n_iface <= IC
        ord_ = jnp.cumsum(iface.astype(jnp.int32)) - 1
        # Local slot of each published value; -1 = unused publish slot.
        pub_slot = (
            jnp.full((IC,), -1, jnp.int32)
            .at[jnp.where(iface & (ord_ < IC), ord_, IC + 1)]
            .set(jnp.arange(nl, dtype=jnp.int32), mode="drop")
        )
        pub_gid = jnp.where(pub_slot >= 0, pub_slot + base, -1)  # (IC,)
        all_pub_gid = coll.all_gather(pub_gid, "frame").reshape(n_shards * IC)
        ok = coll.psum(ok_local.astype(jnp.int32), "frame") == n_shards

        # Endpoint resolution tables (per GN step): local slot or publish pos.
        def resolve(idx):  # (el,) global -> (is_local, local_slot, pub_pos)
            is_loc = (idx >= base) & (idx < base + nl)
            loc = jnp.clip(idx - base, 0, nl - 1)
            eq = idx[:, None] == all_pub_gid[None, :]  # (el, n*IC)
            pos = jnp.argmax(eq, axis=1)
            return is_loc, loc, pos

        li_i, sl_i, pp_i = resolve(ei_loc)
        li_j, sl_j, pp_j = resolve(ej_loc)

        free_all = coll.all_gather(free_loc, "frame").reshape(N, 1)
        free_l = free_loc.reshape(nl, 1)

        # Gradient + Jacobi diag: O(N) scatter+psum ONCE per GN step.
        def scatter_global(vi, vj):
            out = (
                jnp.zeros((N, 6), dtype)
                .at[ei_loc].add(vi)
                .at[ej_loc].add(vj)
            )
            return coll.psum(out, "frame")

        g_full = scatter_global(
            jnp.einsum("eab,ea->eb", Ji * w[:, None, None], r),
            jnp.einsum("eab,ea->eb", Jj * w[:, None, None], r),
        ) * free_all
        diag = scatter_global(
            jnp.einsum("eab,eab->eb", Ji * w[:, None, None], Ji),
            jnp.einsum("eab,eab->eb", Jj * w[:, None, None], Jj),
        ) + cfg.damping
        Minv_full = jnp.where(free_all > 0, 1.0 / jnp.maximum(diag, 1e-12), 0.0)
        g_loc = jax.lax.dynamic_slice_in_dim(g_full, base, nl, axis=0)
        Minv_loc = jax.lax.dynamic_slice_in_dim(Minv_full, base, nl, axis=0)

        def hvp(x_loc):  # (nl, 6) -> (nl, 6); O(interfaces) exchange
            x_loc = x_loc * free_l
            # Publish my interface values; read everyone's.
            pub_x = jnp.where(
                (pub_slot >= 0)[:, None], x_loc[jnp.maximum(pub_slot, 0)], 0.0
            )  # (IC, 6)
            all_pub = coll.all_gather(pub_x, "frame").reshape(n_shards * IC, 6)
            xi = jnp.where(li_i[:, None], x_loc[sl_i], all_pub[pp_i])
            xj = jnp.where(li_j[:, None], x_loc[sl_j], all_pub[pp_j])
            y = (
                jnp.einsum("eab,eb->ea", Ji, xi)
                + jnp.einsum("eab,eb->ea", Jj, xj)
            ) * w[:, None]
            ci = jnp.einsum("eab,ea->eb", Ji, y)  # contribution to node i
            cj = jnp.einsum("eab,ea->eb", Jj, y)
            out = (
                jnp.zeros((nl, 6), dtype)
                .at[jnp.where(li_i, sl_i, nl + 1)].add(ci, mode="drop")
                .at[jnp.where(li_j, sl_j, nl + 1)].add(cj, mode="drop")
            )
            # Remote contributions ride the interface table back via psum.
            rem = (
                jnp.zeros((n_shards * IC, 6), dtype)
                .at[jnp.where(li_i, n_shards * IC + 1, pp_i)].add(ci, mode="drop")
                .at[jnp.where(li_j, n_shards * IC + 1, pp_j)].add(cj, mode="drop")
            )
            rem = coll.psum(rem, "frame")
            mine = jax.lax.dynamic_slice_in_dim(rem, my * IC, IC, axis=0)
            out = out.at[jnp.where(pub_slot >= 0, pub_slot, nl + 1)].add(
                mine, mode="drop"
            )
            return (out + cfg.damping * x_loc) * free_l

        def pdot(a, b):  # distributed inner product
            return coll.psum(jnp.sum(a * b), "frame")

        b = -g_loc

        def cg_body(carry, _):
            x, rr, p, rz = carry
            Hp = hvp(p)
            alpha = rz / jnp.maximum(pdot(p, Hp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = Minv_loc * rr
            rz_new = pdot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return (x, rr, z + beta * p, rz_new), None

        x0 = jnp.zeros((nl, 6), dtype)
        z0 = Minv_loc * b
        (delta, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, b, z0, pdot(b, z0)), None, length=cg_iters
        )
        # Same safeguard as pgo_solve (numerical contract): per-node trust
        # region + catastrophic-step rejection. One extra O(N) gather per
        # GN step (amortized over cg_iters matvecs).
        delta = _clamp_step(delta * free_l, cfg.step_cap) * free_l
        T_loc_new = T_wc_loc @ se3.exp(delta)
        T_all_new = coll.all_gather(T_loc_new, "frame").reshape(N, 4, 4)
        cost_new = coll.psum(_edge_cost(T_all_new, prob_rep, cfg), "frame")
        take = jnp.isfinite(cost_new) & (cost_new <= 4.0 * cost + 1e-6)
        return jnp.where(take, T_loc_new, T_wc_loc), cost, ok

    frame = P("frame")
    rep = P()
    step = jax.jit(
        jax.shard_map(
            inner, mesh=mesh,
            in_specs=(frame, frame, frame, frame, frame, frame, frame),
            out_specs=(frame, rep, rep), check_vma=False,
        )
    )

    T_wc = problem.T_wc
    costs = []
    ok = jnp.asarray(True)
    for _ in range(cfg.gn_iters):
        T_wc, cost, ok = step(
            T_wc, problem.node_valid, problem.edge_i, problem.edge_j,
            problem.edge_T, problem.edge_weight, free_mask,
        )
        costs.append(cost)
    return problem._replace(T_wc=T_wc), jnp.stack(costs), ok
