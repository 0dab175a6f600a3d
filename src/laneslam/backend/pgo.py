"""Pose-graph optimization (SURVEY.md C10, BASELINE.json:9).

SE(3) keyframe graph with odometry + loop edges; residual per edge
r = log( T_meas^-1 · T_i^-1 · T_j )  (6,), right-multiplicative updates
T_i <- T_i exp(xi_i).

TPU formulation: Gauss-Newton outer iterations (lax.scan) with a
*matrix-free preconditioned conjugate-gradient* inner solve. The Hessian is
never materialized: H @ x is two gathers, a batched 6x6 edge product, and a
scatter-add — O(E) work per CG step with fixed-capacity edge tables. This
keeps memory O(N + E) (a dense pose Hessian would be O(N^2)) and the same
matvec shards along the trajectory axis for the distributed path
(SURVEY.md P4).

Edge Jacobians come from jacfwd at the linearization point, vmapped over the
edge table (like backend/residuals.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from laneslam.config import PgoConfig
from laneslam.geometry import se3, sim3


class PgoProblem(NamedTuple):
    """Fixed-capacity pose graph."""

    T_wc: jnp.ndarray  # (N, 4, 4) node poses
    node_valid: jnp.ndarray  # (N,) bool
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    edge_T: jnp.ndarray  # (E, 4, 4) measured T_i^-1 T_j
    edge_weight: jnp.ndarray  # (E,) float32 information scale (0 = invalid)


class PgoInfo(NamedTuple):
    cost: jnp.ndarray  # (iters + 1,)


def _edge_linearize(problem: PgoProblem):
    """Residuals + Jacobians for every edge slot. r (E,6), Ji/Jj (E,6,6)."""
    Ti = problem.T_wc[problem.edge_i]
    Tj = problem.T_wc[problem.edge_j]
    Tm_inv = se3.inverse(problem.edge_T)

    def res(Ti_, Tj_, Tm_inv_, xi, xj):
        A = Tm_inv_ @ se3.inverse(Ti_ @ se3.exp(xi)) @ (Tj_ @ se3.exp(xj))
        return se3.log(A)

    z = jnp.zeros(6, problem.T_wc.dtype)
    r = jax.vmap(lambda a, b, m: res(a, b, m, z, z))(Ti, Tj, Tm_inv)
    Ji, Jj = jax.vmap(
        lambda a, b, m: jax.jacfwd(lambda xi, xj: res(a, b, m, xi, xj), (0, 1))(z, z)
    )(Ti, Tj, Tm_inv)
    return r, Ji, Jj


def _huber_w(r: jnp.ndarray, k: float) -> jnp.ndarray:
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.minimum(1.0, k / jnp.maximum(n, 1e-12))


def _clamp_step(delta: jnp.ndarray, cap: float) -> jnp.ndarray:
    """Per-node trust region: scale each node's tangent update so its norm
    is <= cap. An ill-conditioned CG solve (near-singular graph, a bad
    loop edge) can emit huge deltas; retracting them explodes the chain —
    round-5 measured the production Sim(3) graph overflowing to 1e12
    translations from exactly this. Clamping preserves the direction, and
    subsequent GN iterations re-linearize from the clamped point."""
    n = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    return delta * jnp.minimum(1.0, cap / jnp.maximum(n, 1e-12))


def _edge_cost(T_wc, problem: "PgoProblem", cfg: PgoConfig) -> jnp.ndarray:
    """Robust cost at T_wc — residuals only (no jacfwd), for the GN
    safeguard's candidate evaluation."""
    Ti = T_wc[problem.edge_i]
    Tj = T_wc[problem.edge_j]
    r = jax.vmap(lambda a, b, m: se3.log(m @ se3.inverse(a) @ b))(
        Ti, Tj, se3.inverse(problem.edge_T)
    )
    w = (
        _huber_w(r, cfg.huber)
        * problem.edge_weight
        * problem.node_valid[problem.edge_i]
        * problem.node_valid[problem.edge_j]
    )
    r = jnp.where((w > 0)[:, None], jnp.nan_to_num(r), 0.0)
    return 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))


@partial(jax.jit, static_argnames=("cfg", "num_fixed", "cg_iters"))
def pgo_solve(
    problem: PgoProblem,
    cfg: PgoConfig = PgoConfig(),
    num_fixed: int = 1,
    cg_iters: int = 50,
) -> Tuple[PgoProblem, PgoInfo]:
    N = problem.T_wc.shape[0]
    dtype = problem.T_wc.dtype
    free = (
        (jnp.arange(N) >= num_fixed) & problem.node_valid
    ).astype(dtype)[:, None]  # (N, 1)

    def gn_step(T_wc, _):
        prob = problem._replace(T_wc=T_wc)
        r, Ji, Jj = _edge_linearize(prob)
        w = (
            _huber_w(r, cfg.huber)
            * problem.edge_weight
            * problem.node_valid[problem.edge_i]
            * problem.node_valid[problem.edge_j]
        )
        # Sanitize invalid edges entirely: any non-finite linearization on a
        # zero-weight (padded/degenerate) edge must not reach the products
        # below (NaN * 0 == NaN).
        live = (w > 0)[:, None, None]
        r = jnp.where(live[..., 0], jnp.nan_to_num(r), 0.0)
        Ji = jnp.where(live, jnp.nan_to_num(Ji), 0.0)
        Jj = jnp.where(live, jnp.nan_to_num(Jj), 0.0)
        cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))

        # Gradient g = J^T W r, scattered to nodes.
        gi = jnp.einsum("eab,ea->eb", Ji * w[:, None, None], r)
        gj = jnp.einsum("eab,ea->eb", Jj * w[:, None, None], r)
        g = (
            jnp.zeros((N, 6), dtype)
            .at[problem.edge_i].add(gi)
            .at[problem.edge_j].add(gj)
        ) * free

        # Jacobi preconditioner: block-diagonal of H (diag 6-vectors suffice).
        di = jnp.einsum("eab,eab->eb", Ji * w[:, None, None], Ji)
        dj = jnp.einsum("eab,eab->eb", Jj * w[:, None, None], Jj)
        diag = (
            jnp.zeros((N, 6), dtype)
            .at[problem.edge_i].add(di)
            .at[problem.edge_j].add(dj)
            + cfg.damping
        )
        Minv = jnp.where(free > 0, 1.0 / jnp.maximum(diag, 1e-12), 0.0)

        def hvp(x):  # (N, 6) -> (N, 6), damped + gauge-masked
            x = x * free
            yi = jnp.einsum("eab,eb->ea", Ji, x[problem.edge_i])
            yj = jnp.einsum("eab,eb->ea", Jj, x[problem.edge_j])
            y = (yi + yj) * w[:, None]
            out = (
                jnp.zeros((N, 6), dtype)
                .at[problem.edge_i].add(jnp.einsum("eab,ea->eb", Ji, y))
                .at[problem.edge_j].add(jnp.einsum("eab,ea->eb", Jj, y))
            )
            return (out + cfg.damping * x) * free

        # Preconditioned CG for H delta = -g.
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
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros((N, 6), dtype)
        r0 = b
        z0 = Minv * r0
        (delta, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, jnp.sum(r0 * z0)), None, length=cg_iters
        )
        delta = _clamp_step(delta * free, cfg.step_cap) * free
        T_new = T_wc @ se3.exp(delta)
        # Safeguarded GN: reject a CATASTROPHIC step (non-finite cost, or
        # cost blowing past 4x the linearization point). Mild increases are
        # allowed — Huber GN fluctuates near convergence, and a strict
        # monotone gate was measured to stall the solver at the first
        # fluctuation (the step from an unchanged state repeats forever).
        cost_new = _edge_cost(T_new, problem, cfg)
        take = jnp.isfinite(cost_new) & (cost_new <= 4.0 * cost + 1e-6)
        T_new = jnp.where(take, T_new, T_wc)
        return T_new, cost

    T_out, costs = jax.lax.scan(gn_step, problem.T_wc, None, length=cfg.gn_iters)
    out = problem._replace(T_wc=T_out)
    r, _, _ = _edge_linearize(out)
    w = (
        _huber_w(r, cfg.huber)
        * problem.edge_weight
        * problem.node_valid[problem.edge_i]
        * problem.node_valid[problem.edge_j]
    )
    final = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))
    return out, PgoInfo(cost=jnp.concatenate([costs, final[None]]))


class PgoSim3Problem(NamedTuple):
    """Sim(3) pose graph (Strasdat RSS 2010 / ORB-SLAM essential graph).

    Mono odometry accumulates SCALE drift that SE(3) edges cannot express:
    when a loop closes with an observed relative scale s != 1, an SE(3)
    graph must absorb the error into translations, while a Sim(3) graph
    distributes log-scale smoothly along the chain. Odometry edges carry
    edge_s = 1 (locally scale-consistent); loop edges carry the scale from
    Sim(3) verification (loop/verify.py)."""

    T_wc: jnp.ndarray  # (N, 4, 4) node poses (R | t)
    s_wc: jnp.ndarray  # (N,) node scales
    node_valid: jnp.ndarray  # (N,) bool
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray
    edge_T: jnp.ndarray  # (E, 4, 4) measured relative R | t
    edge_s: jnp.ndarray  # (E,) measured relative scale
    edge_weight: jnp.ndarray  # (E,) 0 = invalid slot
    # Per-edge weight MULTIPLIER on the log-scale residual component
    # (None = 1 everywhere). On a near-chain graph the per-node scale is
    # the underconstrained direction: the solver can oscillate node scales
    # +-15% to soak up translation noise (measured round 5 — the production
    # blowup), because scaling node i reshapes its predicted translations
    # (1/s_i) R_i^T (t_j - t_i). Odometry edges are locally scale-consistent
    # to well under a percent, so their scale residual deserves FAR more
    # information than their translation residual; weighting it (e.g. 8x)
    # suppresses the oscillation while a genuine loop-closure scale still
    # distributes smoothly along the chain (1-2% per edge costs little).
    edge_scale_w: jnp.ndarray | None = None


def _edge_linearize_sim3(problem: PgoSim3Problem):
    """Residuals + Jacobians per edge slot: r (E, 7), Ji/Jj (E, 7, 7)."""
    Ti = problem.T_wc[problem.edge_i]
    si = problem.s_wc[problem.edge_i]
    Tj = problem.T_wc[problem.edge_j]
    sj = problem.s_wc[problem.edge_j]
    Sm_inv = sim3.inverse((problem.edge_T, problem.edge_s))

    def res(Ti_, si_, Tj_, sj_, Tm_, sm_, xi, xj):
        Si = sim3.retract((Ti_, si_), xi)
        Sj = sim3.retract((Tj_, sj_), xj)
        A = sim3.compose((Tm_, sm_), sim3.compose(sim3.inverse(Si), Sj))
        return sim3.log(A)

    z = jnp.zeros(7, problem.T_wc.dtype)
    r = jax.vmap(lambda a, b, c, d, e, f: res(a, b, c, d, e, f, z, z))(
        Ti, si, Tj, sj, *Sm_inv
    )
    Ji, Jj = jax.vmap(
        lambda a, b, c, d, e, f: jax.jacfwd(
            lambda xi, xj: res(a, b, c, d, e, f, xi, xj), (0, 1)
        )(z, z)
    )(Ti, si, Tj, sj, *Sm_inv)
    if problem.edge_scale_w is not None:
        # Whiten the log-scale component (index 6) per edge: scales the
        # residual row and the matching Jacobian rows identically, which is
        # exactly a per-component information weight.
        k = jnp.sqrt(problem.edge_scale_w)
        r = r.at[:, 6].multiply(k)
        Ji = Ji.at[:, 6, :].multiply(k[:, None])
        Jj = Jj.at[:, 6, :].multiply(k[:, None])
    return r, Ji, Jj


def _edge_cost_sim3(T_wc, s_wc, problem: "PgoSim3Problem", cfg: PgoConfig):
    """Robust Sim(3) cost — residuals only, for the GN safeguard."""
    Sm_inv = sim3.inverse((problem.edge_T, problem.edge_s))
    r = jax.vmap(
        lambda Ti, si, Tj, sj, Tm, sm: sim3.log(
            sim3.compose((Tm, sm), sim3.compose(
                sim3.inverse((Ti, si)), (Tj, sj)
            ))
        )
    )(
        T_wc[problem.edge_i], s_wc[problem.edge_i],
        T_wc[problem.edge_j], s_wc[problem.edge_j], *Sm_inv
    )
    if problem.edge_scale_w is not None:
        r = r.at[:, 6].multiply(jnp.sqrt(problem.edge_scale_w))
    w = (
        _huber_w(r, cfg.huber)
        * problem.edge_weight
        * problem.node_valid[problem.edge_i]
        * problem.node_valid[problem.edge_j]
    )
    r = jnp.where((w > 0)[:, None], jnp.nan_to_num(r), 0.0)
    return 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))


@partial(jax.jit, static_argnames=("cfg", "num_fixed", "cg_iters"))
def pgo_solve_sim3(
    problem: PgoSim3Problem,
    cfg: PgoConfig = PgoConfig(),
    num_fixed: int = 1,
    cg_iters: int = 50,
) -> Tuple[PgoSim3Problem, PgoInfo]:
    """Sim(3) GN + Jacobi-PCG, same matrix-free structure as pgo_solve but
    with 7-dof node blocks. The first `num_fixed` nodes pin both gauge AND
    global scale (Sim(3) has a 7-dim gauge group)."""
    N = problem.T_wc.shape[0]
    dtype = problem.T_wc.dtype
    free = (
        (jnp.arange(N) >= num_fixed) & problem.node_valid
    ).astype(dtype)[:, None]  # (N, 1)

    def pack(T, s):
        return T, s

    def gn_step(state, _):
        T_wc, s_wc = state
        prob = problem._replace(T_wc=T_wc, s_wc=s_wc)
        r, Ji, Jj = _edge_linearize_sim3(prob)
        w = (
            _huber_w(r, cfg.huber)
            * problem.edge_weight
            * problem.node_valid[problem.edge_i]
            * problem.node_valid[problem.edge_j]
        )
        live = (w > 0)[:, None, None]
        r = jnp.where(live[..., 0], jnp.nan_to_num(r), 0.0)
        Ji = jnp.where(live, jnp.nan_to_num(Ji), 0.0)
        Jj = jnp.where(live, jnp.nan_to_num(Jj), 0.0)
        cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))

        gi = jnp.einsum("eab,ea->eb", Ji * w[:, None, None], r)
        gj = jnp.einsum("eab,ea->eb", Jj * w[:, None, None], r)
        g = (
            jnp.zeros((N, 7), dtype)
            .at[problem.edge_i].add(gi)
            .at[problem.edge_j].add(gj)
        ) * free

        di = jnp.einsum("eab,eab->eb", Ji * w[:, None, None], Ji)
        dj = jnp.einsum("eab,eab->eb", Jj * w[:, None, None], Jj)
        diag = (
            jnp.zeros((N, 7), dtype)
            .at[problem.edge_i].add(di)
            .at[problem.edge_j].add(dj)
            + cfg.damping
        )
        Minv = jnp.where(free > 0, 1.0 / jnp.maximum(diag, 1e-12), 0.0)

        def hvp(x):
            x = x * free
            yi = jnp.einsum("eab,eb->ea", Ji, x[problem.edge_i])
            yj = jnp.einsum("eab,eb->ea", Jj, x[problem.edge_j])
            y = (yi + yj) * w[:, None]
            out = (
                jnp.zeros((N, 7), dtype)
                .at[problem.edge_i].add(jnp.einsum("eab,ea->eb", Ji, y))
                .at[problem.edge_j].add(jnp.einsum("eab,ea->eb", Jj, y))
            )
            return (out + cfg.damping * x) * free

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
            p = z + beta * p
            return (x, rr, p, rz_new), None

        r0 = b
        z0 = Minv * r0
        (delta, _, _, _), _ = jax.lax.scan(
            cg_body, (jnp.zeros((N, 7), dtype), r0, z0, jnp.sum(r0 * z0)),
            None, length=cg_iters,
        )
        delta = _clamp_step(delta * free, cfg.step_cap) * free
        # The scale direction compounds exponentially (s <- s * e^dsigma):
        # clamp it tighter than the rigid part so a bad CG solve cannot
        # collapse/explode node scales in one iteration.
        delta = delta.at[:, 6].set(jnp.clip(delta[:, 6], -0.3, 0.3))
        T_new, s_new = sim3.retract((T_wc, s_wc), delta)
        # Safeguarded GN: reject catastrophic steps only (see pgo_solve).
        cost_new = _edge_cost_sim3(T_new, s_new, problem, cfg)
        take = jnp.isfinite(cost_new) & (cost_new <= 4.0 * cost + 1e-6)
        T_new = jnp.where(take, T_new, T_wc)
        s_new = jnp.where(take, s_new, s_wc)
        return pack(T_new, s_new), cost

    (T_out, s_out), costs = jax.lax.scan(
        gn_step, pack(problem.T_wc, problem.s_wc), None, length=cfg.gn_iters
    )
    out = problem._replace(T_wc=T_out, s_wc=s_out)
    r, _, _ = _edge_linearize_sim3(out)
    w = (
        _huber_w(r, cfg.huber)
        * problem.edge_weight
        * problem.node_valid[problem.edge_i]
        * problem.node_valid[problem.edge_j]
    )
    final = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))
    return out, PgoInfo(cost=jnp.concatenate([costs, final[None]]))
