"""Matrix-free (implicit-Schur) bundle adjustment for LARGE windows.

The dense solver in `backend/ba.py` materializes the camera-landmark
coupling tensor B as (N, W, 6, d) — dense in the window. That is the right
trade at sliding-window sizes (W <= 16: B is a few MB and the whole Schur
reduction is one fused kernel), but it is the WRONG design for global
bundle adjustment (SURVEY.md C9 "full-map refinement"): at production
capacity (W = 512 keyframes, 16,384 point blocks) the dense B is 600 MB
unpadded and >16 GB after TPU tiling of the trailing (6, d) dims — measured
round 5 as an HBM OOM at 22.9 G on the v5e.

This module solves the SAME damped normal equations without ever forming B:
the reduced camera system

    S dc = -(gc - B Hll^-1 gl),   S = Hcc_damped - B Hll^-1 B^T

is solved by preconditioned conjugate gradients where every product with B
or B^T is two passes of per-observation batched (2,6)/(2,d) GEMVs plus a
segment scatter-add — memory O(#observations), the natural sparsity of the
problem (each landmark sees a handful of keyframes, not all W).

Per CG iteration and landmark family:
    a[o] = Jp~[o] @ x[w_o]                    (2,)   gather over poses
    t[n] = sum_{o in n} Jl~[o]^T a[o]         (d,)   scatter-add -> B^T x
    u[n] = Hinv[n] t[n]                       (d,)   batched block inverse
    z[w] = sum_{o in w} Jp~[o]^T Jl~[o] u[n_o](6,)   scatter-add -> B u
    S x  = Hcc_damped x - z(points) - z(lines)

with Jp~ = sqrt(w) J_pose, Jl~ = sqrt(w) J_landmark (the same symmetric
robust-weight scaling the dense assembly uses).

Preconditioner: block-Jacobi on the EXACT diagonal blocks of S. Because
the observation tables hold at most one observation per (landmark,
keyframe) pair, diag_w(B Hinv B^T) = sum_o Jp~^T (Jl~ Hinv Jl~^T) Jp~ is
computable with one more per-observation scatter-add — so M_w =
Hcc_damped_w - C_w is the true 6x6 diagonal of S, not an approximation.

The LM loop (adaptive damping, accept/reject, fixed trip count) is
identical to `ba_solve`; `tests/backend/test_ba_implicit.py` pins
equivalence of a converged-CG step against the dense Schur path and cost
monotonicity at global-BA shapes the dense path cannot represent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from laneslam.backend.ba import (
    BAInfo,
    BAProblem,
    BaConfig,
    _linearize,
    _robust_cost,
)
from laneslam.geometry import se3
from laneslam.geometry.lines import plucker_retract
from laneslam.kernels.schur import inv_sym_batched


class _Family(NamedTuple):
    """Per-observation scaled Jacobians + per-landmark reduced blocks of
    one landmark family (points d=3 or lines d=4)."""

    Jp: jnp.ndarray  # (O, 2, 6)  sqrt(w)-scaled pose Jacobian
    Jl: jnp.ndarray  # (O, 2, d)  sqrt(w)-scaled landmark Jacobian
    idx_w: jnp.ndarray  # (O,) pose slot
    idx_lm: jnp.ndarray  # (O,) landmark slot
    Hinv: jnp.ndarray  # (N, d, d)  damped landmark-block inverse
    g: jnp.ndarray  # (N, d)  landmark gradient


def _build_family(r, J_pose, J_lm, w, lm_free, idx_w, idx_lm, N, damping):
    """Reduce one landmark family to its implicit-Schur pieces.

    Landmark coupling uses wf (fixed landmarks are constants: they
    constrain poses via Hcc/gc only, which the caller assembles with the
    FULL weight w) — the same split as the dense `_assemble`. Symmetric
    sqrt scaling: B = Jp_s^T Jl_s and Hll = Jl_s^T Jl_s reproduce the
    dense assembly's weighted products.
    """
    dtype = r.dtype
    wf = w if lm_free is None else w * lm_free[idx_lm].astype(dtype)
    swf = jnp.sqrt(wf)
    Jp_s = J_pose * swf[:, None, None]
    Jl_s = J_lm * swf[:, None, None]
    d = J_lm.shape[-1]
    Hl_o = jnp.einsum("oia,oib->oab", Jl_s, Jl_s)
    gl_o = jnp.einsum("oia,oi->oa", Jl_s, swf[:, None] * r)
    Hlm = jnp.zeros((N, d, d), dtype).at[idx_lm].add(Hl_o)
    glm = jnp.zeros((N, d), dtype).at[idx_lm].add(gl_o)
    Hd = Hlm + (damping + 1e-8) * jnp.eye(d, dtype=dtype)
    Hinv = inv_sym_batched(Hd)
    return _Family(Jp=Jp_s, Jl=Jl_s, idx_w=idx_w, idx_lm=idx_lm, Hinv=Hinv, g=glm)


def _bt_x(fam: _Family, x: jnp.ndarray) -> jnp.ndarray:
    """t = B^T x per landmark: (N, d) scatter-add of Jl~^T (Jp~ x_w)."""
    N, d = fam.g.shape
    a = jnp.einsum("oia,oa->oi", fam.Jp, x[fam.idx_w])  # (O, 2)
    t_o = jnp.einsum("oia,oi->oa", fam.Jl, a)  # (O, d)
    return jnp.zeros((N, d), x.dtype).at[fam.idx_lm].add(t_o)


def _b_u(fam: _Family, u: jnp.ndarray, W: int) -> jnp.ndarray:
    """z = B u per pose: (W, 6) scatter-add of Jp~^T (Jl~ u_n)."""
    c = jnp.einsum("oia,oa->oi", fam.Jl, u[fam.idx_lm])  # (O, 2)
    z_o = jnp.einsum("oia,oi->oa", fam.Jp, c)  # (O, 6)
    return jnp.zeros((W, 6), u.dtype).at[fam.idx_w].add(z_o)


def _schur_matvec(x, Hcc_d, fams, free):
    """S x with gauge projection: fixed poses pass through identity."""
    xf = x * free[:, None]
    out = jnp.einsum("wab,wb->wa", Hcc_d, xf)
    for fam in fams:
        u = jnp.einsum("nde,ne->nd", fam.Hinv, _bt_x(fam, xf))
        out = out - _b_u(fam, u, x.shape[0])
    return out * free[:, None] + x * (1.0 - free)[:, None]


def _precond_blocks(Hcc_d, fams, free):
    """Exact 6x6 diagonal blocks of S, inverted (identity on fixed)."""
    W = Hcc_d.shape[0]
    dtype = Hcc_d.dtype
    C = jnp.zeros((W, 6, 6), dtype)
    for fam in fams:
        K = jnp.einsum(
            "oia,oab,ojb->oij", fam.Jl, fam.Hinv[fam.idx_lm], fam.Jl
        )  # (O, 2, 2)
        C_o = jnp.einsum("oia,oij,ojb->oab", fam.Jp, K, fam.Jp)  # (O, 6, 6)
        C = C.at[fam.idx_w].add(C_o)
    M = Hcc_d - C
    # Jitter keeps the 6x6 solves PD even when a pose has few observations.
    M = M + 1e-6 * jnp.eye(6, dtype=dtype)
    eye = jnp.eye(6, dtype=dtype)
    M = jnp.where(free[:, None, None] > 0, M, eye)
    return jnp.linalg.solve(M, jnp.broadcast_to(eye, M.shape))


def _pcg(matvec, Minv, b, iters: int):
    """Fixed-trip-count preconditioned CG (TPU-idiomatic: no data-dependent
    exit; converged state is simply re-confirmed by later iterations, and a
    tiny rs guard keeps the step finite after convergence)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = jnp.einsum("wab,wb->wa", Minv, r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("wab,wb->wa", Minv, r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return x


@partial(
    jax.jit,
    static_argnames=("cfg", "num_fixed_poses", "cg_iters", "relative_damping"),
)
def ba_solve_implicit(
    problem: BAProblem,
    cam,
    cfg: BaConfig = BaConfig(),
    num_fixed_poses: int = 1,
    cg_iters: int = 64,
    relative_damping: bool = True,
) -> Tuple[BAProblem, BAInfo]:
    """LM over the implicit-Schur reduced system (see module docstring).

    Drop-in replacement for `ba_solve` at window sizes where the dense
    coupling tensor would not fit; `system._global_ba` switches to this
    path above `_IMPLICIT_MIN_W` keyframes.

    `relative_damping`: pixel-unit Jacobians put the camera Hessian's
    diagonal at ~1e5-1e6, so the dense path's ABSOLUTE lambda (1e-4-ish)
    leaves cond(S) ~ 1e9 — a direct solver shrugs, but f32 PCG stalls
    (measured: LM plateaus after 2 accepted steps). Scaling lambda by the
    mean Hcc diagonal (Marquardt's original scheme) keeps the relative
    step bias identical (~1e-4 of typical curvature) while flooring the
    spectrum at sane f32 levels. Set False only to compare single steps
    against `ba_solve` bit-for-tolerance."""
    W = problem.T_cw.shape[0]
    dtype = problem.T_cw.dtype
    free_template = (jnp.arange(W) >= num_fixed_poses).astype(dtype)

    def step(carry, _):
        prob, lam = carry
        with jax.named_scope("iba_linearize"):
            lin_p, lin_l = _linearize(prob, cam, cfg.huber_px)
            cost = _robust_cost(lin_p, lin_l)
        r_p, Jp_pose, Jp_pt, w_p = lin_p
        r_l, Jl_pose, Jl_ln, w_l = lin_l
        with jax.named_scope("iba_build"):
            # Hcc first: the damping scale comes from its diagonal.
            Jw_p = Jp_pose * w_p[:, None, None]
            Hc_p = jnp.einsum("oia,oib->oab", Jw_p, Jp_pose)
            gc_p = jnp.einsum("oia,oi->oa", Jw_p, r_p)
            Jw_l = Jl_pose * w_l[:, None, None]
            Hc_l = jnp.einsum("oia,oib->oab", Jw_l, Jl_pose)
            gc_l = jnp.einsum("oia,oi->oa", Jw_l, r_l)
            Hcc = (
                jnp.zeros((W, 6, 6), dtype).at[prob.pt_w].add(Hc_p)
                .at[prob.ln_w].add(Hc_l)
            )
            gc = (
                jnp.zeros((W, 6), dtype).at[prob.pt_w].add(gc_p)
                .at[prob.ln_w].add(gc_l)
            )
            if relative_damping:
                diag_scale = jnp.maximum(
                    jnp.mean(jnp.trace(Hcc, axis1=-2, axis2=-1)) / 6.0, 1.0
                )
            else:
                diag_scale = jnp.asarray(1.0, dtype)
            lam_eff = lam * diag_scale
            fam_p = _build_family(
                r_p, Jp_pose, Jp_pt, w_p, prob.pt_free,
                prob.pt_w, prob.pt_p, prob.points.shape[0], lam_eff,
            )
            fam_l = _build_family(
                r_l, Jl_pose, Jl_ln, w_l, prob.ln_free,
                prob.ln_w, prob.ln_l, prob.lines.shape[0], lam_eff,
            )
            Hcc_d = Hcc + lam_eff * jnp.eye(6, dtype=dtype)
            fams = (fam_p, fam_l)
            free = free_template
            # Reduced RHS: g_red = gc - B Hinv g  (per family).
            g_red = gc
            for fam in fams:
                u0 = jnp.einsum("nde,ne->nd", fam.Hinv, fam.g)
                g_red = g_red - _b_u(fam, u0, W)
            g_red = g_red * free[:, None]
        with jax.named_scope("iba_pcg"):
            Minv = _precond_blocks(Hcc_d, fams, free)
            delta_c = -_pcg(
                lambda v: _schur_matvec(v, Hcc_d, fams, free), Minv,
                g_red, cg_iters,
            )
            delta_c = delta_c * free[:, None]
        with jax.named_scope("iba_backsub"):
            t_p = _bt_x(fam_p, delta_c)
            delta_p = -jnp.einsum(
                "nde,ne->nd", fam_p.Hinv, fam_p.g + t_p
            )
            t_l = _bt_x(fam_l, delta_c)
            delta_l = -jnp.einsum(
                "nde,ne->nd", fam_l.Hinv, fam_l.g + t_l
            )
        cand = prob._replace(
            T_cw=se3.retract(prob.T_cw, delta_c),
            points=prob.points + delta_p,
            lines=plucker_retract(prob.lines, delta_l),
        )
        lin_p2, lin_l2 = _linearize(cand, cam, cfg.huber_px)
        cost_new = _robust_cost(lin_p2, lin_l2)
        accept = cost_new < cost
        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, prob
        )
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 8.0), 1e-9, 1e6)
        return (prob, lam), cost

    lam0 = jnp.asarray(cfg.damping, dtype)
    (out, _), costs = jax.lax.scan(step, (problem, lam0), None, length=cfg.gn_iters)
    lin_p, lin_l = _linearize(out, cam, cfg.huber_px)
    final_cost = _robust_cost(lin_p, lin_l)
    info = BAInfo(
        cost=jnp.concatenate([costs, final_cost[None]]),
        num_pt_obs=jnp.sum(problem.pt_valid),
        num_ln_obs=jnp.sum(problem.ln_valid),
    )
    return out, info
