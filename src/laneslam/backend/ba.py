"""Sliding-window point+line bundle adjustment (SURVEY.md C9).

BASELINE.json:5: "point+line bundle adjustment ... reformulated as batched
Gauss-Newton with a Schur-complement reduction over landmark blocks".

TPU formulation (no sparse matrices, no data-dependent shapes):
  - observations are fixed-capacity index tables (kf slot, landmark slot, uv)
    with validity masks;
  - per-observation residuals/Jacobians are one vmapped linearization;
  - block assembly is scatter-add into dense per-landmark blocks
    Hpp (Np,3,3) / Hll (Nl,4,4), per-pose blocks Hcc (W,6,6), and the
    camera-landmark coupling tensors B (N, W, 6, d) — dense in (landmark,
    pose) because the window is small (W <= ~10);
  - Schur: S = Hcc - sum_l B_l Hll^-1 B_l^T via batched 3x3/4x4 inverses +
    one einsum (MXU), solved densely (6W x 6W Cholesky-sized);
  - back-substitution + retraction (se3 exp; orthonormal line update).

Mixed 3-dof point and 4-dof line blocks are two batched reductions summed
into one reduced camera system (SURVEY.md §7.3.4). `ba_solve_unreduced`
solves the same normal equations without elimination — the equivalence test
pins the Schur path's correctness (SURVEY.md §4.1).

Gauge: the first `num_fixed_poses` pose blocks are frozen (rows/cols masked,
identity diagonal) — one pose for stereo, and monocular scale is handled by
the caller (GT-scale odometry seeding or Sim3-aligned evaluation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from laneslam.config import BaConfig
from laneslam.kernels.schur import schur_reduce
from laneslam.backend.residuals import (
    huber_weight,
    line_obs_linearize,
    line_residual,
    point_obs_linearize,
    point_residual,
)
from laneslam.geometry import se3
from laneslam.geometry.camera import Camera
from laneslam.geometry.lines import plucker_retract


class BAProblem(NamedTuple):
    """Fixed-capacity window problem. Invalid slots are masked everywhere."""

    T_cw: jnp.ndarray  # (W, 4, 4) world->camera poses
    points: jnp.ndarray  # (Np, 3)
    lines: jnp.ndarray  # (Nl, 6) Plücker
    pt_w: jnp.ndarray  # (Op,) int32 pose slot per point observation
    pt_p: jnp.ndarray  # (Op,) int32 point slot
    pt_uv: jnp.ndarray  # (Op, 2)
    pt_valid: jnp.ndarray  # (Op,) bool
    ln_w: jnp.ndarray  # (Ol,) int32
    ln_l: jnp.ndarray  # (Ol,) int32
    ln_seg: jnp.ndarray  # (Ol, 4) observed segment endpoints
    ln_valid: jnp.ndarray  # (Ol,) bool
    # Optional per-landmark freedom masks (None => all free). A fixed
    # landmark is a CONSTANT: its observations still constrain poses, but it
    # gets no H/B/Schur blocks and no update — used by windowed BA to avoid
    # dragging landmarks that out-of-window keyframes also constrain.
    pt_free: jnp.ndarray | None = None  # (Np,) bool
    ln_free: jnp.ndarray | None = None  # (Nl,) bool


class BAInfo(NamedTuple):
    cost: jnp.ndarray  # (iters + 1,) robust cost before each iter + final
    num_pt_obs: jnp.ndarray
    num_ln_obs: jnp.ndarray


def _linearize(problem: BAProblem, cam: Camera, huber_px: float):
    """Vmapped linearization of every observation slot."""
    Tp = problem.T_cw[problem.pt_w]
    Xp = problem.points[problem.pt_p]
    r_p, Jp_pose, Jp_pt, z = jax.vmap(
        lambda T, X, uv: point_obs_linearize(T, X, uv, cam)
    )(Tp, Xp, problem.pt_uv)
    w_p = (
        huber_weight(r_p, huber_px)
        * problem.pt_valid.astype(r_p.dtype)
        * (z > 1e-3).astype(r_p.dtype)
    )

    Tl = problem.T_cw[problem.ln_w]
    Ll = problem.lines[problem.ln_l]
    r_l, Jl_pose, Jl_ln = jax.vmap(
        lambda T, L, seg: line_obs_linearize(T, L, seg, cam)
    )(Tl, Ll, problem.ln_seg)
    w_l = huber_weight(r_l, huber_px) * problem.ln_valid.astype(r_l.dtype)
    return (r_p, Jp_pose, Jp_pt, w_p), (r_l, Jl_pose, Jl_ln, w_l)


def _assemble(problem: BAProblem, lin_p, lin_l):
    """Scatter-add block assembly. Returns (Hcc, gc, Hpp, gp, Bp, Hll, gl, Bl)."""
    W = problem.T_cw.shape[0]
    Np = problem.points.shape[0]
    Nl = problem.lines.shape[0]
    r_p, Jp_pose, Jp_pt, w_p = lin_p
    r_l, Jl_pose, Jl_ln, w_l = lin_l

    def blocks(r, J_pose, J_lm, w, idx_w, idx_lm, N, d, lm_free):
        # Per-observation weighted products. Fixed landmarks (lm_free=0)
        # contribute to the pose blocks only.
        wf = w if lm_free is None else w * lm_free[idx_lm].astype(w.dtype)
        Jw_pose = J_pose * w[:, None, None]
        Hc = jnp.einsum("oia,oib->oab", Jw_pose, J_pose)  # (O, 6, 6)
        gc_o = jnp.einsum("oia,oi->oa", Jw_pose, r)  # (O, 6)
        Hl = jnp.einsum("oia,oib->oab", J_lm * wf[:, None, None], J_lm)  # (O,d,d)
        gl_o = jnp.einsum("oia,oi->oa", J_lm * wf[:, None, None], r)
        Bo = jnp.einsum("oia,oib->oab", J_pose * wf[:, None, None], J_lm)  # (O, 6, d)

        Hcc = jnp.zeros((W, 6, 6), r.dtype).at[idx_w].add(Hc)
        gc = jnp.zeros((W, 6), r.dtype).at[idx_w].add(gc_o)
        Hlm = jnp.zeros((N, d, d), r.dtype).at[idx_lm].add(Hl)
        glm = jnp.zeros((N, d), r.dtype).at[idx_lm].add(gl_o)
        flat = idx_lm * W + idx_w
        B = (
            jnp.zeros((N * W, 6, d), r.dtype).at[flat].add(Bo).reshape(N, W, 6, d)
        )
        return Hcc, gc, Hlm, glm, B

    Hcc_p, gc_p, Hpp, gp, Bp = blocks(
        r_p, Jp_pose, Jp_pt, w_p, problem.pt_w, problem.pt_p, Np, 3, problem.pt_free
    )
    Hcc_l, gc_l, Hll, gl, Bl = blocks(
        r_l, Jl_pose, Jl_ln, w_l, problem.ln_w, problem.ln_l, Nl, 4, problem.ln_free
    )
    return Hcc_p + Hcc_l, gc_p + gc_l, Hpp, gp, Bp, Hll, gl, Bl


def _schur_solve(Hcc, gc, lm_blocks, damping, num_fixed_poses):
    """Reduce landmark blocks, solve the camera system, back-substitute.

    lm_blocks: list of (H (N,d,d), g (N,d), B (N,W,6,d)) per landmark family.
    Returns (delta_c (W,6), [delta_lm (N,d)]).
    """
    W = Hcc.shape[0]
    dtype = Hcc.dtype
    # Dense (W, W, 6, 6) reduced system, diagonal from damped Hcc.
    S_diag = Hcc + damping * jnp.eye(6, dtype=dtype)
    S_full = jnp.einsum("wab,wv->wvab", S_diag, jnp.eye(W, dtype=dtype))
    g_red = gc

    Hinvs = []
    for H, g, B in lm_blocks:
        d = H.shape[-1]
        N = H.shape[0]
        # Regularize empty blocks so inversion is well-defined; their B and g
        # are zero so they contribute nothing.
        Hd = H + (damping + 1e-8) * jnp.eye(d, dtype=dtype)
        # Fused reduce: closed-form batched block inverse + S/g contraction
        # (kernels/schur.py — Pallas on TPU for large N, XLA elsewhere).
        Hinv, S_c, g_c = schur_reduce(Hd, g, B.reshape(N, W * 6, d))
        Hinvs.append(Hinv)
        S_full = S_full - S_c.reshape(W, 6, W, 6).transpose(0, 2, 1, 3)
        g_red = g_red - g_c.reshape(W, 6)

    # Gauge fix: freeze the first `num_fixed_poses` poses.
    free = (jnp.arange(W) >= num_fixed_poses).astype(dtype)  # (W,)
    S_full = S_full * free[:, None, None, None] * free[None, :, None, None]
    g_red = g_red * free[:, None]
    # Identity on fixed diagonal blocks keeps the dense solve non-singular.
    eye6 = jnp.eye(6, dtype=dtype)
    S_full = S_full + jnp.einsum("wv,ab->wvab", jnp.diag(1.0 - free), eye6)

    A = jnp.transpose(S_full, (0, 2, 1, 3)).reshape(W * 6, W * 6)
    b = g_red.reshape(W * 6)
    delta_c = -jnp.linalg.solve(A, b).reshape(W, 6)
    delta_c = delta_c * free[:, None]

    deltas_lm = []
    for (H, g, B), Hinv in zip(lm_blocks, Hinvs):
        rhs = g + jnp.einsum("nwad,wa->nd", B, delta_c)
        deltas_lm.append(-jnp.einsum("nde,ne->nd", Hinv, rhs))
    return delta_c, deltas_lm


def _residual_cost(problem: BAProblem, cam: Camera, huber_px: float) -> jnp.ndarray:
    """Robust cost WITHOUT Jacobians — for LM candidate evaluation, where
    linearizing (jacfwd per observation) would roughly double the step's
    work only to throw the Jacobians away."""
    r_p, z = jax.vmap(
        lambda T, X, uv: point_residual(T, X, uv, cam)
    )(problem.T_cw[problem.pt_w], problem.points[problem.pt_p], problem.pt_uv)
    w_p = (
        huber_weight(r_p, huber_px)
        * problem.pt_valid.astype(r_p.dtype)
        * (z > 1e-3).astype(r_p.dtype)
    )
    r_l = jax.vmap(
        lambda T, L, seg: line_residual(T, L, seg, cam)
    )(problem.T_cw[problem.ln_w], problem.lines[problem.ln_l], problem.ln_seg)
    w_l = huber_weight(r_l, huber_px) * problem.ln_valid.astype(r_l.dtype)
    return 0.5 * (
        jnp.sum(w_p * jnp.sum(r_p**2, axis=-1))
        + jnp.sum(w_l * jnp.sum(r_l**2, axis=-1))
    )


def _robust_cost(lin_p, lin_l) -> jnp.ndarray:
    r_p, _, _, w_p = lin_p
    r_l, _, _, w_l = lin_l
    return 0.5 * (
        jnp.sum(w_p * jnp.sum(r_p**2, axis=-1))
        + jnp.sum(w_l * jnp.sum(r_l**2, axis=-1))
    )


@partial(jax.jit, static_argnames=("cfg", "num_fixed_poses"))
def ba_solve(
    problem: BAProblem,
    cam: Camera,
    cfg: BaConfig = BaConfig(),
    num_fixed_poses: int = 1,
) -> Tuple[BAProblem, BAInfo]:
    """Levenberg-Marquardt with Schur elimination; fixed iteration count.

    `cam` is a traced pytree argument (NOT static): static would recompile
    per distinct camera and reject traced cameras (e.g. calls from inside
    other jit programs). Measured 66,000 LM iters/s on the attached v5e for
    the 8-KF/5120-obs window (benchmarks/bench_ba.py).

    Adaptive damping with accept/reject keeps the robust cost monotone
    (rejected steps leave the state unchanged and raise lambda) — the
    TPU-idiomatic replacement for data-dependent early exit (SURVEY.md
    §7.3.3): the trip count is static, acceptance is masked state.
    """

    def step(carry, _):
        prob, lam = carry
        with jax.named_scope("ba_linearize"):
            lin_p, lin_l = _linearize(prob, cam, cfg.huber_px)
            cost = _robust_cost(lin_p, lin_l)
        with jax.named_scope("ba_assemble"):
            Hcc, gc, Hpp, gp, Bp, Hll, gl, Bl = _assemble(prob, lin_p, lin_l)
        with jax.named_scope("ba_schur_solve"):
            delta_c, (delta_p, delta_l) = _schur_solve(
                Hcc, gc, [(Hpp, gp, Bp), (Hll, gl, Bl)], lam, num_fixed_poses
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
        lam = jnp.clip(
            jnp.where(accept, lam * 0.3, lam * 8.0), 1e-9, 1e6
        )
        return (prob, lam), cost

    lam0 = jnp.asarray(cfg.damping, problem.T_cw.dtype)
    if cfg.outlier_px > 0:
        # Two-stage LM with mid-solve observation re-gating (the standard
        # BA outlier scheme, e.g. ORB-SLAM's iterate/cull/iterate): Huber
        # tames gross outliers in stage 1; residuals above outlier_px are
        # then masked out before stage 2.
        n1 = max(cfg.gn_iters // 2, 1)
        n2 = max(cfg.gn_iters - n1, 1)
        (mid, lam_mid), costs1 = jax.lax.scan(
            step, (problem, lam0), None, length=n1
        )
        lin_p, lin_l = _linearize(mid, cam, cfg.huber_px)
        r_p = lin_p[0]
        r_l = lin_l[0]
        pt_ok = jnp.linalg.norm(r_p, axis=-1) < cfg.outlier_px
        ln_ok = jnp.linalg.norm(r_l, axis=-1) < cfg.outlier_px
        mid = mid._replace(
            pt_valid=mid.pt_valid & pt_ok, ln_valid=mid.ln_valid & ln_ok
        )
        (out, _), costs2 = jax.lax.scan(step, (mid, lam_mid), None, length=n2)
        # out keeps the culled masks: callers read them as the inlier set.
        costs = jnp.concatenate([costs1, costs2])
    else:
        (out, _), costs = jax.lax.scan(
            step, (problem, lam0), None, length=cfg.gn_iters
        )
    lin_p, lin_l = _linearize(out, cam, cfg.huber_px)
    final_cost = _robust_cost(lin_p, lin_l)
    info = BAInfo(
        cost=jnp.concatenate([costs, final_cost[None]]),
        num_pt_obs=jnp.sum(problem.pt_valid),
        num_ln_obs=jnp.sum(problem.ln_valid),
    )
    return out, info


@partial(jax.jit, static_argnames=("cfg", "num_fixed_poses"))
def ba_solve_unreduced(
    problem: BAProblem,
    cam: Camera,
    cfg: BaConfig = BaConfig(),
    num_fixed_poses: int = 1,
) -> Tuple[BAProblem, BAInfo]:
    """Test oracle: identical normal equations solved densely without Schur.

    One GN step (cfg ignored for iteration count) so the Schur-equivalence
    test can compare a single update vector exactly (SURVEY.md §4.1).
    """
    W = problem.T_cw.shape[0]
    Np = problem.points.shape[0]
    Nl = problem.lines.shape[0]
    dtype = problem.T_cw.dtype
    lin_p, lin_l = _linearize(problem, cam, cfg.huber_px)
    Hcc, gc, Hpp, gp, Bp, Hll, gl, Bl = _assemble(problem, lin_p, lin_l)

    D = 6 * W + 3 * Np + 4 * Nl
    H = jnp.zeros((D, D), dtype)
    g = jnp.zeros((D,), dtype)

    # Camera diagonal.
    for_w = jnp.arange(W)
    Hcc_d = Hcc + cfg.damping * jnp.eye(6, dtype=dtype)

    def put_block(H, A, r0, c0, h, w):
        return jax.lax.dynamic_update_slice(H, A, (r0, c0))

    # Build dense by structured writes (static python loops over capacities
    # are fine: this is the *test oracle*, not the production path).
    for w_i in range(W):
        H = put_block(H, Hcc_d[w_i], 6 * w_i, 6 * w_i, 6, 6)
        g = jax.lax.dynamic_update_slice(g, gc[w_i], (6 * w_i,))
    off_p = 6 * W
    for p_i in range(Np):
        Hd = Hpp[p_i] + (cfg.damping + 1e-8) * jnp.eye(3, dtype=dtype)
        H = put_block(H, Hd, off_p + 3 * p_i, off_p + 3 * p_i, 3, 3)
        g = jax.lax.dynamic_update_slice(g, gp[p_i], (off_p + 3 * p_i,))
        for w_i in range(W):
            H = put_block(H, Bp[p_i, w_i], 6 * w_i, off_p + 3 * p_i, 6, 3)
            H = put_block(H, Bp[p_i, w_i].T, off_p + 3 * p_i, 6 * w_i, 3, 6)
    off_l = off_p + 3 * Np
    for l_i in range(Nl):
        Hd = Hll[l_i] + (cfg.damping + 1e-8) * jnp.eye(4, dtype=dtype)
        H = put_block(H, Hd, off_l + 4 * l_i, off_l + 4 * l_i, 4, 4)
        g = jax.lax.dynamic_update_slice(g, gl[l_i], (off_l + 4 * l_i,))
        for w_i in range(W):
            H = put_block(H, Bl[l_i, w_i], 6 * w_i, off_l + 4 * l_i, 6, 4)
            H = put_block(H, Bl[l_i, w_i].T, off_l + 4 * l_i, 6 * w_i, 4, 6)

    # Gauge: freeze first poses.
    free_rows = jnp.concatenate(
        [
            jnp.repeat(jnp.arange(W) >= num_fixed_poses, 6),
            jnp.ones(3 * Np + 4 * Nl, bool),
        ]
    ).astype(dtype)
    H = H * free_rows[:, None] * free_rows[None, :] + jnp.diag(1.0 - free_rows)
    g = g * free_rows

    delta = -jnp.linalg.solve(H, g)
    delta_c = delta[: 6 * W].reshape(W, 6)
    delta_p = delta[off_p: off_p + 3 * Np].reshape(Np, 3)
    delta_l = delta[off_l:].reshape(Nl, 4)

    out = problem._replace(
        T_cw=se3.retract(problem.T_cw, delta_c),
        points=problem.points + delta_p,
        lines=plucker_retract(problem.lines, delta_l),
    )
    lin_p2, lin_l2 = _linearize(out, cam, cfg.huber_px)
    info = BAInfo(
        cost=jnp.stack([_robust_cost(lin_p, lin_l), _robust_cost(lin_p2, lin_l2)]),
        num_pt_obs=jnp.sum(problem.pt_valid),
        num_ln_obs=jnp.sum(problem.ln_valid),
    )
    return out, info
