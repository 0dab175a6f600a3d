"""Descriptor matching as a dense GEMM with on-chip geometric gating.

BASELINE.json:5 mandates this design: "line matching runs as a dense
descriptor-distance GEMM with geometric gating on-chip". The similarity
matrix is one MXU matmul; gates are fused elementwise masks on that matrix;
mutual-nearest + ratio tests are top-k reductions. No data-dependent
control flow — the whole matcher jits into the frontend step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from laneslam.config import MatchConfig
from laneslam.features.containers import Points, Segments


class Matches(NamedTuple):
    """For each slot in A: best slot in B (or -1)."""

    idx: jnp.ndarray  # (Ka,) int32 into B, -1 if unmatched
    valid: jnp.ndarray  # (Ka,) bool
    similarity: jnp.ndarray  # (Ka,) matched similarity (0 if unmatched)

    def num(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


def match_descriptors(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    gate: jnp.ndarray | None = None,
    ratio: float = 0.85,
    cross_check: bool = True,
    min_similarity: float = -jnp.inf,
    allow_pallas: bool = True,
) -> Matches:
    """Generic GEMM matcher on unit-norm descriptors.

    similarity = desc_a @ desc_b.T (one MXU GEMM); distance^2 = 2 - 2 sim.
    Ratio test (Lowe) on distances, mutual-nearest cross check, and an
    optional precomputed (Ka, Kb) boolean gate fused into the score matrix.

    On TPU the whole selection chain runs as one fused Pallas kernel
    (kernels/match.py) that never spills the similarity matrix to HBM;
    the XLA path below is the CPU fallback and the kernel's test oracle.
    """
    from laneslam import kernels
    from laneslam.kernels.match import match_fits_vmem

    # allow_pallas=False routes callers that vmap the matcher (e.g. batched
    # loop verification) to the XLA path: vmap of the Pallas kernel lowers
    # to 1-row blocks that violate the TPU (8, 128) tiling contract.
    if allow_pallas and kernels.use_pallas() and match_fits_vmem(
        desc_a.shape, desc_b.shape
    ):
        from laneslam.kernels.match import match_topk_pallas

        mask = valid_a[:, None] & valid_b[None, :]
        if gate is not None:
            mask = mask & gate
        idx, ok, sim_best = match_topk_pallas(
            desc_a, desc_b, mask,
            ratio=float(ratio), min_similarity=float(min_similarity),
            cross_check=cross_check, interpret=kernels.interpret(),
        )
        return Matches(idx=idx, valid=ok, similarity=sim_best)

    with jax.named_scope("match_gemm"):
        sim = jnp.einsum(
            "ad,bd->ab", desc_a, desc_b, preferred_element_type=jnp.float32
        )
    mask = valid_a[:, None] & valid_b[None, :]
    if gate is not None:
        mask = mask & gate
    neg = jnp.float32(-1e9)
    sim_m = jnp.where(mask, sim, neg)

    top2, top2_idx = jax.lax.top_k(sim_m, 2)  # (Ka, 2)
    best = top2[:, 0]
    best_idx = top2_idx[:, 0]
    # Ratio test on Euclidean distances of unit-norm descriptors.
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[:, 0], 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * top2[:, 1], 1e-12))
    ratio_ok = d1 < ratio * d2
    ok = (best > jnp.maximum(min_similarity, neg * 0.5)) & ratio_ok & valid_a
    if cross_check:
        rev_best = jnp.argmax(sim_m, axis=0)  # (Kb,) best A for each B
        mutual = rev_best[best_idx] == jnp.arange(desc_a.shape[0])
        ok = ok & mutual
    return Matches(
        idx=jnp.where(ok, best_idx, -1),
        valid=ok,
        similarity=jnp.where(ok, best, 0.0),
    )


@partial(jax.jit, static_argnames=("cfg",))
def match_lines(
    segs_a: Segments,
    desc_a: jnp.ndarray,
    segs_b: Segments,
    desc_b: jnp.ndarray,
    cfg: MatchConfig = MatchConfig(),
) -> Matches:
    """Line matching: LBD GEMM + segment-geometry gates (angle/length/midpoint)."""
    # Orientation difference mod pi (segment direction has a sign ambiguity).
    da = segs_a.angle[:, None] - segs_b.angle[None, :]
    da = jnp.abs(jnp.arctan2(jnp.sin(da), jnp.cos(da)))
    da = jnp.minimum(da, jnp.pi - da)
    angle_ok = da < jnp.deg2rad(cfg.max_line_angle_deg)

    len_a = segs_a.length()[:, None]
    len_b = segs_b.length()[None, :]
    r = jnp.maximum(len_a, len_b) / jnp.maximum(jnp.minimum(len_a, len_b), 1e-6)
    length_ok = r < cfg.max_length_ratio

    mid_d = jnp.linalg.norm(
        segs_a.midpoint()[:, None, :] - segs_b.midpoint()[None, :, :], axis=-1
    )
    dist_ok = mid_d < cfg.max_line_dist_px

    gate = angle_ok & length_ok & dist_ok
    return match_descriptors(
        desc_a, desc_b, segs_a.valid, segs_b.valid, gate=gate,
        ratio=cfg.ratio, cross_check=cfg.cross_check,
    )


@partial(jax.jit, static_argnames=("cfg",))
def match_points(
    pts_a: Points,
    desc_a: jnp.ndarray,
    pts_b: Points,
    desc_b: jnp.ndarray,
    cfg: MatchConfig = MatchConfig(),
) -> Matches:
    """Point matching: BRIEF-sign GEMM + spatial proximity gate."""
    d = jnp.linalg.norm(pts_a.uv[:, None, :] - pts_b.uv[None, :, :], axis=-1)
    gate = d < cfg.max_point_dist_px
    return match_descriptors(
        desc_a, desc_b, pts_a.valid, pts_b.valid, gate=gate,
        ratio=cfg.ratio, cross_check=cfg.cross_check,
    )
