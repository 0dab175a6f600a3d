"""Fused Schur-complement landmark reduction kernel (SURVEY.md C9, §3.2).

BASELINE.json:5 mandates "batched Gauss-Newton with a Schur-complement
reduction over landmark blocks" — this kernel is the speed-of-light target
of the BA-iters/s metric (BASELINE.json:2).

Per landmark family (3-dof points or 4-dof lines), given damped Hessian
blocks Hd (N,d,d), gradients g (N,d) and camera-landmark coupling blocks
B (N,W6,d) (W6 = 6*window), compute in ONE pass over B:

    Hinv = Hd^-1                      (closed-form batched block inverse)
    S    = sum_n B_n Hinv_n B_n^T     (the reduced-system contribution)
    gr   = sum_n B_n Hinv_n g_n

The XLA path (`schur_reduce_xla`, also the CPU fallback) does the same with
einsums, which reads B from HBM three times and — crucially — replaces
`jnp.linalg.inv`'s LU loop (scalar-unit bound on TPU) with the same
closed-form inverse. The Pallas kernel additionally fuses the whole chain:
B streams through VMEM once; S and gr accumulate on-chip.

Layouts: the kernel consumes "plane" layouts (d, d, N), (d, N), (d, W6, N)
so the batch dimension N lands on TPU lanes; small d/W6 dims become
sublanes. The wrapper transposes from the natural (N, ...) layouts.

Block inverses: 3x3 via the symmetric adjugate; 4x4 via 2x2 blockwise
inversion (Schur on the trailing 2x2) — valid because Hd = J^T W J + lam*I
is symmetric positive definite. Both are pure VPU elementwise code shared
between the Pallas and XLA paths (`_inv_sym`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Closed-form symmetric block inverses on "nested list of arrays" matrices.
# Entries are arrays of any (broadcast-compatible) shape, so the same code
# serves batched XLA arrays and Pallas (1, NT) vectors.
# ---------------------------------------------------------------------------


def _inv3_sym(m):
    a, b, c = m[0][0], m[0][1], m[0][2]
    d, e = m[1][1], m[1][2]
    f = m[2][2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    idet = 1.0 / (a * A + b * B + c * C)
    return [
        [A * idet, B * idet, C * idet],
        [B * idet, D * idet, E * idet],
        [C * idet, E * idet, F * idet],
    ]


def _inv2(m):
    a, b, c, d = m[0][0], m[0][1], m[1][0], m[1][1]
    idet = 1.0 / (a * d - b * c)
    return [[d * idet, -b * idet], [-c * idet, a * idet]]


def _mul2(x, y):
    return [
        [
            x[0][0] * y[0][0] + x[0][1] * y[1][0],
            x[0][0] * y[0][1] + x[0][1] * y[1][1],
        ],
        [
            x[1][0] * y[0][0] + x[1][1] * y[1][0],
            x[1][0] * y[0][1] + x[1][1] * y[1][1],
        ],
    ]


def _inv4_sym(m):
    P = [[m[0][0], m[0][1]], [m[1][0], m[1][1]]]
    Q = [[m[0][2], m[0][3]], [m[1][2], m[1][3]]]
    R = [[m[2][2], m[2][3]], [m[3][2], m[3][3]]]
    Qt = [[Q[0][0], Q[1][0]], [Q[0][1], Q[1][1]]]
    Pi = _inv2(P)
    X = _mul2(Pi, Q)  # P^-1 Q
    XtQ = _mul2(Qt, X)  # Q^T P^-1 Q
    S2 = [[R[0][0] - XtQ[0][0], R[0][1] - XtQ[0][1]],
          [R[1][0] - XtQ[1][0], R[1][1] - XtQ[1][1]]]
    S2i = _inv2(S2)
    XS = _mul2(X, S2i)  # P^-1 Q S2^-1
    Xt = [[X[0][0], X[1][0]], [X[0][1], X[1][1]]]
    TL = _mul2(XS, Xt)
    TL = [[Pi[0][0] + TL[0][0], Pi[0][1] + TL[0][1]],
          [Pi[1][0] + TL[1][0], Pi[1][1] + TL[1][1]]]
    TR = [[-XS[0][0], -XS[0][1]], [-XS[1][0], -XS[1][1]]]
    return [
        [TL[0][0], TL[0][1], TR[0][0], TR[0][1]],
        [TL[1][0], TL[1][1], TR[1][0], TR[1][1]],
        [TR[0][0], TR[1][0], S2i[0][0], S2i[0][1]],
        [TR[0][1], TR[1][1], S2i[1][0], S2i[1][1]],
    ]


def _matmul_nl(a, b, d: int):
    """Nested-list matmul: c[i][j] = sum_k a[i][k] b[k][j]."""
    out = []
    for i in range(d):
        row = []
        for j in range(d):
            s = a[i][0] * b[0][j]
            for k in range(1, d):
                s = s + a[i][k] * b[k][j]
            row.append(s)
        out.append(row)
    return out


def _newton_refine(m, x, d: int):
    """One Newton step on the inverse: X <- X (2I - M X).

    The closed-form adjugate/block inverses lose ~1 digit vs LU on
    ill-conditioned blocks; one refinement restores it (and stays pure
    VPU elementwise code in both the XLA and Pallas paths).
    """
    mx = _matmul_nl(m, x, d)
    r = [[(2.0 if i == j else 0.0) - mx[i][j] for j in range(d)] for i in range(d)]
    return _matmul_nl(x, r, d)


def _inv_sym(m, d: int):
    # Jacobi equilibration: BA landmark blocks can be near-rank-deficient
    # (one observation + tiny damping => condition ~1e8), where the raw
    # adjugate loses everything in f32 while LU degrades gracefully.
    # Scaling M' = S M S with S = diag(M)^-1/2 brings the diagonal to 1,
    # after which closed form + one Newton step matches LU accuracy.
    s = [jax.lax.rsqrt(jnp.maximum(m[i][i], 1e-30)) for i in range(d)]
    ms = [[m[i][j] * (s[i] * s[j]) for j in range(d)] for i in range(d)]
    if d == 3:
        x = _inv3_sym(ms)
    elif d == 4:
        x = _inv4_sym(ms)
    else:
        raise NotImplementedError(f"block size {d}")
    x = _newton_refine(ms, x, d)
    return [[x[i][j] * (s[i] * s[j]) for j in range(d)] for i in range(d)]


def inv_sym_batched(Hd: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of symmetric PD blocks: (N, d, d) -> (N, d, d)."""
    d = Hd.shape[-1]
    m = [[Hd[..., i, j] for j in range(d)] for i in range(d)]
    inv = _inv_sym(m, d)
    return jnp.stack([jnp.stack(row, axis=-1) for row in inv], axis=-2)


# ---------------------------------------------------------------------------
# XLA reference / CPU fallback.
# ---------------------------------------------------------------------------


def schur_reduce_xla(Hd, g, B):
    """Hd (N,d,d) damped blocks, g (N,d), B (N,W6,d).

    Returns (Hinv (N,d,d), S (W6,W6), gr (W6,)).
    """
    Hinv = inv_sym_batched(Hd)
    C = jnp.einsum("nwd,nde->nwe", B, Hinv)
    S = jnp.einsum("nwe,nve->wv", C, B)
    gr = jnp.einsum("nwe,ne->w", C, g)
    return Hinv, S, gr


# ---------------------------------------------------------------------------
# Pallas TPU kernel.
# ---------------------------------------------------------------------------


def _schur_kernel(d, Hd_ref, g_ref, B_ref, Hinv_ref, S_ref, gr_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        S_ref[:] = jnp.zeros_like(S_ref)
        gr_ref[:] = jnp.zeros_like(gr_ref)

    # Damped Hessian blocks as (1, NT) component planes.
    m = [[Hd_ref[i, j, :][None, :] for j in range(d)] for i in range(d)]
    inv = _inv_sym(m, d)
    for i in range(d):
        for j in range(d):
            Hinv_ref[i, j, :] = inv[i][j][0]

    S_acc = S_ref[:]
    gr_acc = gr_ref[:]
    for e in range(d):
        # C_e[w6, n] = sum_d' B[d', w6, n] * Hinv[d', e, n]
        Ce = B_ref[0] * inv[0][e]
        for dp in range(1, d):
            Ce = Ce + B_ref[dp] * inv[dp][e]
        # S += C_e B_e^T (contract over lanes) — one MXU GEMM per component.
        S_acc = S_acc + jax.lax.dot_general(
            Ce, B_ref[e],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gr_acc = gr_acc + jnp.sum(Ce * g_ref[e, :][None, :], axis=1)[None, :]
    S_ref[:] = S_acc
    gr_ref[:] = gr_acc


def _pallas_tile_n(d: int, W6: int, cap_bytes: int = 12 * 2**20) -> int:
    """Largest lane-aligned batch tile whose VMEM working set fits.

    Working set per grid step: the S/gr accumulators (single-buffered,
    (W6, W6) + (1, W6) f32) plus the double-buffered per-N planes (B in
    (d, W6, NT), Hd in (d, d, NT), g in (d, NT), Hinv out (d, d, NT)).
    Returns 0 when even NT=128 does not fit (huge windows, e.g. global BA
    at W=128+) — the dispatcher then takes the XLA path, whose einsums
    accumulate through HBM without a VMEM cliff.

    Model calibrated against the compiler's scoped-vmem accounting: the
    observed 18.99 MB failure at (d=4, W6=768, NT=512) decomposes as
    double-buffered S/gr accumulators + double-buffered B/Hd/g/Hinv planes
    + the (W6, NT) Ce scratch — this formula reproduces it to 0.1%."""
    fixed = 2 * (W6 * W6 + W6) * 4
    per_n = 4 * (2 * d * W6 + W6 + 4 * d * d + 2 * d)
    nt = (cap_bytes - fixed) // per_n
    return max(0, nt // 128 * 128)


@partial(jax.jit, static_argnames=("interpret", "tile_n"))
def schur_reduce_pallas(Hd, g, B, interpret: bool = False, tile_n: int = 512):
    """Same contract as `schur_reduce_xla` (Hd already damped)."""
    N, d, _ = Hd.shape
    W6 = B.shape[1]
    NT = min(tile_n, max(128, 128 * -(-N // 128)))
    Npad = -(-N // NT) * NT
    if Npad != N:
        pad = Npad - N
        # Identity-pad Hd so padded blocks stay invertible; B/g pad to zero,
        # so padded landmarks contribute nothing to S/gr.
        Hd = jnp.concatenate(
            [Hd, jnp.broadcast_to(jnp.eye(d, dtype=Hd.dtype), (pad, d, d))]
        )
        g = jnp.concatenate([g, jnp.zeros((pad, d), g.dtype)])
        B = jnp.concatenate([B, jnp.zeros((pad, W6, d), B.dtype)])

    Hd_p = jnp.transpose(Hd, (1, 2, 0))  # (d, d, Npad)
    g_p = jnp.transpose(g, (1, 0))  # (d, Npad)
    B_p = jnp.transpose(B, (2, 1, 0))  # (d, W6, Npad)

    grid = (Npad // NT,)
    Hinv_p, S, gr = pl.pallas_call(
        partial(_schur_kernel, d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d, NT), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, NT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, W6, NT), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, d, NT), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W6, W6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W6), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, d, Npad), jnp.float32),
            jax.ShapeDtypeStruct((W6, W6), jnp.float32),
            jax.ShapeDtypeStruct((1, W6), jnp.float32),
        ),
        interpret=interpret,
    )(Hd_p.astype(jnp.float32), g_p.astype(jnp.float32), B_p.astype(jnp.float32))

    Hinv = jnp.transpose(Hinv_p, (2, 0, 1))[:N]
    return Hinv, S, gr[0]


def schur_reduce(Hd, g, B):
    """Dispatching entry: B must be (N, W6, d); Hd pre-damped.

    Measured on TPU v5e (see benchmarks/bench_schur.py): the closed-form
    XLA path wins below ~2k landmark blocks (the Pallas layout transposes
    dominate); the fused kernel wins above (189us vs 306us at N=8192, d=3;
    both are 10-40x faster than the `jnp.linalg.inv` LU path XLA emits).
    N is static, so the branch is resolved at trace time.
    """
    from laneslam import kernels

    nt = _pallas_tile_n(Hd.shape[-1], B.shape[1])
    if kernels.use_pallas() and Hd.shape[0] >= 2048 and nt >= 128:
        return schur_reduce_pallas(
            Hd, g, B, interpret=kernels.interpret(), tile_n=min(512, nt)
        )
    return schur_reduce_xla(Hd, g, B)
