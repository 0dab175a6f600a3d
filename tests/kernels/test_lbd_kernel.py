"""Fused LBD band-reduction kernel vs the XLA reference (SURVEY.md §4.1).

Runs the Pallas kernel in interpreter mode on the CPU mesh; on a TPU machine
set LANESLAM_TEST_TPU=1 to exercise the compiled kernel (same assertions).
"""

import jax
import jax.numpy as jnp

from laneslam.config import LbdConfig
from laneslam.features.containers import Segments
from laneslam.features.lbd import describe_lines
from laneslam.kernels.lbd import lbd_reduce_pallas, lbd_reduce_xla

INTERPRET = jax.default_backend() != "tpu"


def _problem(key, K=64, M=63, m=9):
    k1, k2 = jax.random.split(key)
    rowvec = jax.random.uniform(k1, (K, M, 4), jnp.float32, 0.0, 3.0)
    # Band weights like features/lbd.py builds: rows near each band center.
    Wb = jax.random.uniform(k2, (m, M), jnp.float32)
    Wb = Wb / jnp.sum(Wb, axis=1, keepdims=True)
    valid = jnp.arange(K) < K - 5
    return rowvec, Wb, valid


def test_lbd_kernel_equals_xla():
    for seed in range(3):
        rowvec, Wb, valid = _problem(jax.random.PRNGKey(seed))
        ref = lbd_reduce_xla(rowvec, Wb, valid)
        out = lbd_reduce_pallas(rowvec, Wb, valid, interpret=INTERPRET)
        assert out.shape == ref.shape
        assert jnp.allclose(out, ref, atol=1e-5), float(
            jnp.abs(out - ref).max()
        )
        # Invalid slots are exactly zero; valid descriptors unit-ish halves.
        assert (out[~valid] == 0.0).all()
        h = out.shape[-1] // 2
        norms = jnp.linalg.norm(out[valid, :h], axis=-1)
        assert jnp.allclose(norms, 1.0, atol=1e-4)


def test_lbd_kernel_zero_rows_no_nan():
    rowvec = jnp.zeros((16, 63, 4), jnp.float32)
    Wb = jnp.ones((9, 63), jnp.float32) / 63.0
    valid = jnp.ones((16,), bool)
    out = lbd_reduce_pallas(rowvec, Wb, valid, interpret=INTERPRET)
    assert jnp.isfinite(out).all()


def test_describe_lines_dispatch_consistent(monkeypatch):
    """End-to-end describe_lines is identical under both kernel modes."""
    import laneslam.kernels as kernels

    key = jax.random.PRNGKey(7)
    img = jax.random.uniform(key, (96, 128), jnp.float32, 0, 255)
    K = 16
    xy = jax.random.uniform(jax.random.PRNGKey(8), (K, 4), jnp.float32, 10, 80)
    d = xy[:, 2:] - xy[:, :2]
    segs = Segments(
        xyxy=xy,
        angle=jnp.arctan2(d[:, 1], d[:, 0]),
        width=jnp.full((K,), 2.0),
        score=jnp.ones((K,)),
        valid=jnp.arange(K) < 12,
    )
    cfg = LbdConfig()

    # The dispatch happens at trace time, so the jit cache must be dropped
    # when the kernel mode changes.
    monkeypatch.setenv("LANESLAM_KERNELS", "xla")
    kernels.mode.cache_clear()
    describe_lines.clear_cache()
    ref = describe_lines(img, segs, cfg)

    monkeypatch.setenv(
        "LANESLAM_KERNELS", "interpret" if INTERPRET else "pallas"
    )
    kernels.mode.cache_clear()
    describe_lines.clear_cache()
    out = describe_lines(img, segs, cfg)

    kernels.mode.cache_clear()
    describe_lines.clear_cache()
    assert jnp.allclose(out, ref, atol=1e-5)
