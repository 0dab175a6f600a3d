"""Fused match kernel vs the XLA reference matcher (SURVEY.md §4.1 kernel tier).

Runs the Pallas kernel in interpreter mode on the CPU mesh; on a TPU machine
set LANESLAM_TEST_TPU=1 to exercise the compiled kernel (same assertions).
"""

import jax
import jax.numpy as jnp
import pytest

from laneslam.features.match import match_descriptors
from laneslam.kernels.match import match_topk_pallas

INTERPRET = jax.default_backend() != "tpu"


def _problem(key, Ka=64, Kb=96, D=72, n_dup=32, noise=0.05):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = jax.random.normal(k1, (Ka, D))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = jax.random.normal(k2, (Kb, D))
    b = b.at[:n_dup].set(a[:n_dup] + noise * jax.random.normal(k3, (n_dup, D)))
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    va = jnp.arange(Ka) < Ka - 4
    vb = jnp.arange(Kb) < Kb - 6
    gate = jax.random.uniform(k4, (Ka, Kb)) < 0.9
    return a, b, va, vb, gate


@pytest.mark.parametrize("cross_check", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_match_kernel_equals_xla(seed, cross_check):
    a, b, va, vb, gate = _problem(jax.random.PRNGKey(seed))
    ref = match_descriptors(
        a, b, va, vb, gate=gate, ratio=0.9, cross_check=cross_check
    )
    mask = va[:, None] & vb[None, :] & gate
    idx, ok, sim = match_topk_pallas(
        a, b, mask, ratio=0.9, cross_check=cross_check, interpret=INTERPRET
    )
    assert (idx == ref.idx).all()
    assert (ok == ref.valid).all()
    assert jnp.allclose(sim, ref.similarity, atol=1e-5)
    assert int(ok.sum()) > 10  # the problem has real matches


def test_match_kernel_min_similarity_and_empty():
    a, b, va, vb, gate = _problem(jax.random.PRNGKey(3))
    ref = match_descriptors(
        a, b, va, vb, gate=gate, ratio=0.95, min_similarity=0.8
    )
    mask = va[:, None] & vb[None, :] & gate
    idx, ok, sim = match_topk_pallas(
        a, b, mask, ratio=0.95, min_similarity=0.8, interpret=INTERPRET
    )
    assert (idx == ref.idx).all() and (ok == ref.valid).all()
    # Fully-masked input -> no matches, no NaNs.
    idx, ok, sim = match_topk_pallas(
        a, b, jnp.zeros_like(mask), ratio=0.9, interpret=INTERPRET
    )
    assert not bool(ok.any())
    assert (idx == -1).all()
