"""geometry/sim3.py: exp/log round-trips, group axioms, point action."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from laneslam.geometry import se3, sim3


def _rand_xi(key, scale=1.0):
    xi = jax.random.normal(key, (7,)) * scale
    return xi.at[6].set(jnp.clip(xi[6], -1.0, 1.0))


@pytest.mark.parametrize("scale", [1.0, 0.3, 1e-4])
def test_exp_log_roundtrip(scale):
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    for k in keys:
        xi = _rand_xi(k, scale)
        back = sim3.log(sim3.exp(xi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   rtol=2e-4, atol=2e-5)


def test_small_sigma_matches_se3():
    """sigma = 0 reduces exactly to SE(3) exp."""
    key = jax.random.PRNGKey(3)
    xi6 = jax.random.normal(key, (6,)) * 0.7
    T, s = sim3.exp(jnp.concatenate([xi6, jnp.zeros(1)]))
    np.testing.assert_allclose(np.asarray(T), np.asarray(se3.exp(xi6)),
                               rtol=1e-5, atol=1e-6)
    assert float(s) == pytest.approx(1.0, abs=1e-7)


def test_compose_inverse_identity():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    A = sim3.exp(_rand_xi(k1))
    B = sim3.exp(_rand_xi(k2))
    AB = sim3.compose(A, B)
    I_T, I_s = sim3.compose(sim3.inverse(A), A)
    np.testing.assert_allclose(np.asarray(I_T), np.eye(4), atol=1e-5)
    assert float(I_s) == pytest.approx(1.0, abs=1e-5)
    # action consistency: (A o B)(X) == A(B(X))
    X = jax.random.normal(jax.random.PRNGKey(5), (11, 3))
    np.testing.assert_allclose(
        np.asarray(sim3.transform_points(AB, X)),
        np.asarray(sim3.transform_points(A, sim3.transform_points(B, X))),
        rtol=1e-4, atol=1e-5,
    )


def test_exp_jacfwd_finite():
    """PGO linearizes via jacfwd through exp at 0 — the small-angle
    branches must be differentiable there."""
    f = lambda xi: sim3.log(
        sim3.compose(sim3.exp(_rand_xi(jax.random.PRNGKey(7))),
                     sim3.exp(xi))
    )
    J = jax.jacfwd(f)(jnp.zeros(7))
    assert np.all(np.isfinite(np.asarray(J)))
    assert np.linalg.matrix_rank(np.asarray(J)) == 7
