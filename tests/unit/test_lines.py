import jax
import jax.numpy as jnp
import numpy as np

from laneslam.geometry import se3
from laneslam.geometry.lines import (
    closest_point_to_origin,
    orthonormal_from_plucker,
    orthonormal_retract,
    plucker_from_endpoints,
    plucker_from_orthonormal,
    plucker_from_planes,
    plucker_normalize,
    plucker_retract,
    plucker_transform,
)

KEY = jax.random.PRNGKey(1)


def random_lines(key, n):
    p1, p2 = jax.random.normal(key, (2, n, 3))
    return plucker_from_endpoints(p1, p2 + 2.0), p1, p2 + 2.0


def test_plucker_constraint():
    L, _, _ = random_lines(KEY, 32)
    n, v = L[..., :3], L[..., 3:]
    np.testing.assert_allclose(jnp.sum(n * v, axis=-1), jnp.zeros(32), atol=1e-5)


def test_plucker_transform_matches_point_transform():
    L, p1, p2 = random_lines(KEY, 16)
    T = se3.exp(jnp.array([0.3, -0.2, 0.5, 0.2, 0.1, -0.3]))
    Lt = plucker_transform(T, L)
    Lt2 = plucker_from_endpoints(se3.transform_points(T, p1), se3.transform_points(T, p2))
    # Plücker coords are homogeneous; compare normalized.
    np.testing.assert_allclose(plucker_normalize(Lt), plucker_normalize(Lt2), atol=1e-5)


def test_plane_meet():
    # Line through endpoints = meet of two planes containing it.
    p1 = jnp.array([1.0, 0.0, 2.0])
    p2 = jnp.array([1.0, 1.0, 2.0])  # direction +y through (1, *, 2)
    # Planes x=1 and z=2: [1,0,0,-1], [0,0,1,-2]
    pi1 = jnp.array([1.0, 0.0, 0.0, -1.0])
    pi2 = jnp.array([0.0, 0.0, 1.0, -2.0])
    L = plucker_normalize(plucker_from_planes(pi1, pi2))
    L2 = plucker_normalize(plucker_from_endpoints(p1, p2))
    # Same line up to sign.
    err = min(float(jnp.abs(L - L2).max()), float(jnp.abs(L + L2).max()))
    assert err < 1e-6


def test_closest_point():
    L, p1, p2 = random_lines(KEY, 8)
    c = closest_point_to_origin(L)
    v = L[..., 3:]
    # c on the line: (c - p1) parallel to v.
    cross = jnp.cross(c - p1, v)
    np.testing.assert_allclose(cross, jnp.zeros_like(cross), atol=1e-4)
    # Perpendicularity: c . v = 0.
    np.testing.assert_allclose(jnp.sum(c * v, axis=-1), jnp.zeros(8), atol=1e-4)


def test_orthonormal_roundtrip():
    L, _, _ = random_lines(KEY, 32)
    Ln = L / jnp.linalg.norm(L, axis=-1, keepdims=True)
    U, w = orthonormal_from_plucker(Ln)
    L2 = plucker_from_orthonormal(U, w)
    np.testing.assert_allclose(Ln, L2, atol=1e-5)


def test_orthonormal_retract_zero():
    L, _, _ = random_lines(KEY, 8)
    Ln = L / jnp.linalg.norm(L, axis=-1, keepdims=True)
    L2 = plucker_retract(Ln, jnp.zeros((8, 4)))
    np.testing.assert_allclose(Ln, L2, atol=1e-5)


def test_orthonormal_retract_stays_valid():
    L, _, _ = random_lines(KEY, 8)
    delta = jax.random.normal(KEY, (8, 4)) * 0.1
    L2 = plucker_retract(L, delta)
    n, v = L2[..., :3], L2[..., 3:]
    np.testing.assert_allclose(jnp.sum(n * v, axis=-1), jnp.zeros(8), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(L2, axis=-1), jnp.ones(8), atol=1e-5)
