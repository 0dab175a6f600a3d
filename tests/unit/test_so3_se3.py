import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laneslam.geometry import se3, so3


KEY = jax.random.PRNGKey(0)


def random_twists(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * scale


class TestSO3:
    def test_hat_vee_roundtrip(self):
        w = jax.random.normal(KEY, (32, 3))
        np.testing.assert_allclose(so3.vee(so3.hat(w)), w, atol=1e-6)

    def test_exp_is_rotation(self):
        w = jax.random.normal(KEY, (64, 3)) * 2.0
        R = so3.exp(w)
        I = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(I, R.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(64), atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = jax.random.normal(KEY, (64, 3))  # |w| < pi w.h.p.
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1.0) * 2.0
        np.testing.assert_allclose(so3.log(so3.exp(w)), w, atol=1e-4)

    def test_small_angle(self):
        w = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-7)
        np.testing.assert_allclose(so3.log(R), jnp.zeros((2, 3)), atol=1e-6)

    def test_left_jacobian_vs_numeric(self):
        # J_l(w) column i = d/deps exp(w + eps e_i) "pulled back": use the
        # identity exp(w+dw) ≈ exp(J_l dw) exp(w).
        w = jnp.array([0.3, -0.2, 0.5])
        J = so3.left_jacobian(w)
        eps = 1e-4
        for i in range(3):
            dw = jnp.zeros(3).at[i].set(eps)
            lhs = so3.exp(w + dw) @ so3.exp(w).T
            num = so3.log(lhs) / eps
            np.testing.assert_allclose(J[:, i], num, atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = random_twists(KEY, 64, 0.7)
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-4)

    def test_inverse(self):
        xi = random_twists(KEY, 16)
        T = se3.exp(xi)
        np.testing.assert_allclose(
            T @ se3.inverse(T), jnp.broadcast_to(jnp.eye(4), T.shape), atol=1e-5
        )

    def test_transform_points(self):
        T = se3.exp(jnp.array([0.1, 0.2, 0.3, 0.1, -0.2, 0.05]))
        X = jax.random.normal(KEY, (10, 3))
        Xh = jnp.concatenate([X, jnp.ones((10, 1))], axis=-1)
        expect = (T @ Xh.T).T[:, :3]
        np.testing.assert_allclose(se3.transform_points(T, X), expect, atol=1e-5)

    def test_retract_identity(self):
        T = se3.exp(random_twists(KEY, 4))
        np.testing.assert_allclose(se3.retract(T, jnp.zeros((4, 6))), T, atol=1e-6)

    def test_adjoint(self):
        # Ad_T xi satisfies T exp(xi) T^-1 = exp(Ad_T xi).
        T = se3.exp(jnp.array([0.2, -0.1, 0.4, 0.3, 0.2, -0.1]))
        xi = jnp.array([0.01, 0.02, -0.01, 0.005, -0.02, 0.01])
        lhs = T @ se3.exp(xi) @ se3.inverse(T)
        rhs = se3.exp(se3.adjoint(T) @ xi)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)
