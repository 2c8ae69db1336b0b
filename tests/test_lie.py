"""Unit tests for the pure-JAX Lie groups vs closed-form truths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from super_primitive_tpu.lie import se3, so3


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rng().normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_identity(self):
        R = np.asarray(so3.exp(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-7)

    def test_log_roundtrip(self):
        w = rng(1).normal(size=(64, 3)).astype(np.float32)
        # keep |w| < pi so log is unique
        w = w / (1.0 + np.linalg.norm(w, axis=-1, keepdims=True)) * 2.5
        w_back = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
        np.testing.assert_allclose(w_back, w, atol=1e-4)

    def test_log_small_angle(self):
        w = np.array([1e-9, -2e-9, 3e-10], dtype=np.float32)
        w_back = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
        assert np.all(np.isfinite(w_back))

    def test_quat_matrix_roundtrip(self):
        q = Rotation.from_rotvec(rng(2).normal(size=(16, 3))).as_quat()  # xyzw
        q_wxyz = np.concatenate([q[:, 3:], q[:, :3]], axis=1).astype(np.float32)
        R = np.asarray(so3.quat_to_matrix(jnp.asarray(q_wxyz)))
        R_ref = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)
        q_back = np.asarray(so3.matrix_to_quat(jnp.asarray(R)))
        # quaternion sign ambiguity
        sign = np.sign(np.sum(q_back * q_wxyz, axis=1, keepdims=True))
        np.testing.assert_allclose(q_back * sign, q_wxyz, atol=1e-5)

    def test_renormalize_projects_to_so3(self):
        w = rng(3).normal(size=(8, 3)).astype(np.float32)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        R_noisy = R + 0.01 * rng(4).normal(size=R.shape).astype(np.float32)
        R_fixed = np.asarray(so3.renormalize(jnp.asarray(R_noisy)))
        eye = np.einsum("bij,bkj->bik", R_fixed, R_fixed)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        det = np.linalg.det(R_fixed)
        np.testing.assert_allclose(det, np.ones(8), atol=1e-5)

    def test_grad_finite_at_identity(self):
        g = jax.grad(lambda w: jnp.sum(so3.exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_hat_vee(self):
        w = jnp.asarray(rng(5).normal(size=(4, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(so3.vee(so3.hat(w))), np.asarray(w))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rng(6).normal(size=(32, 6)).astype(np.float32)
        xi[:, :3] *= 0.8  # keep rotations well below pi
        T = se3.exp(jnp.asarray(xi))
        xi_back = np.asarray(se3.log(T))
        np.testing.assert_allclose(xi_back, xi, atol=1e-4)

    def test_exp_identity(self):
        T = np.asarray(se3.exp(jnp.zeros(6)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_exp_pure_translation(self):
        xi = jnp.asarray([0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
        T = np.asarray(se3.exp(xi))
        expected = np.eye(4)
        expected[:3, 3] = [1.0, 2.0, 3.0]
        np.testing.assert_allclose(T, expected, atol=1e-6)

    def test_inverse(self):
        xi = rng(7).normal(size=(8, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        prod = np.asarray(T @ se3.inverse(T))
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_retract_identity_delta(self):
        xi = rng(8).normal(size=(6,)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        T2 = np.asarray(se3.retract(T, jnp.zeros(6)))
        np.testing.assert_allclose(T2, np.asarray(T), atol=1e-5)

    def test_retract_composition(self):
        T = se3.exp(jnp.asarray(rng(9).normal(size=6).astype(np.float32)))
        delta = jnp.asarray(0.01 * rng(10).normal(size=6).astype(np.float32))
        T2 = np.asarray(se3.retract(T, delta))
        expected = np.asarray(T) @ np.asarray(se3.exp(delta))
        np.testing.assert_allclose(T2, expected, atol=1e-5)

    def test_quat_trans_roundtrip(self):
        xi = rng(11).normal(size=(8, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        q, t = se3.to_quat_trans(T)
        T_back = np.asarray(se3.from_quat_trans(q, t))
        np.testing.assert_allclose(T_back, np.asarray(T), atol=1e-5)

    def test_random_near_identity(self):
        T = np.asarray(se3.random(jax.random.PRNGKey(0), sigma=1e-4))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-3)

    def test_grad_of_log_at_identity(self):
        # regression: backprop through log at/near identity must stay finite
        for T in [jnp.eye(4), se3.exp(1e-6 * jnp.ones(6))]:
            g = jax.grad(lambda xi: jnp.sum(se3.log(T @ se3.exp(xi)) ** 2))(
                jnp.zeros(6)
            )
            assert np.all(np.isfinite(np.asarray(g))), g

    def test_grad_through_retraction(self):
        T0 = se3.exp(jnp.asarray(rng(12).normal(size=6).astype(np.float32)))

        def loss(delta):
            T = se3.retract(T0, delta)
            return jnp.sum(T[:3, 3] ** 2)

        g = jax.grad(loss)(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestSim3:
    def test_exp_identity(self):
        from super_primitive_tpu.lie import sim3

        T = np.asarray(sim3.exp(jnp.zeros(7)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)

    def test_exp_log_roundtrip(self):
        from super_primitive_tpu.lie import sim3

        xi = rng(20).normal(size=(16, 7)).astype(np.float32)
        xi[:, :3] *= 0.6
        xi[:, 6] *= 0.3
        T = sim3.exp(jnp.asarray(xi))
        back = np.asarray(sim3.log(T))
        np.testing.assert_allclose(back, xi, atol=2e-4)

    def test_reduces_to_se3_at_zero_scale(self):
        from super_primitive_tpu.lie import sim3

        xi6 = rng(21).normal(size=(8, 6)).astype(np.float32) * 0.5
        xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], axis=1)
        T_sim = np.asarray(sim3.exp(jnp.asarray(xi7)))
        T_se = np.asarray(se3.exp(jnp.asarray(xi6)))
        np.testing.assert_allclose(T_sim, T_se, atol=1e-5)

    def test_scale_and_inverse(self):
        from super_primitive_tpu.lie import sim3

        xi = jnp.asarray([0.2, -0.1, 0.3, 0.5, -0.2, 0.1, 0.4])
        T = sim3.exp(xi)
        np.testing.assert_allclose(float(sim3.scale_of(T)), np.exp(0.4), rtol=1e-5)
        prod = np.asarray(T @ sim3.inverse(T))
        np.testing.assert_allclose(prod, np.eye(4), atol=1e-5)
