"""Golden-value + property tests for the JPL Lie substrate.

The reference has no unit tests (SURVEY.md section 4); these are the unit layer
we add, checking the JPL conventions of ov_core `utils/quat_ops.h` against
independently-derived identities and scipy-free hand values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def rand_q(key, shape=()):
    q = jax.random.normal(key, shape + (4,), dtype=jnp.float64)
    return lie.quat_norm(q)


def rand_w(key, shape=(), scale=1.0):
    return scale * jax.random.normal(key, shape + (3,), dtype=jnp.float64)


class TestQuat:
    def test_identity(self):
        q = lie.quat_identity()
        np.testing.assert_allclose(lie.quat_2_rot(q), np.eye(3), atol=1e-15)

    def test_multiply_matches_rotation_composition(self):
        k1, k2 = jax.random.split(KEY)
        q1, q2 = rand_q(k1, (32,)), rand_q(k2, (32,))
        R12 = lie.quat_2_rot(lie.quat_multiply(q1, q2))
        np.testing.assert_allclose(
            R12, lie.quat_2_rot(q1) @ lie.quat_2_rot(q2), atol=1e-12
        )

    def test_inverse(self):
        q = rand_q(KEY, (8,))
        qi = lie.quat_inv(q)
        R = lie.quat_2_rot(lie.quat_multiply(q, qi))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-12)

    def test_rot_quat_roundtrip(self):
        q = rand_q(KEY, (64,))
        q2 = lie.rot_2_quat(lie.quat_2_rot(q))
        # JPL sign convention w>=0 is enforced by quat_norm
        np.testing.assert_allclose(q, q2, atol=1e-9)

    def test_rot_2_quat_golden(self):
        # 90 deg about z: R_GtoI = rot_z(pi/2) rotates G vectors into I
        R = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        q = lie.rot_2_quat(jnp.asarray(R))
        s = np.sqrt(0.5)
        np.testing.assert_allclose(q, [0.0, 0.0, s, s], atol=1e-12)

    def test_omega_derivative(self):
        # qdot = 0.5 Omega(w) q must match finite-difference of exp propagation
        w = jnp.array([0.1, -0.2, 0.3], dtype=jnp.float64)
        q0 = rand_q(KEY)
        dt = 1e-6
        # JPL local perturbation: q(t+dt) = dq(w dt) (x) q(t)
        dq = jnp.concatenate([0.5 * w * dt, jnp.array([1.0])])
        q1 = lie.quat_multiply(lie.quat_norm(dq), q0)
        qdot_fd = (q1 - q0) / dt
        qdot = 0.5 * (lie.omega(w) @ q0[:, None])[:, 0]
        np.testing.assert_allclose(qdot_fd, qdot, atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        # sample within the principal domain |w| < pi (the matrix log returns
        # the principal branch for larger angles, which is correct but not a
        # roundtrip)
        k1, k2 = jax.random.split(KEY)
        direction = rand_w(k1, (64,))
        direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        angle = jax.random.uniform(k2, (64, 1), dtype=jnp.float64, maxval=3.0)
        w = direction * angle
        np.testing.assert_allclose(lie.log_so3(lie.exp_so3(w)), w, atol=1e-9)

    def test_log_principal_branch(self):
        w = jnp.array([2.0, 2.0, 2.0], dtype=jnp.float64)  # |w| > pi
        wl = lie.log_so3(lie.exp_so3(w))
        assert float(jnp.linalg.norm(wl)) <= np.pi + 1e-9
        np.testing.assert_allclose(lie.exp_so3(wl), lie.exp_so3(w), atol=1e-9)

    def test_exp_small_angle(self):
        w = jnp.array([1e-10, -2e-10, 1e-10], dtype=jnp.float64)
        R = lie.exp_so3(w)
        np.testing.assert_allclose(R, np.eye(3) + np.asarray(lie.skew(w)), atol=1e-15)

    def test_exp_golden_90z(self):
        w = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float64)
        R = lie.exp_so3(w)
        np.testing.assert_allclose(
            R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12
        )

    def test_jacobian_identity(self):
        # exp(w + dw) ~ exp(Jl(w) dw) exp(w)
        w = rand_w(KEY, scale=0.8)
        dw = jnp.array([1e-7, -2e-7, 3e-7], dtype=jnp.float64)
        lhs = lie.exp_so3(w + dw)
        rhs = lie.exp_so3((lie.jl_so3(w) @ dw[:, None])[:, 0]) @ lie.exp_so3(w)
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_jr_jl_relation(self):
        w = rand_w(KEY, (16,), scale=1.2)
        np.testing.assert_allclose(lie.jr_so3(w), lie.jl_so3(-w), atol=1e-14)

    def test_jl_inv(self):
        w = rand_w(KEY, (16,), scale=1.2)
        prod = lie.jl_so3(w) @ lie.jl_so3_inv(w)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-10)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 6), dtype=jnp.float64)
        np.testing.assert_allclose(lie.log_se3(lie.exp_se3(xi)), xi, atol=1e-9)

    def test_inverse(self):
        xi = jax.random.normal(KEY, (8, 6), dtype=jnp.float64)
        T = lie.exp_se3(xi)
        np.testing.assert_allclose(
            T @ lie.inv_se3(T), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-12
        )


class TestEuler:
    def test_rpy_roundtrip(self):
        rpy = jnp.array([0.3, -0.4, 1.2], dtype=jnp.float64)
        R = lie.rot_z(rpy[2]) @ lie.rot_y(rpy[1]) @ lie.rot_x(rpy[0])
        np.testing.assert_allclose(lie.rot_2_rpy(R), rpy, atol=1e-12)

    def test_rot_z_golden(self):
        # reference rot_z is the active rotation: rot_z(t) = exp_so3([0,0,t])
        R = lie.rot_z(jnp.pi / 2)
        np.testing.assert_allclose(
            R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12
        )
        np.testing.assert_allclose(
            R, lie.exp_so3(jnp.array([0.0, 0.0, jnp.pi / 2])), atol=1e-12
        )


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda q: lie.log_so3(lie.quat_2_rot(q))))
    q = rand_q(KEY, (128,))
    out = f(q)
    assert out.shape == (128, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_second_derivatives_finite_all_scales():
    """jacfwd^2 of exp_so3/exp_se3/jl_so3 must be finite at EVERY angle.

    Regression for the round-3 images-in bench NaN: with a narrow Taylor
    cutoff (th2 < 1e-14), the exact-branch coefficient 2 sin^2(th/2)/th^2
    emits NaN under second-order jacfwd in a band just above the cutoff
    (measured th in [1.1e-7, 4.7e-7] at f64).  The B-spline simulator
    differentiates the pose map twice (sim/bspline.py imu_true), so any NaN
    here poisons the whole IMU stream.  The fix extends the polynomial
    branch to the `_cancel_cut` threshold.
    """
    axis = jnp.asarray([0.3, -0.5, 0.81], dtype=jnp.float64)
    axis = axis / jnp.linalg.norm(axis)
    rho = jnp.asarray([0.02, 0.05, -0.01], dtype=jnp.float64)
    ths = jnp.asarray(np.logspace(-12, 0.4, 80), dtype=jnp.float64)
    ones = jnp.ones_like(ths)

    def se3(b, th0):
        return lie.exp_se3(b * jnp.concatenate([axis * th0, rho]))

    def so3(b, th0):
        return lie.exp_so3(b * axis * th0)

    def jl(b, th0):
        return lie.jl_so3(b * axis * th0)

    for f in (se3, so3, jl):
        dd = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(f)), in_axes=(0, 0)))
        out = dd(ones, ths)
        assert bool(jnp.all(jnp.isfinite(out))), f
    # f32 too (wider cutoff): angles up to ~0.5 rad
    ths32 = jnp.asarray(np.logspace(-7, -0.3, 40), dtype=jnp.float32)
    axis32, rho32 = axis.astype(jnp.float32), rho.astype(jnp.float32)

    def se3_32(b, th0):
        return lie.exp_se3(b * jnp.concatenate([axis32 * th0, rho32]))

    out32 = jax.jit(jax.vmap(jax.jacfwd(jax.jacfwd(se3_32)), in_axes=(0, 0)))(
        jnp.ones_like(ths32), ths32)
    assert bool(jnp.all(jnp.isfinite(out32)))


def test_exp_so3_taylor_branch_accuracy():
    """The widened Taylor branch must agree with the exact form near the
    cutoff to ~1e-12 (f64): compare against mpmath-free high-precision
    reference computed at f64 via the exact trig at angles safely above
    the cancellation zone, and series symmetry below."""
    axis = jnp.asarray([1.0, 2.0, -0.5], dtype=jnp.float64)
    axis = axis / jnp.linalg.norm(axis)
    # across the f64 cutoff th = 1e-3: R(th) must be continuous
    for th in (9.9e-4, 1.01e-3):
        R = np.asarray(lie.exp_so3(axis * th))
        # Rodrigues with np.float128-free double math (th is large enough
        # that the closed form is accurate here)
        sk = np.asarray(lie.skew(axis))
        R_ref = (np.eye(3) + np.sin(th) * sk
                 + (1.0 - np.cos(th)) * (sk @ sk))
        np.testing.assert_allclose(R, R_ref, atol=1e-12)
