"""2D wheel model tests: closed-form arcs + consistency with the 3D path."""

import jax.numpy as jnp
import numpy as np

from plviwo_tpu.core.layout import StateLayout
from plviwo_tpu.ops import lie
from plviwo_tpu.update import wheel as wheel_up

INTR = jnp.asarray([0.5, 0.5, 1.0])


def _rates(v, w, n, dt):
    ts = np.arange(n) * dt
    m1 = np.full(n, (v - w * 1.0 / 2) / 0.5)
    m2 = np.full(n, (v + w * 1.0 / 2) / 0.5)
    return jnp.asarray(ts), jnp.asarray(m1), jnp.asarray(m2)


class TestPreint2D:
    def test_straight(self):
        ts, m1, m2 = _rates(2.0, 0.0, 21, 0.01)
        th, xy, Cov = wheel_up.preintegrate_2d(ts, m1, m2, INTR, 0.01, 0.01,
                                               0.005, wheel_up.W2D_ANG)
        np.testing.assert_allclose(float(th), 0.0, atol=1e-12)
        np.testing.assert_allclose(xy, [0.4, 0.0], atol=1e-10)
        assert np.all(np.linalg.eigvalsh(np.asarray(Cov)) > 0)

    def test_arc_matches_closed_form(self):
        v, w, T = 1.0, 0.5, 1.0
        ts, m1, m2 = _rates(v, w, 101, 0.01)
        th, xy, Cov = wheel_up.preintegrate_2d(ts, m1, m2, INTR, 0.01, 0.01,
                                               0.005, wheel_up.W2D_ANG)
        r = v / w
        np.testing.assert_allclose(float(th), -w * T, atol=1e-10)
        np.testing.assert_allclose(
            xy, [r * np.sin(w * T), r * (1 - np.cos(w * T))], atol=1e-8)

    def test_matches_3d_path(self):
        v, w = 1.5, -0.3
        ts, m1, m2 = _rates(v, w, 51, 0.01)
        th, xy, _ = wheel_up.preintegrate_2d(ts, m1, m2, INTR, 0.01, 0.01,
                                             0.005, wheel_up.W2D_ANG)
        R3, p3, *_ = wheel_up.preintegrate_3d(ts, m1, m2, INTR, 0.01, 0.01,
                                              0.005, wheel_up.W3D_ANG)
        np.testing.assert_allclose(
            float(th), float(lie.log_so3(R3)[2]), atol=1e-8)
        np.testing.assert_allclose(xy, np.asarray(p3)[:2], atol=1e-8)


class TestLinearSystem2D:
    def test_zero_residual_and_fd(self):
        rng = np.random.default_rng(2)
        lo = StateLayout(n_clones=4, use_wheel=True)
        # planar poses (yaw-only) so the 2D model is exact
        yaws = rng.uniform(-1, 1, 2)
        qs = []
        for y in yaws:
            qs.append(np.asarray(lie.rot_2_quat(lie.rot_z(jnp.asarray(-y)))))
        clone_q = jnp.asarray(np.stack([qs[0], qs[1], qs[0], qs[1]]))
        clone_p = jnp.asarray(np.concatenate(
            [rng.uniform(-2, 2, (4, 2)), np.zeros((4, 1))], axis=1))
        wheel_q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        wheel_p = jnp.zeros(3)
        slot0, slot1 = jnp.asarray(0), jnp.asarray(1)

        # consistent measurement from the model itself
        R_ItoO = lie.quat_2_rot(wheel_q)
        p_OinI = -R_ItoO.T @ wheel_p
        R0 = lie.quat_2_rot(clone_q[0]); R1 = lie.quat_2_rot(clone_q[1])
        th_meas = jnp.asarray(
            float(lie.log_so3(R_ItoO @ R1 @ R0.T @ R_ItoO.T)[2]))
        d = R_ItoO @ R0 @ (clone_p[1] + R1.T @ p_OinI - clone_p[0] - R0.T @ p_OinI)
        xy_meas = d[:2]

        H, res = wheel_up.linear_system_2d(
            clone_q, clone_p, clone_q, clone_p, slot0, slot1,
            wheel_q, wheel_p, th_meas, xy_meas,
            lo.n_clones, lo.clone_off, lo.dim)
        np.testing.assert_allclose(res, 0.0, atol=1e-10)

        # finite-difference H columns for clone 1 position-x
        eps = 1e-6
        dp = clone_p.at[1, 0].add(eps)
        _, res_p = wheel_up.linear_system_2d(
            clone_q, dp, clone_q, dp, slot0, slot1, wheel_q, wheel_p,
            th_meas, xy_meas, lo.n_clones, lo.clone_off, lo.dim)
        col_fd = -np.asarray(res_p) / eps
        np.testing.assert_allclose(
            np.asarray(H)[:, lo.clone(1) + 3], col_fd, atol=1e-5)
