"""Interpolation tests: linear + polynomial on-manifold, dynamic cloning."""

import jax.numpy as jnp
import numpy as np

from plviwo_tpu.core import dynamic_cloning as dc
from plviwo_tpu.core.interp import interpolate_pose_linear, polynomial_pose
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.bspline import BsplineSE3, figure8_controls


def _spline_poses(ts):
    sp = BsplineSE3(*figure8_controls(duration=60.0, dt_knot=0.25))
    qs, ps = [], []
    for t in ts:
        kin = sp.imu_true(t)
        qs.append(np.asarray(lie.rot_2_quat(kin["R_GtoI"])))
        ps.append(np.asarray(kin["p_IinG"]))
    return sp, np.asarray(qs), np.asarray(ps)


class TestLinear:
    def test_endpoints(self):
        _, qs, ps = _spline_poses([5.0, 5.2])
        for lam, idx in ((0.0, 0), (1.0, 1)):
            R, p = interpolate_pose_linear(
                jnp.asarray(qs[0]), jnp.asarray(ps[0]),
                jnp.asarray(qs[1]), jnp.asarray(ps[1]), lam)
            np.testing.assert_allclose(R, lie.quat_2_rot(jnp.asarray(qs[idx])),
                                       atol=1e-12)
            np.testing.assert_allclose(p, ps[idx], atol=1e-12)

    def test_midpoint_close_to_truth(self):
        sp, qs, ps = _spline_poses([5.0, 5.2])
        R, p = interpolate_pose_linear(
            jnp.asarray(qs[0]), jnp.asarray(ps[0]),
            jnp.asarray(qs[1]), jnp.asarray(ps[1]), 0.5)
        kin = sp.imu_true(5.1)
        # chord-sagitta error ~ v^2 * curvature * dt^2 / 8 ~ 2 mm here
        assert np.linalg.norm(p - np.asarray(kin["p_IinG"])) < 5e-3


class TestPolynomial:
    def test_exact_at_knots(self):
        ts = [5.0, 5.1, 5.2, 5.3]
        _, qs, ps = _spline_poses(ts)
        dts = jnp.asarray(np.asarray(ts[1:]) - ts[0])
        for i, dt in enumerate(np.asarray(dts)):
            R, p = polynomial_pose(
                jnp.asarray(qs[0]), jnp.asarray(ps[0]),
                jnp.asarray(qs[1:]), jnp.asarray(ps[1:]), dts, dt)
            np.testing.assert_allclose(p, ps[i + 1], atol=1e-9)
            np.testing.assert_allclose(
                R, lie.quat_2_rot(jnp.asarray(qs[i + 1])), atol=1e-9)

    def test_beats_linear_between_knots(self):
        ts = [5.0, 5.1, 5.2, 5.3]
        sp, qs, ps = _spline_poses(ts)
        dts = jnp.asarray(np.asarray(ts[1:]) - ts[0])
        t_eval = 5.15
        kin = sp.imu_true(t_eval)
        R3, p3 = polynomial_pose(
            jnp.asarray(qs[0]), jnp.asarray(ps[0]),
            jnp.asarray(qs[1:]), jnp.asarray(ps[1:]), dts, t_eval - ts[0])
        Rl, pl = interpolate_pose_linear(
            jnp.asarray(qs[1]), jnp.asarray(ps[1]),
            jnp.asarray(qs[2]), jnp.asarray(ps[2]), 0.5)
        err3 = np.linalg.norm(p3 - np.asarray(kin["p_IinG"]))
        errl = np.linalg.norm(pl - np.asarray(kin["p_IinG"]))
        assert err3 < errl, (err3, errl)
        assert err3 < 1e-3


class TestDynamicCloning:
    def test_rate_monotone_in_accel(self):
        hz_calm = dc.select_clone_rate(0.01, 0.01, order=1, max_hz=30)
        hz_wild = dc.select_clone_rate(5.0, 3.0, order=1, max_hz=30)
        assert hz_calm < hz_wild

    def test_accel_estimator_smooth_motion(self):
        t = np.arange(400) / 200.0
        w = np.tile([0.0, 0.0, 0.2], (400, 1)) + np.random.default_rng(0).normal(
            0, 0.002, (400, 3))
        a = np.tile([0.0, 0.0, 9.81], (400, 1))
        ang, lin = dc.estimate_accelerations(t, w, a)
        assert ang < 0.5, ang  # noise must not masquerade as acceleration
        assert lin < 0.05
