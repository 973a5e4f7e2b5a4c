"""Simulator tests: spline derivative consistency + IMU closure through the
propagator (dead-reckoning noiseless IMU must track ground truth)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from plviwo_tpu.core import propagator
from plviwo_tpu.core.layout import StateLayout
from plviwo_tpu.core.state import make_state
from plviwo_tpu.ops import cam as cam_ops
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.bspline import BsplineSE3, figure8_controls
from plviwo_tpu.sim.simulator import SimConfig, Simulator

GRAVITY = jnp.array([0.0, 0.0, 9.81], dtype=jnp.float64)


def noiseless_cfg(**kw):
    d = dict(
        sigma_w=0.0, sigma_a=0.0, sigma_wb=0.0, sigma_ab=0.0,
        sigma_pix=0.0, sigma_wheel=0.0, sigma_gps=0.0, duration=8.0,
    )
    d.update(kw)
    return SimConfig(**d)


class TestSpline:
    def test_velocity_matches_fd(self):
        sp = BsplineSE3(*figure8_controls(duration=20.0))
        t = 5.3
        kin = sp.imu_true(t)
        eps = 1e-5
        p1 = np.asarray(sp.pose(t + eps))[:3, 3]
        p0 = np.asarray(sp.pose(t - eps))[:3, 3]
        np.testing.assert_allclose(kin["v_IinG"], (p1 - p0) / (2 * eps), atol=1e-5)

    def test_angular_velocity_matches_fd(self):
        sp = BsplineSE3(*figure8_controls(duration=20.0))
        t = 7.1
        kin = sp.imu_true(t)
        eps = 1e-6
        R0 = np.asarray(sp.pose(t))[:3, :3]
        R1 = np.asarray(sp.pose(t + eps))[:3, :3]
        w_fd = np.asarray(lie.log_so3(jnp.asarray(R0.T @ R1))) / eps
        np.testing.assert_allclose(kin["w_IinI"], w_fd, atol=1e-4)


class TestImuClosure:
    def test_dead_reckoning_tracks_gt(self):
        """Noiseless IMU integrated by the filter's RK4 must match the spline."""
        sim = Simulator(noiseless_cfg())
        t, w, a = sim.imu_stream()
        layout = StateLayout(n_clones=2)
        st = make_state(layout)
        q0, p0 = sim.gt_pose(t[0])
        kin0 = sim.gt_kin(t[0])
        st = st.replace(
            q=q0, p=p0, v=jnp.asarray(kin0["v_IinG"]),
            q_fej=q0, p_fej=p0, v_fej=jnp.asarray(kin0["v_IinG"]),
            time=jnp.asarray(t[0]),
        )
        # integrate 4 seconds in chunks of 50 samples
        hz = sim.cfg.imu_hz
        n_chunk = 50
        n_total = int(4.0 * hz)
        for s in range(0, n_total, n_chunk):
            seg_t = jnp.asarray(t[s : s + n_chunk + 1])
            seg_w = jnp.asarray(w[s : s + n_chunk + 1])
            seg_a = jnp.asarray(a[s : s + n_chunk + 1])
            st = propagator.propagate(
                st, seg_t, seg_w, seg_a, float(seg_t[-1]), GRAVITY,
                (1e-4, 1e-3, 1e-5, 1e-4),
            )
        q_gt, p_gt = sim.gt_pose(float(st.time))
        pos_err = float(jnp.linalg.norm(st.p - p_gt))
        R_est = lie.quat_2_rot(st.q)
        R_gt = lie.quat_2_rot(q_gt)
        ang_err = float(jnp.linalg.norm(lie.log_so3(R_est @ R_gt.T)))
        assert pos_err < 0.05, f"dead-reckoning position error {pos_err}"
        assert ang_err < 0.005, f"dead-reckoning angle error {ang_err}"


class TestCameraSim:
    def test_projections_invert_to_landmarks(self):
        sim = Simulator(noiseless_cfg())
        t = sim.cam_times()[3]
        ids, uv = sim.cam_frame(t)
        assert len(ids) > 10
        kin = sim.gt_kin(t)
        c = sim.cfg
        R_ItoC = np.asarray(lie.quat_2_rot(jnp.asarray(c.cam_ext_q)))
        R_GtoI = np.asarray(kin["R_GtoI"])
        p_I = np.asarray(kin["p_IinG"])
        p_C = (R_ItoC @ R_GtoI @ (sim.landmarks[ids] - p_I).T).T + np.asarray(c.cam_ext_p)
        zn = np.asarray(
            cam_ops.undistort_radtan(jnp.asarray(uv), jnp.asarray(c.intrinsics))
        )
        np.testing.assert_allclose(zn, p_C[:, :2] / p_C[:, 2:3], atol=1e-6)

    def test_ids_persist_across_frames(self):
        sim = Simulator(noiseless_cfg())
        ts = sim.cam_times()
        ids0, _ = sim.cam_frame(ts[0])
        ids1, _ = sim.cam_frame(ts[1])
        assert len(np.intersect1d(ids0, ids1)) > 5


class TestWheelSim:
    def test_straight_motion_rates(self):
        sim = Simulator(noiseless_cfg())
        t = sim.wheel_times()[100]
        psl, psr = sim.wheel_sample(t)
        kin = sim.gt_kin(t)
        v_body = np.asarray(kin["R_GtoI"]) @ np.asarray(kin["v_IinG"])
        c = sim.cfg
        v_recon = (c.wheel_rl * psl + c.wheel_rr * psr) / 2.0
        w_recon = (c.wheel_rr * psr - c.wheel_rl * psl) / c.wheel_base
        np.testing.assert_allclose(v_recon, v_body[0], atol=1e-6)
        np.testing.assert_allclose(w_recon, np.asarray(kin["w_IinI"])[2], atol=1e-6)


def test_gps_sample_matches_gt():
    sim = Simulator(noiseless_cfg())
    t = sim.gps_times()[2]
    p = sim.gps_sample(t)
    kin = sim.gt_kin(t)
    expect = np.asarray(kin["p_IinG"]) + np.asarray(kin["R_GtoI"]).T @ np.asarray(
        sim.cfg.gps_ext_p
    )
    np.testing.assert_allclose(p, expect, atol=1e-9)


def test_imu_stream_finite():
    """The whole IMU stream must be finite (regression: second-order jacfwd
    NaN in exp_so3's trig ratios poisoned ~2.5% of accel samples — every
    knot-adjacent evaluation — which then NaN'd the filter state in the
    images-in benchmark's very first frame)."""
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    for dur, seed in ((6.0, 3), (10.0, 0)):
        sim = Simulator(SimConfig(duration=dur, n_landmarks=10, n_lines=4,
                                  seed=seed))
        t, w, a = sim.imu_stream()
        assert np.isfinite(np.asarray(w)).all(), (dur, seed)
        assert np.isfinite(np.asarray(a)).all(), (dur, seed)
