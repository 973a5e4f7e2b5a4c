"""Wheel updater tests: preintegration closure + Jacobian FD + VIWO e2e."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.core.layout import StateLayout
from plviwo_tpu.ops import lie
from plviwo_tpu.update import wheel as wheel_up


class TestPreintegration:
    def test_straight_line(self):
        # constant forward velocity, no rotation: p = v*T along x
        n = 21
        ts = np.arange(n) * 0.01
        v = 2.0
        intr = jnp.asarray([0.5, 0.5, 1.0])
        # Wheel3DAng: v = (m2*rr + m1*rl)/2 -> m1 = m2 = v/r
        m = v / 0.5
        R, p, Cov, dR, dp = wheel_up.preintegrate_3d(
            jnp.asarray(ts), jnp.full(n, m), jnp.full(n, m),
            intr, 0.01, 0.01, 0.005, wheel_up.W3D_ANG,
        )
        np.testing.assert_allclose(R, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(p, [v * 0.2, 0, 0], atol=1e-8)
        assert np.all(np.linalg.eigvalsh(np.asarray(Cov)) > 0)

    def test_circular_arc(self):
        # constant v and omega: circular arc of radius v/omega
        n = 101
        dt = 0.01
        ts = np.arange(n) * dt
        v, w = 1.0, 0.5
        rl = rr = 0.5
        b = 1.0
        # v = (m2*rr+m1*rl)/2, w = (m2*rr-m1*rl)/b
        m1 = (v - w * b / 2) / rl
        m2 = (v + w * b / 2) / rr
        intr = jnp.asarray([rl, rr, b])
        R, p, Cov, _, _ = wheel_up.preintegrate_3d(
            jnp.asarray(ts), jnp.full(n, m1), jnp.full(n, m2),
            intr, 0.01, 0.01, 0.005, wheel_up.W3D_ANG,
        )
        T = 1.0
        th = w * T
        # O-frame convention matches the IMU JPL frame integration:
        # R = R_O0toO1 = exp(-th ez) ... check position on the arc
        r_arc = v / w
        p_expect = np.array([r_arc * np.sin(th), r_arc * (1 - np.cos(th)), 0.0])
        np.testing.assert_allclose(p, p_expect, atol=1e-6)
        R_expect = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.0, -th])))
        np.testing.assert_allclose(R, R_expect, atol=1e-8)

    def test_padding_noop(self):
        n = 11
        ts = np.arange(n) * 0.01
        m = np.random.default_rng(0).normal(2.0, 0.1, n)
        intr = jnp.asarray([0.5, 0.5, 1.0])
        out1 = wheel_up.preintegrate_3d(
            jnp.asarray(ts), jnp.asarray(m), jnp.asarray(m), intr,
            0.01, 0.01, 0.005, wheel_up.W3D_ANG)
        tsp = np.concatenate([ts, np.full(5, ts[-1])])
        mp = np.concatenate([m, np.full(5, m[-1])])
        out2 = wheel_up.preintegrate_3d(
            jnp.asarray(tsp), jnp.asarray(mp), jnp.asarray(mp), intr,
            0.01, 0.01, 0.005, wheel_up.W3D_ANG)
        np.testing.assert_allclose(out1[0], out2[0], atol=1e-14)
        np.testing.assert_allclose(out1[1], out2[1], atol=1e-14)
        np.testing.assert_allclose(out1[2], out2[2], atol=1e-18)


class TestLinearSystem:
    def _setup(self):
        rng = np.random.default_rng(5)
        lo = StateLayout(n_clones=4, use_wheel=True)
        C = lo.n_clones
        clone_q = lie.quat_norm(jnp.asarray(rng.normal(size=(C, 4))))
        clone_p = jnp.asarray(rng.normal(size=(C, 3)))
        wheel_q = lie.quat_norm(jnp.asarray(rng.normal(size=4)))
        wheel_p = jnp.asarray(0.1 * rng.normal(size=3))
        return lo, clone_q, clone_p, wheel_q, wheel_p

    def test_jacobian_fd(self):
        lo, clone_q, clone_p, wheel_q, wheel_p = self._setup()
        slot0, slot1 = jnp.asarray(0), jnp.asarray(1)
        # build a consistent "measurement" = model at the current state
        R_ItoO = lie.quat_2_rot(wheel_q)
        p_OinI = -R_ItoO.T @ wheel_p
        R0 = lie.quat_2_rot(clone_q[0]); R1 = lie.quat_2_rot(clone_q[1])
        R_meas = R_ItoO @ R1 @ R0.T @ R_ItoO.T
        p_meas = R_ItoO @ R0 @ (clone_p[1] + R1.T @ p_OinI - clone_p[0] - R0.T @ p_OinI)
        z33 = jnp.zeros((3, 3))

        def system(cq, cp):
            return wheel_up.linear_system_3d(
                cq, cp, cq, cp, slot0, slot1, wheel_q, wheel_p,
                R_meas, p_meas, z33, z33,
                lo.n_clones, lo.clone_off, lo.dim, lo.wheel_ext, lo.wheel_int,
                False, False,
            )

        H, res = system(clone_q, clone_p)
        np.testing.assert_allclose(res, 0.0, atol=1e-10)
        eps = 1e-6
        for slot in (0, 1):
            for i in range(6):
                dq = clone_q
                dp = clone_p
                if i < 3:
                    dth = jnp.zeros(3).at[i].set(eps)
                    dqv = lie.quat_multiply(
                        lie.quat_norm(jnp.concatenate([0.5 * dth, jnp.ones(1)])),
                        clone_q[slot])
                    dq = clone_q.at[slot].set(dqv)
                else:
                    dp = clone_p.at[slot, i - 3].add(eps)
                _, res_p = system(dq, dp)
                col_fd = -np.asarray(res_p) / eps  # res = z - h => dres/dx = -H
                col_H = np.asarray(H)[:, lo.clone(slot) + i]
                np.testing.assert_allclose(
                    col_H, col_fd, atol=2e-5,
                    err_msg=f"H column clone{slot}+{i}",
                )

    def test_dt_column_fd(self):
        """The time-offset column equals the clone-rate chain: advancing both
        clone poses along their (w, v) rates by eps changes the residual by
        -H_dt * eps (r = z - h; a +eps toff error means the measurement covers
        poses at t + eps, reference UpdaterWheel.cpp:400-414)."""
        lo, clone_q, clone_p, wheel_q, wheel_p = self._setup()
        rng = np.random.default_rng(7)
        slot0, slot1 = jnp.asarray(0), jnp.asarray(1)
        w0, v0, w1, v1 = (jnp.asarray(rng.normal(size=3)) for _ in range(4))
        R_ItoO = lie.quat_2_rot(wheel_q)
        p_OinI = -R_ItoO.T @ wheel_p
        R0 = lie.quat_2_rot(clone_q[0]); R1 = lie.quat_2_rot(clone_q[1])
        R_meas = R_ItoO @ R1 @ R0.T @ R_ItoO.T
        p_meas = R_ItoO @ R0 @ (
            clone_p[1] + R1.T @ p_OinI - clone_p[0] - R0.T @ p_OinI)
        z33 = jnp.zeros((3, 3))

        def system(cq, cp, dt_col):
            return wheel_up.linear_system_3d(
                cq, cp, cq, cp, slot0, slot1, wheel_q, wheel_p,
                R_meas, p_meas, z33, z33,
                lo.n_clones, lo.clone_off, lo.dim, lo.wheel_ext, lo.wheel_int,
                False, False, wheel_dt_off=lo.wheel_dt, do_calib_dt=dt_col,
                w0=w0, v0=v0, w1=w1, v1=v1,
            )

        H, res0 = system(clone_q, clone_p, True)
        eps = 1e-6

        def advance(q, p, w, v):
            dq = lie.quat_norm(jnp.concatenate([0.5 * w * eps, jnp.ones(1)]))
            return lie.quat_multiply(dq, q), p + v * eps

        q0n, p0n = advance(clone_q[0], clone_p[0], w0, v0)
        q1n, p1n = advance(clone_q[1], clone_p[1], w1, v1)
        cq = clone_q.at[0].set(q0n).at[1].set(q1n)
        cp = clone_p.at[0].set(p0n).at[1].set(p1n)
        _, res_eps = system(cq, cp, False)
        fd = -(np.asarray(res_eps) - np.asarray(res0)) / eps
        np.testing.assert_allclose(
            np.asarray(H)[:, lo.wheel_dt], fd, atol=2e-5)

    def test_dt_column_fd_2d(self):
        """Same FD identity for the planar 3-row system."""
        lo, clone_q, clone_p, wheel_q, wheel_p = self._setup()
        rng = np.random.default_rng(8)
        slot0, slot1 = jnp.asarray(0), jnp.asarray(1)
        w0, v0, w1, v1 = (jnp.asarray(rng.normal(size=3)) for _ in range(4))
        # consistent measurement at the current state
        H0, res_at = wheel_up.linear_system_2d(
            clone_q, clone_p, clone_q, clone_p, slot0, slot1,
            wheel_q, wheel_p, jnp.asarray(0.0), jnp.zeros(2),
            lo.n_clones, lo.clone_off, lo.dim)
        th_meas = -res_at[0]  # res = meas - pred with meas = 0
        xy_meas = -res_at[1:]

        def system(cq, cp, dt_col):
            return wheel_up.linear_system_2d(
                cq, cp, cq, cp, slot0, slot1, wheel_q, wheel_p,
                th_meas, xy_meas, lo.n_clones, lo.clone_off, lo.dim,
                wheel_dt_off=lo.wheel_dt, do_calib_dt=dt_col,
                w0=w0, v0=v0, w1=w1, v1=v1)

        H, res0 = system(clone_q, clone_p, True)
        eps = 1e-6

        def advance(q, p, w, v):
            dq = lie.quat_norm(jnp.concatenate([0.5 * w * eps, jnp.ones(1)]))
            return lie.quat_multiply(dq, q), p + v * eps

        q0n, p0n = advance(clone_q[0], clone_p[0], w0, v0)
        q1n, p1n = advance(clone_q[1], clone_p[1], w1, v1)
        cq = clone_q.at[0].set(q0n).at[1].set(q1n)
        cp = clone_p.at[0].set(p0n).at[1].set(p1n)
        _, res_eps = system(cq, cp, False)
        fd = -(np.asarray(res_eps) - np.asarray(res0)) / eps
        np.testing.assert_allclose(
            np.asarray(H)[:, lo.wheel_dt], fd, atol=2e-5)


@pytest.mark.slow
def test_viwo_e2e_with_wheel():
    """Full VIWO (points + IMU + wheel) on sim; wheel should not hurt ATE."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    cfg = SimConfig(duration=10.0, seed=3, sigma_pix=0.5, n_pts=40)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.cam.max_msckf = 25
    opts.cam.sigma_pix = 0.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 5.0
    opts.wheel.enabled = True
    opts.wheel.type = "Wheel3DAng"
    opts.wheel.noise_w = 0.05
    opts.wheel.noise_v = 0.05
    opts.wheel.noise_p = 0.02
    opts.wheel.intrinsics = [cfg.wheel_rl, cfg.wheel_rr, cfg.wheel_base]
    opts.wheel.chi2_mult = 10.0

    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    sys_.set_wheel_calibration(cfg.wheel_ext_q, cfg.wheel_ext_p,
                               [cfg.wheel_rl, cfg.wheel_rr, cfg.wheel_base])

    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    sys_.initialize_from(float(imu_t[0]), q0, kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[0], sim.ba_true[0])

    cam_ts = sim.cam_times()
    cam_frames = iter([(float(t),) + sim.cam_frame(t) for t in cam_ts])
    next_cam = next(cam_frames, None)
    wheel_ts = sim.wheel_times()
    wheel_iter = iter([(float(t),) + sim.wheel_sample(t) for t in wheel_ts])
    next_wheel = next(wheel_iter, None)

    for i in range(len(imu_t)):
        while next_wheel is not None and next_wheel[0] <= imu_t[i]:
            sys_.feed_wheel(*next_wheel)
            next_wheel = next(wheel_iter, None)
        while next_cam is not None and next_cam[0] <= imu_t[i]:
            sys_.feed_camera(next_cam[0], next_cam[1], next_cam[2])
            next_cam = next(cam_frames, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])

    errs = [
        np.linalg.norm(p - np.asarray(sim.gt_kin(t)["p_IinG"]))
        for t, q, p in sys_.traj
    ]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert sys_.stats["wheel_accept"] > 30, sys_.stats
    assert rmse < 1.0, f"VIWO RMSE {rmse}"


@pytest.mark.slow
def test_wheel_dt_recovery():
    """Online wheel time-offset calibration: wheel stream delayed by a true
    offset; do_calib_dt must recover it through the CPI-rate dt column
    (reference: UpdaterWheel.cpp:400-414 + the state's cpis side-band)."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    from plviwo_tpu.sim.bspline import figure8_controls

    dt_true = 0.03  # wheel labels = IMU time - dt_true
    cfg = SimConfig(duration=15.0, seed=4, sigma_pix=0.5, n_pts=40)
    # speed-modulated pacing: constant-speed paths are time-shift invariant,
    # so the offset needs longitudinal acceleration to be observable
    controls = figure8_controls(duration=max(cfg.duration + 4.0, 60.0),
                                dt_knot=0.25, speed_mod=0.55, speed_hz=0.4)
    sim = Simulator(cfg, controls=controls)
    opts = EstimatorOptions()
    opts.cam.max_msckf = 25
    opts.cam.sigma_pix = 0.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 5.0
    opts.wheel.enabled = True
    opts.wheel.type = "Wheel3DAng"
    opts.wheel.noise_w = 0.05
    opts.wheel.noise_v = 0.05
    opts.wheel.noise_p = 0.02
    opts.wheel.intrinsics = [cfg.wheel_rl, cfg.wheel_rr, cfg.wheel_base]
    opts.wheel.chi2_mult = 10.0
    opts.wheel.do_calib_dt = True
    opts.wheel.init_cov_dt = 0.05

    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    sys_.set_wheel_calibration(cfg.wheel_ext_q, cfg.wheel_ext_p,
                               [cfg.wheel_rl, cfg.wheel_rr, cfg.wheel_base])

    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    sys_.initialize_from(float(imu_t[0]), q0, kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[0], sim.ba_true[0])

    cam_ts = sim.cam_times()
    cam_frames = iter([(float(t),) + sim.cam_frame(t) for t in cam_ts])
    next_cam = next(cam_frames, None)
    wheel_ts = sim.wheel_times()
    # stream labeled in the (delayed) wheel clock: label = t - dt_true
    wheel_iter = iter(
        [(float(t) - dt_true,) + sim.wheel_sample(t) for t in wheel_ts])
    next_wheel = next(wheel_iter, None)

    for i in range(len(imu_t)):
        while next_wheel is not None and next_wheel[0] <= imu_t[i]:
            sys_.feed_wheel(*next_wheel)
            next_wheel = next(wheel_iter, None)
        while next_cam is not None and next_cam[0] <= imu_t[i]:
            sys_.feed_camera(next_cam[0], next_cam[1], next_cam[2])
            next_cam = next(cam_frames, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])

    dt_est = float(sys_.state.wheel_dt)
    dt_std = float(np.sqrt(np.asarray(
        sys_.state.cov)[sys_.layout.wheel_dt, sys_.layout.wheel_dt]))
    assert sys_.stats["wheel_accept"] > 30, sys_.stats
    err = abs(dt_est - dt_true)
    assert err < 0.015, (
        f"wheel dt not recovered: est {dt_est*1e3:.1f} ms vs true "
        f"{dt_true*1e3:.1f} ms (std {dt_std*1e3:.1f} ms)")
    assert err < 3.5 * dt_std + 0.005, (dt_est, dt_std)
