"""IMU+wheel initializer tests on simulated data (static + dynamic paths)."""

import numpy as np
import pytest

from plviwo_tpu.init.imu_wheel import IwInitializer, gram_schmidt_from_gravity
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator

import jax.numpy as jnp


def _wheel_wv(sim, t):
    """Odometry-frame (w, v) at time t from the simulator's truth (noisefree
    equivalent of the wheel measurement conversion)."""
    c = sim.cfg
    kin = sim.gt_kin(t)
    R_GtoI = np.asarray(kin["R_GtoI"])
    w_I = np.asarray(kin["w_IinI"])
    R_ItoO = np.asarray(lie.quat_2_rot(jnp.asarray(c.wheel_ext_q)))
    p_IinO = np.asarray(c.wheel_ext_p)
    p_OinI = -R_ItoO.T @ p_IinO
    w_O = R_ItoO @ w_I
    v_body = R_GtoI @ np.asarray(kin["v_IinG"])
    v_O = R_ItoO @ (v_body + np.cross(w_I, p_OinI))
    # the nonholonomic wheel only observes (w_z, v_x)
    return np.array([0.0, 0.0, w_O[2]]), np.array([v_O[0], 0.0, 0.0])


def test_dynamic_init_recovers_biases_and_gravity():
    cfg = SimConfig(duration=8.0, seed=5)
    sim = Simulator(cfg)
    imu_t, imu_w, imu_a = sim.imu_stream()

    wheel_t = sim.wheel_times()
    wv = [_wheel_wv(sim, t) for t in wheel_t]
    wheel_w = np.stack([w for w, _ in wv])
    wheel_v = np.stack([v for _, v in wv])

    R_OtoI = np.asarray(lie.quat_2_rot(jnp.asarray(cfg.wheel_ext_q))).T
    init = IwInitializer(
        gravity_mag=9.81, threshold=0.5, window_time=1.0,
        R_OtoI=R_OtoI, p_IinO=np.asarray(cfg.wheel_ext_p),
    )

    result = None
    # feed growing windows until the smoothness vote passes
    for t_end in np.arange(1.2, 6.0, 0.25):
        i_imu = int(np.searchsorted(imu_t, t_end))
        i_wh = int(np.searchsorted(wheel_t, t_end))
        result = init.try_init(
            imu_t[:i_imu], imu_w[:i_imu], imu_a[:i_imu],
            wheel_t[:i_wh], wheel_w[:i_wh], wheel_v[:i_wh],
        )
        if result is not None:
            break
    assert result is not None, "IW dynamic init never converged"

    t0 = result["t"]
    i0 = int(np.searchsorted(imu_t, t0))
    bg_true = sim.bg_true[i0]
    ba_true = sim.ba_true[i0]
    assert np.linalg.norm(result["bg"] - bg_true) < 0.02, (result["bg"], bg_true)
    assert np.linalg.norm(result["ba"] - ba_true) < 0.35, (result["ba"], ba_true)
    # gravity-aligned orientation: the z column must match the true gravity
    # direction in the IMU frame at t0
    kin = sim.gt_kin(t0)
    R_GtoI_true = np.asarray(kin["R_GtoI"])
    g_dir_true = R_GtoI_true @ np.array([0, 0, 1.0])
    g_dir_est = result["R_GtoI"] @ np.array([0, 0, 1.0])
    assert g_dir_true @ g_dir_est > 0.999, (g_dir_est, g_dir_true)
    # velocity magnitude
    v_mag_true = np.linalg.norm(np.asarray(kin["v_IinG"]))
    assert abs(np.linalg.norm(result["v"]) - v_mag_true) < 0.3


def test_static_init_zero_wheel():
    """Standing still: wheels zero, IMU stationary with biases."""
    rng = np.random.default_rng(0)
    hz = 200.0
    n = 600
    imu_t = np.arange(n) / hz
    bg = np.array([0.002, -0.001, 0.003])
    ba = np.array([0.05, -0.03, 0.02])
    g = np.array([0, 0, 9.81])
    imu_w = bg + rng.normal(0, 1e-4, (n, 3))
    imu_a = ba + g + rng.normal(0, 1e-3, (n, 3))
    wheel_t = np.arange(0, n // 2) / 100.0
    wheel_w = np.zeros((len(wheel_t), 3))
    wheel_v = np.zeros((len(wheel_t), 3))

    init = IwInitializer(window_time=1.0, threshold=0.5)
    result = None
    for t_end in np.arange(1.2, 3.0, 0.2):
        i_imu = int(np.searchsorted(imu_t, t_end))
        i_wh = int(np.searchsorted(wheel_t, t_end))
        result = init.try_init(imu_t[:i_imu], imu_w[:i_imu], imu_a[:i_imu],
                               wheel_t[:i_wh], wheel_w[:i_wh], wheel_v[:i_wh])
        if result is not None:
            break
    assert result is not None
    np.testing.assert_allclose(result["bg"], bg, atol=2e-3)
    np.testing.assert_allclose(result["v"], 0.0, atol=1e-6)
    # when static, horizontal ba is unobservable from gravity tilt (true in
    # the reference as well); check the observable combination instead:
    # accel - ba_est must equal the rotated gravity
    a_mean = imu_a.mean(0)
    recon = result["R_GtoI"].T @ (a_mean - result["ba"])
    np.testing.assert_allclose(recon, [0, 0, 9.81], atol=5e-3)


def test_gram_schmidt():
    g = np.array([0.1, -0.2, 9.7])
    R = gram_schmidt_from_gravity(g)
    np.testing.assert_allclose(R @ np.array([0, 0, 1.0]), g / np.linalg.norm(g),
                               atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
