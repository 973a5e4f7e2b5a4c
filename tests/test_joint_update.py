"""Joint vs sequential multi-sensor update: the fused step applies all
whitened compressed rows in one EKF update (one covariance rewrite); the
difference vs the sequential per-sensor order is second order in the
per-frame correction and must stay far below measurement noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_joint_matches_sequential_to_second_order():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import (
        SIGMA_LINE, WHEEL_NOISE, _example_inputs_full)
    from plviwo_tpu.core import ekf, propagator
    from plviwo_tpu.core.state import newest_clone_slot
    from plviwo_tpu.core.step import (
        _auto_marginalize, _camera_msckf_update, _line_msckf_update,
        _wheel_update_fused, fused_step_full)

    args = _example_inputs_full()
    (state, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
     luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid,
     gravity, sigmas, sp, cm) = args

    joint, metrics = fused_step_full(
        state, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
        luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid,
        gravity, sigmas, sp, cm, SIGMA_LINE, WHEEL_NOISE)
    assert int(metrics["accepted"]) > 0
    assert int(metrics["lines_accepted"]) > 0
    assert int(metrics["wheel_accepted"]) > 0

    # sequential reference
    st = propagator.propagate(state, imu_t, imu_w, imu_a, t_new, gravity,
                              sigmas)
    st = _auto_marginalize(st, t_new, 1.0)
    slot0 = newest_clone_slot(st)
    st = ekf.augment_clone(st)
    slot1 = newest_clone_slot(st)
    st, _ = _camera_msckf_update(st, ouv, ouvn, oslot, ovalid, sp, cm, 0,
                                 jnp.float64)
    st, _ = _line_msckf_update(st, luv, luvn, lslot, lvalid, SIGMA_LINE, cm)
    st, _ = _wheel_update_fused(st, slot0, slot1, wt, wm1, wm2, wvalid,
                                WHEEL_NOISE, cm, 3)

    dp = float(jnp.max(jnp.abs(joint.p - st.p)))
    dcl = float(jnp.max(jnp.abs(joint.clone_p - st.clone_p)))
    dcov = float(jnp.max(jnp.abs(joint.cov - st.cov)))
    # second-order in the (sub-millimeter) per-frame correction
    assert dp < 1e-4, dp
    assert dcl < 1e-4, dcl
    assert dcov < 1e-5, dcov


def _live_replay(joint: bool, slam: int = 0, gps: bool = False):
    """Short lines+wheel live replay with small shapes; returns (rmse, stats,
    system).  slam/gps extend the parity check to the SLAM-landmark and GPS
    paths (round-3 VERDICT item 2)."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.ops import lie
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    cfg = SimConfig(duration=6.0, seed=4, sigma_pix=0.5, n_pts=24, n_lines=10)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.joint_update = joint
    opts.clone_freq = 10
    opts.cam.n_pts = 30
    opts.cam.max_msckf = 12
    opts.cam.sigma_pix = 0.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 5.0
    opts.cam.use_lines = True
    opts.cam.max_lines = 6
    opts.cam.max_slam = slam
    opts.wheel.enabled = True
    if gps:
        opts.gps.enabled = True
        opts.gps.noise = 0.5
        opts.gps.init_distance = 3.0
    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    sys_.set_wheel_calibration(cfg.wheel_ext_q, cfg.wheel_ext_p,
                               [cfg.wheel_rl, cfg.wheel_rr, cfg.wheel_base])

    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    sys_.initialize_from(float(imu_t[0]), lie.rot_2_quat(kin0["R_GtoI"]),
                         kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[0], sim.ba_true[0])
    wheel = [(float(t),) + sim.wheel_sample(t) for t in sim.wheel_times()]
    cam_ts = sim.cam_times()
    frames = iter(sorted(
        (float(t), sim.cam_frame(t), sim.line_frame(t)) for t in cam_ts))
    gps_iter = iter(sorted(
        (float(t), sim.gps_sample(t)) for t in sim.gps_times())) if gps \
        else iter([])
    nxt_gps = next(gps_iter, None)
    nxt = next(frames, None)
    wi = 0
    for i in range(len(imu_t)):
        while wi < len(wheel) and wheel[wi][0] <= imu_t[i]:
            sys_.feed_wheel(*wheel[wi])
            wi += 1
        while nxt is not None and nxt[0] <= imu_t[i]:
            t_c, (ids, uvs), (lids, segs) = nxt
            sys_.feed_camera(t_c, ids, uvs, line_ids=lids, line_segs=segs)
            nxt = next(frames, None)
        while nxt_gps is not None and nxt_gps[0] <= imu_t[i]:
            sys_.feed_gps_enu(nxt_gps[0], nxt_gps[1])
            nxt_gps = next(gps_iter, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])
    errs = [np.linalg.norm(p - np.asarray(sim.gt_kin(t)["p_IinG"]))
            for t, _, p in sys_.traj]
    return float(np.sqrt(np.mean(np.square(errs)))), dict(sys_.stats), sys_


@pytest.mark.slow
def test_live_joint_matches_sequential():
    """The live system's joint per-frame update (one compress + EKF update
    across cam/line/wheel rows) must track like the sequential per-sensor
    order: same accept counts within a few gates, comparable ATE."""
    rmse_j, st_j, _ = _live_replay(True)
    rmse_s, st_s, _ = _live_replay(False)
    assert st_j["wheel_accept"] > 0 and st_j["line_accept"] > 0
    assert rmse_j < 0.5 and rmse_s < 0.5, (rmse_j, rmse_s)
    # second-order relinearization differences only: ATEs stay close
    assert abs(rmse_j - rmse_s) < 0.5 * max(rmse_j, rmse_s) + 0.02, \
        (rmse_j, rmse_s)
    for k in ("cam_accept", "line_accept", "wheel_accept"):
        assert abs(st_j[k] - st_s[k]) <= max(4, 0.25 * st_s[k]), (k, st_j, st_s)


@pytest.mark.slow
def test_live_joint_slam_gps_parity():
    """SLAM landmarks + GPS through the joint path vs sequential (round-3
    VERDICT item 2): both modes must initialize landmarks, align with GPS,
    and land comparable ATE with the batched SLAM gate in play."""
    import numpy as np

    rmse_j, st_j, sys_j = _live_replay(True, slam=6, gps=True)
    rmse_s, st_s, sys_s = _live_replay(False, slam=6, gps=True)
    for sysx in (sys_j, sys_s):
        assert int(np.asarray(sysx.state.slam_valid).sum()) > 0, \
            "no SLAM landmarks initialized"
        assert sysx.gps is not None and sysx.gps.initialized, \
            "GPS 4-DoF alignment did not initialize"
    # absolute bar is loose: the whole state is rotated into the GPS ENU
    # frame by a 4-DoF alignment estimated from 0.5 m-noise fixes over a
    # 3 m baseline, so the gt comparison includes alignment error (~0.6 m
    # here); the check of interest is joint/sequential PARITY
    assert rmse_j < 1.0 and rmse_s < 1.0, (rmse_j, rmse_s)
    assert abs(rmse_j - rmse_s) < 0.2 * max(rmse_j, rmse_s) + 0.02, \
        (rmse_j, rmse_s)
