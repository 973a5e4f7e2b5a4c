"""GPS rows in the fused joint update (round-4 VERDICT item 3).

The reference runs GPS as its own per-fix EKF update
(UpdaterGPS::update, UpdaterGPS.cpp:165-270); the fused engine folds each
fix's 3-row position system (pose linearly interpolated between the fix's
bounding clones) into the frame's Gram-sum joint update
(core/step._gps_rows -> core/frame.fused_frame use_gps=True), so the
KAIST sensor set (points + lines + wheel + GPS) is ONE dispatch per frame.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.core import ekf
from plviwo_tpu.core.layout import StateLayout
from plviwo_tpu.core.state import make_state
from plviwo_tpu.core.step import _gps_rows
from plviwo_tpu.ops import lie

F64 = jnp.float64


def _state_with_clones(n_clones=6, n_gps=1):
    """Clones along +x at 1 m/s, identity attitude."""
    layout = StateLayout(n_clones=n_clones, n_cams=1, n_gps=n_gps)
    state = make_state(layout, priors={
        "imu_th": 1e-3, "imu_p": 1e-2, "imu_v": 1e-2,
        "imu_bg": 1e-3, "imu_ba": 1e-2})
    qs = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n_clones, 1))
    ps = jnp.stack([jnp.arange(n_clones, dtype=F64),
                    jnp.zeros(n_clones), jnp.zeros(n_clones)], -1)
    ts = jnp.arange(n_clones, dtype=F64)
    state = state.replace(
        clone_q=qs, clone_p=ps, clone_q_fej=qs, clone_p_fej=ps,
        clone_t=ts, clone_valid=jnp.ones(n_clones, dtype=bool),
        time=jnp.asarray(float(n_clones - 1), F64),
        p=ps[-1], q=qs[-1])
    # clone-position prior so the update has something to correct
    cov = np.array(state.cov)
    for i in range(n_clones):
        s = layout.clone(i)
        cov[s + 3 : s + 6, s + 3 : s + 6] = 0.25 * np.eye(3)
    return state.replace(cov=jnp.asarray(cov)), layout


class TestGpsRows:
    def test_zero_residual_at_truth(self):
        state, lo = _state_with_clones()
        # fix exactly between clones 2 and 3 on the true trajectory
        gt = jnp.asarray([2.5], F64)
        gp = jnp.asarray([[2.5, 0.0, 0.0]])
        gv = jnp.asarray([True])
        H, r, mask, n_acc = _gps_rows(state, gt, gp, gv, 0.5, 1.0)
        assert int(n_acc) == 1
        assert bool(mask.all())
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)
        # rows touch exactly the two bounding clones' position columns
        Hn = np.asarray(H)
        nz = np.nonzero(np.abs(Hn).sum(axis=0) > 1e-12)[0]
        c2, c3 = lo.clone(2), lo.clone(3)
        assert set(nz) <= set(range(c2, c2 + 6)) | set(range(c3, c3 + 6))

    def test_update_pulls_toward_fix(self):
        state, lo = _state_with_clones()
        # fixes claim the trajectory is shifted +0.3 m in y
        gt = jnp.asarray([1.5, 2.5, 3.5], F64)
        gp = jnp.asarray([[1.5, 0.3, 0.0], [2.5, 0.3, 0.0], [3.5, 0.3, 0.0]])
        gv = jnp.asarray([True, True, True])
        H, r, mask, n_acc = _gps_rows(state, gt, gp, gv, 0.5, 10.0)
        assert int(n_acc) == 3
        new = ekf.update(state, H, r, jnp.ones(r.shape, F64), mask)
        dy = np.asarray(new.clone_p[2] - state.clone_p[2])
        assert dy[1] > 0.05, dy  # moved toward the fixes
        assert abs(dy[0]) < 0.05 and abs(dy[2]) < 0.05

    def test_gate_rejects_absurd_fix(self):
        state, _ = _state_with_clones()
        gt = jnp.asarray([2.5, 3.0], F64)
        gp = jnp.asarray([[2.5, 0.0, 0.0], [500.0, 300.0, 0.0]])
        gv = jnp.asarray([True, True])
        _, _, mask, n_acc = _gps_rows(state, gt, gp, gv, 0.5, 1.0)
        assert int(n_acc) == 1
        m = np.asarray(mask).reshape(2, 3)
        assert m[0].all() and not m[1].any()

    def test_uncovered_fix_masked(self):
        state, _ = _state_with_clones()
        gt = jnp.asarray([99.0], F64)  # beyond the newest clone
        gp = jnp.asarray([[99.0, 0.0, 0.0]])
        gv = jnp.asarray([True])
        _, _, mask, n_acc = _gps_rows(state, gt, gp, gv, 0.5, 9999.0)
        assert int(n_acc) == 0 and not bool(mask.any())

    def test_lever_arm_used(self):
        state, _ = _state_with_clones()
        state = state.replace(
            gps_p=state.gps_p.at[0].set(jnp.asarray([0.0, 0.0, 0.3])))
        # identity attitude: antenna sits 0.3 above the IMU
        gt = jnp.asarray([2.0], F64)
        gp = jnp.asarray([[2.0, 0.0, 0.3]])
        gv = jnp.asarray([True])
        _, r, _, n_acc = _gps_rows(state, gt, gp, gv, 0.5, 1.0)
        assert int(n_acc) == 1
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


@pytest.mark.slow
def test_feed_image_with_gps_e2e():
    """Full live path on rendered frames with GPS in a yawed/offset ENU
    frame: host-side 4-DoF delayed init, then per-fix rows ride the fused
    joint update (stats['gps_fused'] counts them)."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    cfg = SimConfig(duration=16.0, n_landmarks=350, n_lines=40,
                    width=640, height=480, seed=5, sigma_gps=0.3)
    sim = Simulator(cfg)
    yaw0 = 0.4
    c_, s_ = np.cos(yaw0), np.sin(yaw0)
    R_enu = np.array([[c_, -s_, 0], [s_, c_, 0], [0, 0, 1.0]])
    t_enu = np.array([40.0, -20.0, 1.0])

    opts = EstimatorOptions()
    opts.cam.n_pts = 96
    opts.cam.max_lines = 16
    opts.cam.use_lines = True
    opts.cam.sigma_pix = 1.5
    opts.cam.sigma_pix_line = 2.5
    opts.cam.chi2_mult = 8.0
    opts.cam.min_track_length = 4
    opts.wheel.enabled = True
    opts.wheel.noise_w = 0.05
    opts.wheel.noise_v = 0.05
    opts.wheel.noise_p = 0.02
    opts.gps.enabled = True
    opts.gps.noise = 0.3
    opts.gps.chi2_mult = 10.0
    opts.gps.init_distance = 8.0

    sys_ = VioSystem(opts)
    sys_.set_calibration(np.asarray(cfg.intrinsics), np.asarray(cfg.cam_ext_q),
                         np.asarray(cfg.cam_ext_p))
    sys_.set_wheel_calibration(np.asarray(cfg.wheel_ext_q),
                               np.asarray(cfg.wheel_ext_p),
                               [cfg.wheel_rl, cfg.wheel_rr, cfg.wheel_base])
    t0 = 1.0
    kin0 = sim.gt_kin(t0)
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    i0 = int(np.searchsorted(sim.imu_t, t0))
    sys_.initialize_from(t0, q0, kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[min(i0, len(sim.bg_true) - 1)],
                         sim.ba_true[min(i0, len(sim.ba_true) - 1)])
    sys_.state = sys_.state.replace(
        gps_p=sys_.state.gps_p.at[0].set(jnp.asarray(cfg.gps_ext_p)))

    imu_t, imu_w, imu_a = sim.imu_stream()
    wheel_ts = sim.wheel_times()
    cam_ts = [t0 + 0.1 * (i + 1) for i in range(130)]
    gps_iter = iter([(float(t), R_enu @ sim.gps_sample(t) + t_enu)
                     for t in sim.gps_times() if t > t0])
    next_gps = next(gps_iter, None)
    wi, ci = 0, 0
    for i in range(len(imu_t)):
        t = imu_t[i]
        while next_gps is not None and next_gps[0] <= t:
            sys_.feed_gps_enu(*next_gps)
            next_gps = next(gps_iter, None)
        while wi < len(wheel_ts) and wheel_ts[wi] <= t:
            m1, m2 = sim.wheel_sample(wheel_ts[wi])
            sys_.feed_wheel(float(wheel_ts[wi]), m1, m2)
            wi += 1
        while ci < len(cam_ts) and cam_ts[ci] <= t:
            sys_.feed_image(cam_ts[ci], sim.render_frame(cam_ts[ci]))
            ci += 1
        sys_.feed_imu(float(t), imu_w[i], imu_a[i])
        if ci >= len(cam_ts):
            break

    assert sys_.gps is not None and sys_.gps.initialized, \
        "GPS 4-DoF alignment never initialized"
    assert sys_.stats.get("gps_fused", 0) >= 3, sys_.stats
    errs = []
    for t, _, p in sys_.traj[-30:]:
        gt = np.asarray(sim.gt_kin(t)["p_IinG"])
        errs.append(np.linalg.norm(np.asarray(p) - (R_enu @ gt + t_enu)))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 1.0, f"fused-GPS aligned RMSE {rmse:.3f} m"
    d = jnp.diagonal(sys_.state.cov)
    assert bool(jnp.all(jnp.isfinite(d))) and bool(jnp.all(d > -1e-9))
