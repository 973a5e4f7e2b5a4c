"""Dynamic cloning composed with the fused image engine (round-4 VERDICT
item 7): `feed_image` + `dynamic_cloning=True` must clone at the adaptive
rate (below frame rate on smooth motion), update point rows against
INTERPOLATED poses between clones on device
(core/step._camera_msckf_rows_interp), and keep NEES in band.

Reference: SystemManager::dynamic_cloning (SystemManager.cpp:293-312) +
State::get_interpolated_jacobian (State.cpp:833-973), composed with the
TrackKLT/TrackLSD front-end — the reference's ONLY path runs exactly this
composition.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.config.options import EstimatorOptions
from plviwo_tpu.core.system import VioSystem
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator


@pytest.mark.slow
def test_feed_image_dynamic_cloning_nees():
    cfg = SimConfig(duration=12.0, n_landmarks=350, n_lines=40,
                    width=640, height=480, seed=6)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.dynamic_cloning = True
    opts.clone_freq = 10  # cap = camera rate; policy may go below
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

    imu_t, imu_w, imu_a = sim.imu_stream()
    wheel_ts = sim.wheel_times()
    n_frames = 90
    cam_ts = [t0 + 0.1 * (i + 1) for i in range(n_frames)]
    wi, ci = 0, 0
    nees_rows = []
    for i in range(len(imu_t)):
        t = imu_t[i]
        while wi < len(wheel_ts) and wheel_ts[wi] <= t:
            m1, m2 = sim.wheel_sample(wheel_ts[wi])
            sys_.feed_wheel(float(wheel_ts[wi]), m1, m2)
            wi += 1
        while ci < len(cam_ts) and cam_ts[ci] <= t:
            sys_.feed_image(cam_ts[ci], sim.render_frame(cam_ts[ci]))
            ci += 1
        n_upd0 = sys_.stats["updates"]
        sys_.feed_imu(float(t), imu_w[i], imu_a[i])
        # frames are served once IMU coverage arrives, i.e. inside feed_imu
        if sys_.stats["updates"] > n_upd0:
            st = sys_.state
            tn = float(st.time)
            kin = sim.gt_kin(tn)
            cov = np.asarray(st.cov)
            dR = (np.asarray(lie.quat_2_rot(st.q))
                  @ np.asarray(kin["R_GtoI"]).T)
            d = np.sqrt(np.maximum(np.diag(cov)[:15], 1e-18))
            nees_rows.append({
                "p": np.sum(((np.asarray(st.p) - kin["p_IinG"])
                             / d[3:6]) ** 2),
                "o": np.sum((np.asarray(lie.log_so3(jnp.asarray(dR)))
                             / d[0:3]) ** 2),
                "v": np.sum(((np.asarray(st.v) - kin["v_IinG"])
                             / d[6:9]) ** 2),
            })
        if ci >= len(cam_ts):
            break

    frames = sys_.stats["updates"]
    clones = sys_.stats["clones"]
    assert frames >= 80, (frames, clones)
    # the adaptive cadence must actually deviate from clone-per-frame on
    # this smooth trajectory (the composition is pointless otherwise)
    assert clones < frames, (frames, clones)
    # dynamic mode masks obs past the newest clone at harvest, so accepted
    # counts run lower than clone-per-frame (iters=6 landed exactly 30 on
    # this seed); the consistency assertions below are the real gate
    assert sys_.stats["cam_accept"] > 20, sys_.stats
    assert sys_.stats["wheel_accept"] > clones // 3, sys_.stats

    errs = []
    for t, _, p in sys_.traj:
        _, p_gt = sim.gt_pose(t)
        errs.append(np.linalg.norm(np.asarray(p) - np.asarray(p_gt)))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert np.isfinite(errs).all()
    assert rmse < 0.5, f"dynamic fused RMSE {rmse:.3f} m"

    rows = nees_rows[10:]
    assert len(rows) > 40
    for key in ("p", "o", "v"):
        vals = np.asarray([r[key] for r in rows])
        mean_nees = float(np.mean(vals))
        # same band as test_consistency's full-state sweep
        assert 0.15 < mean_nees < 6.0, f"{key} NEES mean {mean_nees:.2f}"
    d = jnp.diagonal(sys_.state.cov)
    assert bool(jnp.all(jnp.isfinite(d))) and bool(jnp.all(d > -1e-9))
