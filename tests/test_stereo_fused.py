"""Stereo in the fused image engine (round-4 VERDICT missing #3).

The left stream anchors slot identity; each frame one L->R LK pass
associates right-camera observations under the same slot (reference:
TrackKLT::feed_stereo, TrackKLT.cpp:202-393), and the row builder
concatenates both cameras' series per feature with per-observation camera
indices (core/step._camera_msckf_rows_stereo ->
cam_helper.point_systems_batch_multicam).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.core.frame import make_track_state, track_frame
from plviwo_tpu.sim.simulator import SimConfig, Simulator

F64 = jnp.float64


def test_track_frame_stereo_associates():
    """Right-camera observations accumulate under the same slots."""
    cfg = SimConfig(duration=6.0, n_landmarks=300, n_lines=0,
                    width=640, height=480, seed=2)
    sim = Simulator(cfg)
    ts = make_track_state(480, 640, n_pts=96, max_lines=8, max_obs=6)
    cam_k = jnp.asarray(cfg.intrinsics, dtype=F64)
    r_assoc = []
    for i in range(6):
        t = 1.0 + 0.1 * i
        img = jnp.asarray(sim.render_frame(t))
        img_r = jnp.asarray(sim.render_frame(t, cam=1))
        ts, ph, lh = track_frame(
            ts, img, cam_k, jnp.asarray(t, F64), jnp.asarray(i, jnp.int32),
            use_stereo=True, img_r=img_r, cam_k_r=cam_k)
        r_assoc.append(int(ts.rvalid.sum()))
    # the sim's stereo baseline gives small disparity; most tracked points
    # must associate L->R
    assert r_assoc[-1] >= int(ts.valid.sum()) * 0.5, (
        r_assoc, int(ts.valid.sum()))
    # right histories carry entries for surviving tracks
    assert int(ts.hist_rvalid.sum()) > 100, int(ts.hist_rvalid.sum())
    # a right obs never exists where the left obs cursor hasn't written
    left_written = np.asarray(ts.hist_t) > -np.inf
    rv = np.asarray(ts.hist_rvalid)
    assert not (rv & ~left_written).any()


@pytest.mark.slow
def test_stereo_fused_e2e_beats_mono():
    """Closed loop on rendered stereo pairs through VioSystem.feed_image:
    bounded error and a higher acceptance than the mono configuration
    (stereo observations make triangulation near-instantaneous)."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.ops import lie

    def run(stereo: bool):
        cfg = SimConfig(duration=9.0, n_landmarks=350, n_lines=0,
                        width=640, height=480, seed=4)
        sim = Simulator(cfg)
        opts = EstimatorOptions()
        opts.cam.n_pts = 96
        opts.cam.use_lines = False
        opts.cam.sigma_pix = 1.5
        opts.cam.chi2_mult = 8.0
        opts.cam.min_track_length = 4
        opts.cam.max_n = 2 if stereo else 1
        opts.wheel.enabled = True
        opts.wheel.noise_w = 0.05
        opts.wheel.noise_v = 0.05
        opts.wheel.noise_p = 0.02
        sys_ = VioSystem(opts)
        sys_.set_calibration(np.asarray(cfg.intrinsics),
                             np.asarray(cfg.cam_ext_q),
                             np.asarray(cfg.cam_ext_p))
        if stereo:
            sys_.set_calibration(
                np.asarray(cfg.intrinsics), np.asarray(cfg.cam_ext_q),
                np.asarray(cfg.cam_ext_p)
                + [-cfg.stereo_baseline, 0.0, 0.0], cam=1)
        sys_.set_wheel_calibration(np.asarray(cfg.wheel_ext_q),
                                   np.asarray(cfg.wheel_ext_p),
                                   [cfg.wheel_rl, cfg.wheel_rr,
                                    cfg.wheel_base])
        t0 = 1.0
        kin0 = sim.gt_kin(t0)
        q0 = lie.rot_2_quat(kin0["R_GtoI"])
        i0 = int(np.searchsorted(sim.imu_t, t0))
        sys_.initialize_from(
            t0, q0, kin0["p_IinG"], kin0["v_IinG"],
            sim.bg_true[min(i0, len(sim.bg_true) - 1)],
            sim.ba_true[min(i0, len(sim.ba_true) - 1)])
        imu_t, imu_w, imu_a = sim.imu_stream()
        wheel_ts = sim.wheel_times()
        cam_ts = [t0 + 0.1 * (i + 1) for i in range(60)]
        wi, ci = 0, 0
        for i in range(len(imu_t)):
            t = imu_t[i]
            while wi < len(wheel_ts) and wheel_ts[wi] <= t:
                m1, m2 = sim.wheel_sample(wheel_ts[wi])
                sys_.feed_wheel(float(wheel_ts[wi]), m1, m2)
                wi += 1
            while ci < len(cam_ts) and cam_ts[ci] <= t:
                tc = cam_ts[ci]
                if stereo:
                    sys_.feed_image(tc, sim.render_frame(tc),
                                    sim.render_frame(tc, cam=1))
                else:
                    sys_.feed_image(tc, sim.render_frame(tc))
                ci += 1
            sys_.feed_imu(float(t), imu_w[i], imu_a[i])
            if ci >= len(cam_ts):
                break
        errs = []
        for t, _, p in sys_.traj:
            _, p_gt = sim.gt_pose(t)
            errs.append(np.linalg.norm(np.asarray(p) - np.asarray(p_gt)))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        acc = sys_.stats["cam_accept"] / max(
            sys_.stats["cam_accept"] + sys_.stats["cam_reject"], 1)
        d = jnp.diagonal(sys_.state.cov)
        assert bool(jnp.all(jnp.isfinite(d))) and bool(jnp.all(d > -1e-9))
        return rmse, acc

    rmse_s, acc_s = run(stereo=True)
    rmse_m, acc_m = run(stereo=False)
    assert np.isfinite(rmse_s) and rmse_s < 0.30, rmse_s
    # stereo acceptance must exceed mono (instant two-view triangulation)
    assert acc_s > acc_m, (acc_s, acc_m)
    # stereo should not be meaningfully worse than mono on the same world
    assert rmse_s < rmse_m * 1.25, (rmse_s, rmse_m)
