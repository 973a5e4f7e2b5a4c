"""Online camera calibration recovery (reference: CamHelper.cpp:77-102,
139-167 calib Jacobian columns; State.cpp:833-973 dt through interpolation).

A perturbed extrinsic and a nonzero camera-IMU time offset must both be
recovered by the filter on an excited trajectory (yaw-only motion leaves
extrinsic dofs unobservable — the sim adds roll/pitch oscillation)."""

import numpy as np
import pytest

from plviwo_tpu.config.options import EstimatorOptions
from plviwo_tpu.core.system import VioSystem
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator

DT_TRUE = 0.03
EXT_PERTURB = np.array([0.03, -0.02, 0.015])


@pytest.fixture(scope="module")
def calib_run():
    cfg = SimConfig(duration=15.0, seed=1, sigma_pix=0.5, n_pts=45,
                    rp_excite=0.25)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.cam.max_msckf = 30
    opts.cam.sigma_pix = 0.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 5.0
    opts.cam.do_calib_ext = True
    opts.cam.do_calib_dt = True
    opts.cam.init_cov_ext_or = 0.02
    opts.cam.init_cov_ext_pos = 0.06
    opts.cam.init_cov_dt = 0.05
    sys_ = VioSystem(opts)
    cam_p_used = np.asarray(cfg.cam_ext_p) + EXT_PERTURB
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cam_p_used)

    imu_t, imu_w, imu_a = sim.imu_stream()
    k0 = sim.gt_kin(imu_t[0])
    sys_.initialize_from(
        float(imu_t[0]), lie.rot_2_quat(k0["R_GtoI"]), k0["p_IinG"],
        k0["v_IinG"], sim.bg_true[0], sim.ba_true[0])
    # camera samples the world at true time tau; its timestamp (label) is
    # tau - DT_TRUE (camera clock behind IMU clock, assumed offset 0)
    frames = [
        (float(t) - DT_TRUE,) + sim.cam_frame(t)
        for t in sim.cam_times() if float(t) - DT_TRUE > float(imu_t[0])
    ]
    ci = iter(frames)
    nc = next(ci, None)
    for i in range(len(imu_t)):
        while nc is not None and nc[0] <= imu_t[i]:
            sys_.feed_camera(*nc)
            nc = next(ci, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])
    return cfg, sys_


@pytest.mark.slow
def test_extrinsic_recovery(calib_run):
    cfg, sys_ = calib_run
    e0 = float(np.linalg.norm(EXT_PERTURB))
    e1 = float(np.linalg.norm(np.asarray(sys_.state.cam_p[0])
                              - np.asarray(cfg.cam_ext_p)))
    lo = sys_.layout
    cov = np.asarray(sys_.state.cov)
    sig3 = 3 * np.sqrt(np.trace(
        cov[lo.cam_ext(0) + 3 : lo.cam_ext(0) + 6,
            lo.cam_ext(0) + 3 : lo.cam_ext(0) + 6]))
    assert e1 < 0.35 * e0, f"extrinsic {e0:.4f} -> {e1:.4f} m: no recovery"
    assert e1 < max(sig3, 0.005), f"err {e1:.4f} outside 3sigma {sig3:.4f}"


@pytest.mark.slow
def test_dt_recovery(calib_run):
    _, sys_ = calib_run
    dt_est = float(np.asarray(sys_.state.cam_dt)[0])
    assert abs(dt_est - DT_TRUE) < 0.004, f"dt {dt_est:.4f} vs {DT_TRUE}"


@pytest.mark.slow
def test_vio_still_tracks_with_calib(calib_run):
    cfg, sys_ = calib_run
    assert len(sys_.traj) > 80
    assert sys_.stats["lost_marg_obs"] == 0
