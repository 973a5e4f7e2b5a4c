"""SLAM landmark tests: delayed init fills slots, updates run, accuracy holds."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.config.options import EstimatorOptions
from plviwo_tpu.core.system import VioSystem
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator


@pytest.mark.slow
def test_slam_features_e2e():
    cfg = SimConfig(duration=10.0, seed=1, sigma_pix=0.5, n_pts=45)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.cam.max_slam = 8
    opts.cam.max_msckf = 25
    opts.cam.sigma_pix = 0.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 5.0
    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    sys_.initialize_from(float(imu_t[0]), q0, kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[0], sim.ba_true[0])

    cam_iter = iter([(float(t),) + sim.cam_frame(t) for t in sim.cam_times()])
    next_cam = next(cam_iter, None)
    max_active = 0
    for i in range(len(imu_t)):
        while next_cam is not None and next_cam[0] <= imu_t[i]:
            sys_.feed_camera(next_cam[0], next_cam[1], next_cam[2])
            next_cam = next(cam_iter, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])
        max_active = max(max_active, int(np.asarray(sys_.state.slam_valid).sum()))

    assert max_active >= 3, f"SLAM slots never filled (max {max_active})"
    errs = [np.linalg.norm(p - np.asarray(sim.gt_kin(t)["p_IinG"]))
            for t, q, p in sys_.traj]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 1.0, f"SLAM-enabled VIO RMSE {rmse:.3f}"

    # initialized landmarks should be near true landmark positions
    slam_valid = np.asarray(sys_.state.slam_valid)
    slam_id = np.asarray(sys_.state.slam_id)
    slam_p = np.asarray(sys_.state.slam_p)
    n_checked = 0
    for slot in np.nonzero(slam_valid)[0]:
        fid = int(slam_id[slot])
        if fid < len(sim.landmarks):
            err = np.linalg.norm(slam_p[slot] - sim.landmarks[fid])
            assert err < 2.0, f"landmark {fid} error {err:.2f} m"
            n_checked += 1
    assert n_checked > 0
