"""SLAM landmark tests: delayed init fills slots, updates run, accuracy holds."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.config.options import EstimatorOptions
from plviwo_tpu.core.system import VioSystem
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator


@pytest.mark.slow
@pytest.mark.parametrize("feat_rep", ["GLOBAL_3D", "GLOBAL_FULL_INVERSE_DEPTH"])
def test_slam_features_e2e(feat_rep):
    cfg = SimConfig(duration=10.0, seed=1, sigma_pix=0.5, n_pts=45)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.cam.feat_rep = feat_rep
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
    from plviwo_tpu.update import cam_helper

    slam_p = np.asarray(cam_helper.rep_to_xyz(sys_.state.slam_p,
                                              sys_.feat_rep))
    n_checked = 0
    for slot in np.nonzero(slam_valid)[0]:
        fid = int(slam_id[slot])
        if fid < len(sim.landmarks):
            err = np.linalg.norm(slam_p[slot] - sim.landmarks[fid])
            assert err < 2.0, f"landmark {fid} error {err:.2f} m"
            n_checked += 1
    assert n_checked > 0


def test_inverse_depth_rep_roundtrip_and_jacobian():
    from plviwo_tpu.update import cam_helper as ch

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(5, 3)) + np.array([0, 0, 5.0]))
    rep = ch.xyz_to_rep(p, ch.REP_GLOBAL_INVERSE_DEPTH)
    back = ch.rep_to_xyz(rep, ch.REP_GLOBAL_INVERSE_DEPTH)
    np.testing.assert_allclose(back, p, atol=1e-12)
    J = ch.rep_jacobian(rep, ch.REP_GLOBAL_INVERSE_DEPTH)
    eps = 1e-6
    for k in range(3):
        d = jnp.zeros(3).at[k].set(eps)
        fd = (ch.rep_to_xyz(rep + d, ch.REP_GLOBAL_INVERSE_DEPTH)
              - ch.rep_to_xyz(rep - d, ch.REP_GLOBAL_INVERSE_DEPTH)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[:, :, k], fd,
                                   rtol=1e-6, atol=1e-6)
    # GLOBAL_3D is the identity
    J3 = ch.rep_jacobian(p, ch.REP_GLOBAL_3D)
    np.testing.assert_allclose(J3, np.tile(np.eye(3), (5, 1, 1)))
