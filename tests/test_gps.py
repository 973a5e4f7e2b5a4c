"""GPS updater tests: geodetic math, 4-DoF alignment, e2e drift bounding."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops import lie
from plviwo_tpu.update import gps as gps_up


class TestGeodetic:
    def test_enu_roundtrip_small_offsets(self):
        datum = (37.0, 127.0, 50.0)
        # ~100m north
        p = gps_up.geodetic_to_enu(37.0009, 127.0, 50.0, datum)
        assert abs(p[1] - 100.0) < 1.0 and abs(p[0]) < 1.0
        # ~100m east
        p = gps_up.geodetic_to_enu(37.0, 127.00112, 50.0, datum)
        assert abs(p[0] - 100.0) < 1.5 and abs(p[1]) < 1.0
        # up
        p = gps_up.geodetic_to_enu(37.0, 127.0, 60.0, datum)
        np.testing.assert_allclose(p, [0, 0, 10.0], atol=1e-4)


class TestHorn:
    def test_recovers_yaw_translation(self):
        rng = np.random.default_rng(0)
        p_W = rng.normal(size=(20, 3)) * 10
        yaw = 0.7
        c, s = np.cos(yaw), np.sin(yaw)
        R_true = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        t_true = np.array([5.0, -3.0, 1.0])
        p_E = p_W @ R_true.T + t_true
        R, t, yaw_est, rms = gps_up.horn_4dof(p_W, p_E)
        np.testing.assert_allclose(R, R_true, atol=1e-10)
        np.testing.assert_allclose(t, t_true, atol=1e-10)
        assert rms < 1e-10

    def test_noise_robust(self):
        rng = np.random.default_rng(1)
        p_W = rng.normal(size=(50, 3)) * 20
        yaw = -1.2
        c, s = np.cos(yaw), np.sin(yaw)
        R_true = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        p_E = p_W @ R_true.T + rng.normal(size=(50, 3)) * 0.5
        R, t, yaw_est, rms = gps_up.horn_4dof(p_W, p_E)
        assert abs(yaw_est - yaw) < 0.01
        assert rms < 1.0


class TestRansac4Dof:
    """MathGPS::Ransac_4Dof analogue (VERDICT round-3 item 6): 20% corrupted
    fixes must not move the initial guess; plain Horn must visibly break on
    the same data (the regression the RANSAC exists to prevent)."""

    def _make(self, frac_bad, n=25, noise=0.5, seed=2):
        rng = np.random.default_rng(seed)
        t_axis = np.linspace(0, 40, n)
        p_W = np.stack([t_axis, 3 * np.sin(t_axis / 6), 0.1 * t_axis], 1)
        yaw = 0.9
        c, s = np.cos(yaw), np.sin(yaw)
        R_true = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        t_true = np.array([12.0, -7.0, 2.0])
        p_E = p_W @ R_true.T + t_true + rng.normal(size=(n, 3)) * noise
        n_bad = int(frac_bad * n)
        bad = rng.choice(n, n_bad, replace=False)
        p_E[bad] += rng.normal(size=(n_bad, 3)) * 40.0  # gross GNSS outliers
        return p_W, p_E, yaw, t_true, bad

    def test_clean_matches_horn(self):
        p_W, p_E, yaw, t_true, _ = self._make(0.0)
        R, t, yaw_est, rms, inl = gps_up.ransac_4dof(p_W, p_E, thresh=1.5)
        assert abs(yaw_est - yaw) < 0.02
        assert np.linalg.norm(t - t_true) < 0.5
        assert inl.sum() >= 0.9 * len(p_W)

    def test_20pct_corrupted_still_initializes(self):
        p_W, p_E, yaw, t_true, bad = self._make(0.2)
        R, t, yaw_est, rms, inl = gps_up.ransac_4dof(p_W, p_E, thresh=1.5)
        # same tolerance as the clean case (the VERDICT done-criterion)
        assert abs(yaw_est - yaw) < 0.02, yaw_est
        assert np.linalg.norm(t - t_true) < 0.5, t
        assert not inl[bad].any(), "outlier fixes entered the consensus set"
        # Horn alone is visibly pulled off by the corruption
        _, t_h, yaw_h, _ = gps_up.horn_4dof(p_W, p_E)
        assert (abs(yaw_h - yaw) > 0.02
                or np.linalg.norm(t_h - t_true) > 0.5)


@pytest.mark.slow
def test_e2e_gps_bounded_drift():
    """VIO + GPS in a yawed/offset ENU frame: init must align and the final
    trajectory must match the transformed ground truth."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    cfg = SimConfig(duration=25.0, seed=11, sigma_pix=0.5, n_pts=35,
                    sigma_gps=0.3)
    sim = Simulator(cfg)
    yaw0 = 0.5
    c, s = np.cos(yaw0), np.sin(yaw0)
    R_enu = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    t_enu = np.array([100.0, -50.0, 2.0])

    opts = EstimatorOptions()
    opts.cam.max_msckf = 25
    opts.cam.sigma_pix = 0.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 5.0
    opts.gps.enabled = True
    opts.gps.noise = 0.3
    opts.gps.chi2_mult = 10.0
    # yaw observability needs a long enough arc (reference default: 20 m)
    opts.gps.init_distance = 15.0

    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    sys_.initialize_from(float(imu_t[0]), q0, kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[0], sim.ba_true[0])
    # install gps lever arm
    sys_.state = sys_.state.replace(
        gps_p=sys_.state.gps_p.at[0].set(jnp.asarray(cfg.gps_ext_p)))

    cam_iter = iter([(float(t),) + sim.cam_frame(t) for t in sim.cam_times()])
    next_cam = next(cam_iter, None)
    gps_iter = iter([
        (float(t), R_enu @ sim.gps_sample(t) + t_enu) for t in sim.gps_times()
    ])
    next_gps = next(gps_iter, None)

    for i in range(len(imu_t)):
        while next_gps is not None and next_gps[0] <= imu_t[i]:
            sys_.feed_gps_enu(*next_gps)
            next_gps = next(gps_iter, None)
        while next_cam is not None and next_cam[0] <= imu_t[i]:
            sys_.feed_camera(next_cam[0], next_cam[1], next_cam[2])
            next_cam = next(cam_iter, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])

    assert sys_.gps.initialized, "GPS 4-DoF alignment never initialized"
    assert sys_.gps.stats["accept"] > 5, sys_.gps.stats
    # NEES of the delayed-initialized transform against the true (yaw, t),
    # using its posterior covariance captured just before marginalization
    # (reference flow: UpdaterGPS.cpp:338-516)
    R_f, t_f, yaw_f, _ = sys_.gps.align
    e_yaw = np.arctan2(np.sin(yaw_f - yaw0), np.cos(yaw_f - yaw0))
    e = np.concatenate([[e_yaw], t_f - t_enu])
    P = sys_.gps.init_trans_cov
    assert np.all(np.isfinite(P)) and np.all(np.linalg.eigvalsh(P) > 0), P
    nees = float(e @ np.linalg.solve(P, e))
    assert nees < 30.0, (nees, e, np.sqrt(np.diag(P)))
    # after init, trajectory is in ENU: compare to transformed gt
    errs = []
    for t, q, p in sys_.traj[-30:]:
        gt = np.asarray(sim.gt_kin(t)["p_IinG"])
        errs.append(np.linalg.norm(p - (R_enu @ gt + t_enu)))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 1.0, f"GPS-aligned RMSE {rmse}, align {sys_.gps.align}"
