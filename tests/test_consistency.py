"""Filter-consistency (NEES) test — the reference's simulation-based
consistency methodology (SURVEY.md section 4.3: est/std/gt triplets scored by
ResultSimulation) applied to our filter on the B-spline simulator."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.config.options import EstimatorOptions
from plviwo_tpu.core.system import VioSystem
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator
from plviwo_tpu.utils.recorder import StateRecorder


@pytest.mark.slow
def test_position_nees_consistent(tmp_path):
    cfg = SimConfig(duration=12.0, seed=4, sigma_pix=0.5, n_pts=45)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
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

    rec = StateRecorder(str(tmp_path))
    cam_iter = iter([(float(t),) + sim.cam_frame(t) for t in sim.cam_times()])
    next_cam = next(cam_iter, None)
    rows = []
    for i in range(len(imu_t)):
        while next_cam is not None and next_cam[0] <= imu_t[i]:
            sys_.feed_camera(next_cam[0], next_cam[1], next_cam[2])
            next_cam = next(cam_iter, None)
        n0 = len(sys_.traj)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])
        if len(sys_.traj) > n0:  # a clone happened: snapshot est + std + gt
            st = sys_.state
            t = float(st.time)
            kin = sim.gt_kin(t)
            cov = np.asarray(st.cov)
            j = min(int(np.searchsorted(imu_t, t)), len(imu_t) - 1)
            dR = np.asarray(lie.quat_2_rot(st.q)) @ np.asarray(kin["R_GtoI"]).T
            d = np.sqrt(np.maximum(np.diag(cov)[:15], 1e-18))
            rows.append({
                "p": np.sum(((np.asarray(st.p) - kin["p_IinG"]) / d[3:6]) ** 2),
                "o": np.sum((np.asarray(lie.log_so3(jnp.asarray(dR)))
                             / d[0:3]) ** 2),
                "v": np.sum(((np.asarray(st.v) - kin["v_IinG"]) / d[6:9]) ** 2),
                "bg": np.sum(((np.asarray(st.bg) - sim.bg_true[j])
                              / d[9:12]) ** 2),
                "ba": np.sum(((np.asarray(st.ba) - sim.ba_true[j])
                              / d[12:15]) ** 2),
            })
            rec.record(sys_)
    rec.save()
    assert rec.check_files()

    # skip the initialization transient
    rows = rows[10:]
    assert len(rows) > 60
    # full-state sweep (the reference's ResultSimulation checks every state
    # block).  A consistent filter gives E[NEES] = 3 per 3-dof block; measured
    # means sit at 0.7-2.3, so the band [0.15, 6] catches a 3-sigma-level
    # inconsistency (mean ~9) as well as covariance blow-ups, with ~2.5x
    # seed slack.
    for key in ("p", "o", "v", "bg", "ba"):
        vals = np.asarray([r[key] for r in rows])
        mean_nees = float(np.mean(vals))
        assert 0.15 < mean_nees < 6.0, f"{key} NEES mean {mean_nees:.2f}"
