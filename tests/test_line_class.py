"""Per-frame vanishing-point line classification (round-3 VERDICT item 8).

The reference classifies lines each FRAME from the current IMU rotation
(UpdaterCamera.cpp:100-104, LineHelper.cpp:1026-1056); round 2 classified
once from the first observation's clone, which goes stale under attitude
drift.  Round 3 records a class per observation at feed time and majority-
votes at update time — these tests cover the vote and the end-to-end
agreement with the simulator's known Manhattan axis classes while the
trajectory yaws.
"""

import numpy as np
import pytest

from plviwo_tpu.update.feature_db import LineDatabase, LineTrack


class TestMajorityVote:
    def _track(self, classes):
        db = LineDatabase()
        for i, c in enumerate(classes):
            db.update(7, float(i), np.zeros(4), np.zeros(4), D=c)
        return db.tracks[7]

    def test_unanimous(self):
        assert self._track([3, 3, 3, 3]).majority_class() == 3

    def test_majority_wins_over_stale_minority(self):
        # early misclassifications (drifted attitude) outvoted by later obs
        assert self._track([1, 3, 3, 3, 3]).majority_class() == 3

    def test_weak_support_unclassified(self):
        assert self._track([0, 0, 0, 1]).majority_class() == 0
        assert self._track([1]).majority_class() == 0

    def test_split_vote_needs_half(self):
        # 2/6 votes for the winner < half the observations -> unclassified
        assert self._track([1, 2, 0, 0, 1, 0]).majority_class() == 0

    def test_cleanup_trims_classes(self):
        db = LineDatabase()
        for i, c in enumerate([1, 1, 3, 3, 3]):
            db.update(1, float(i), np.zeros(4), np.zeros(4), D=c)
        db.cleanup(t_min=2.0)  # drops the two class-1 obs
        assert db.tracks[1].classes == [3, 3, 3]
        assert db.tracks[1].majority_class() == 3


@pytest.mark.slow
def test_feed_time_classification_agreement_under_yaw():
    """Sim lines with known axis alignment, slowly yawing trajectory: the
    per-obs feed-time classes must majority-vote to the true axis for most
    classified tracks (the VERDICT done-criterion)."""
    import jax.numpy as jnp

    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.ops import lie
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    cfg = SimConfig(duration=10.0, seed=4, n_lines=48, sigma_pix_line=1.0)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.cam.use_lines = True
    opts.cam.max_lines = 40
    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    sys_.initialize_from(
        float(imu_t[0]), lie.rot_2_quat(kin0["R_GtoI"]), kin0["p_IinG"],
        kin0["v_IinG"], sim.bg_true[0], sim.ba_true[0])
    cam_ts = sim.cam_times()[:70]
    cam_iter = iter([
        (float(t), sim.cam_frame(t), sim.line_frame(t)) for t in cam_ts])
    next_cam = next(cam_iter, None)
    agree = disagree = 0
    for i in range(len(imu_t)):
        while next_cam is not None and next_cam[0] <= imu_t[i]:
            t, (ids, uvs), (lids, segs) = next_cam
            sys_.feed_camera(t, ids, uvs, lids, segs)
            # score per-track majority votes against the sim's true classes
            for lid in lids:
                tr = sys_.ldb.tracks.get(int(lid))
                if tr is None or len(tr.classes) < 4:
                    continue
                mc = tr.majority_class()
                if mc == 0:
                    continue
                if mc == int(sim.line_dir_class[int(lid)]):
                    agree += 1
                else:
                    disagree += 1
            next_cam = next(cam_iter, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])
        if next_cam is None:
            break
    total = agree + disagree
    assert total > 50, f"too few classified line-track checks ({total})"
    assert agree / total > 0.9, (
        f"classification agreement {agree}/{total} = {agree / total:.2f}")
