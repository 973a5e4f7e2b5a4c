"""ZUPT tests: stationarity detection + velocity clamp."""

import numpy as np

from plviwo_tpu.config.options import EstimatorOptions
from plviwo_tpu.core.system import VioSystem


def test_zupt_clamps_velocity_drift():
    rng = np.random.default_rng(0)
    opts = EstimatorOptions()
    opts.zupt.enabled = True
    opts.imu.init_cov_vel = 0.3  # honest prior for the injected 0.2 m/s error
    sys_ = VioSystem(opts)
    sys_.initialize_from(0.0, [0, 0, 0, 1.0], np.zeros(3), [0.2, 0.0, 0.0],
                         np.zeros(3), np.zeros(3))
    # stationary IMU stream (but the filter starts with wrong velocity 0.2)
    hz = 200.0
    for i in range(0, 200):
        t = i / hz
        w = rng.normal(0, 1e-4, 3)
        a = np.array([0, 0, 9.81]) + rng.normal(0, 5e-3, 3)
        sys_.feed_imu(t, w, a)
    assert sys_.zupt.stats["applied"] > 0, sys_.zupt.stats
    v = np.linalg.norm(np.asarray(sys_.state.v))
    assert v < 0.05, f"velocity not clamped: {v}"


def test_zupt_not_applied_when_moving():
    opts = EstimatorOptions()
    opts.zupt.enabled = True
    sys_ = VioSystem(opts)
    sys_.initialize_from(0.0, [0, 0, 0, 1.0], np.zeros(3), np.zeros(3),
                         np.zeros(3), np.zeros(3))
    hz = 200.0
    for i in range(1, 150):
        t = i / hz
        w = np.array([0.0, 0.0, 0.5])  # turning
        a = np.array([0.5, 0, 9.81])   # accelerating
        sys_.feed_imu(t, w, a)
    assert sys_.zupt.stats["applied"] == 0
