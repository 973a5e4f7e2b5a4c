"""Utilities tests: TimeChecker, recorder files, checkpoint/resume equality."""

import numpy as np

from plviwo_tpu.utils.timing import TimeChecker


def test_timechecker():
    tc = TimeChecker()
    with tc.timer("a"):
        x = sum(range(10000))
    tc.ding("b")
    tc.dong("b")
    s = tc.summary()
    assert "a" in s and "b" in s
    assert s["a"]["count"] == 1
    assert s["a"]["mean_ms"] >= 0


def test_recorder(tmp_path):
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.utils.recorder import StateRecorder

    sys_ = VioSystem(EstimatorOptions())
    sys_.initialize_from(0.0, [0, 0, 0, 1.0], np.zeros(3), np.zeros(3),
                         np.zeros(3), np.zeros(3))
    rec = StateRecorder(str(tmp_path))
    rec.record(sys_)
    rec.record_timing(0.0, {"total_ms": 12.0, "track_ms": 3.0})
    rec.save()
    assert rec.check_files()
    from plviwo_tpu.eval.loader import load_tum

    t, p, q = load_tum(tmp_path / "trajectory.txt")
    assert len(t) == 1


def test_resource_monitor(tmp_path):
    import time

    from plviwo_tpu.eval.loader import load_timing
    from plviwo_tpu.utils.monitor import ResourceMonitor, sample

    s = sample(__import__("os").getpid())
    assert s is not None and s[1] > 0 and s[2] >= 1
    assert sample(2**30) is None  # no such pid
    out = str(tmp_path / "usage.txt")
    with ResourceMonitor(interval=0.05, out=out) as mon:
        t0 = time.monotonic()
        while time.monotonic() - t0 < 0.3:
            sum(range(20000))
    assert len(mon.rows) >= 2
    assert mon.peak_rss_mb > 1.0
    names, rows = load_timing(out)  # eval timing tools can read it
    assert names == ["t", "cpu_pct", "rss_mb", "threads"]
    assert rows.shape[0] == len(mon.rows)


def test_checkpoint_roundtrip(tmp_path):
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    sys_ = VioSystem(EstimatorOptions())
    sys_.set_calibration([300.0, 300, 320, 240, 0, 0, 0, 0],
                         [0.5, -0.5, 0.5, -0.5], [0.05, 0, 0])
    sys_.initialize_from(1.0, [0, 0, 0, 1.0], [1.0, 2, 3], [0.1, 0, 0],
                         np.zeros(3), np.zeros(3))
    sys_.feed_imu(1.0, [0, 0, 0.1], [0, 0, 9.81])
    sys_.fdb.update(7, 1.0, [100.0, 120.0], [0.1, 0.2])
    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, sys_)
    sys2 = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(sys2.state.p), [1.0, 2, 3])
    np.testing.assert_allclose(np.asarray(sys2.state.cov), np.asarray(sys_.state.cov))
    assert 7 in sys2.fdb.tracks
    assert sys2.initialized
    # resumed system keeps processing
    sys2.feed_imu(1.01, [0, 0, 0.1], [0, 0, 9.81])
