"""KAIST reader tests on a synthetic mini-dataset (the real data is absent in
CI; the parsing/streaming contract is what we verify)."""

import os

import numpy as np

from plviwo_tpu.data.kaist import KaistDataset


def _make_mini_dataset(root):
    sd = os.path.join(root, "sensor_data")
    os.makedirs(sd, exist_ok=True)
    t0 = 1_500_000_000_000_000_000  # ns
    with open(os.path.join(sd, "xsens_imu.csv"), "w") as f:
        for i in range(100):
            t = t0 + i * 10_000_000  # 100 Hz
            q = "0,0,0,1"
            e = "0,0,0"
            g = f"0.01,{0.02 + 1e-4*i},0.2"
            a = "0.1,0.0,9.81"
            m = "0,0,0"
            f.write(f"{t},{q},{e},{g},{a},{m}\n")
    with open(os.path.join(sd, "encoder.csv"), "w") as f:
        count_l = count_r = 0
        for i in range(50):
            t = t0 + i * 20_000_000  # 50 Hz
            count_l += 41  # ~2 m/s at default calib
            count_r += 42
            f.write(f"{t},{count_l},{count_r}\n")
    with open(os.path.join(sd, "vrs_gps.csv"), "w") as f:
        for i in range(3):
            t = t0 + i * 500_000_000
            f.write(f"{t},37.123{i},127.456,55.0\n")
    with open(os.path.join(root, "global_pose.csv"), "w") as f:
        for i in range(10):
            t = t0 + i * 100_000_000
            f.write(f"{t},1,0,0,{0.1*i},0,1,0,0,0,0,1,0\n")
    calib = os.path.join(root, "calibration")
    os.makedirs(calib, exist_ok=True)
    with open(os.path.join(calib, "EncoderParameter.txt"), "w") as f:
        f.write("Encoder resolution: 4096\n")
        f.write("Encoder left wheel diameter: 1.24\n")
        f.write("Encoder right wheel diameter: 1.25\n")
        f.write("Encoder wheel base: 1.52\n")


def test_reader_parses_mini_dataset(tmp_path):
    _make_mini_dataset(tmp_path)
    ds = KaistDataset(str(tmp_path))
    assert ds.has_imu and ds.has_encoder and ds.gps_file

    t, w, a = ds.imu()
    assert len(t) == 100
    np.testing.assert_allclose(a[0], [0.1, 0.0, 9.81])
    # epoch-seconds in f64 resolve to ~0.25 us — same precision model as the
    # reference's double timestamps
    assert abs(t[1] - t[0] - 0.01) < 1e-6

    tw, rl, rr = ds.wheel()
    assert len(tw) == 49
    # 41 ticks / 0.02 s * 2pi / 4096 ~ 3.14 rad/s
    np.testing.assert_allclose(rl[0], 41 / 0.02 * 2 * np.pi / 4096, rtol=1e-6)

    tg, la, lo, al = ds.gps()
    assert len(tg) == 3 and abs(la[0] - 37.1230) < 1e-9

    np.testing.assert_allclose(ds.wheel_intr, [0.62, 0.625, 1.52], atol=1e-9)

    gt_t, gt_p, gt_R = ds.ground_truth()
    assert len(gt_t) == 10
    np.testing.assert_allclose(gt_p[3], [0.3, 0, 0], atol=1e-9)

    events = list(ds.stream())
    kinds = [k for _, k, _ in events]
    assert kinds.count("imu") == 100 and kinds.count("wheel") == 49
    ts = [t for t, _, _ in events]
    assert ts == sorted(ts)


def test_reader_feeds_estimator(tmp_path):
    """Streamed events must be consumable by the VioSystem without error."""
    _make_mini_dataset(tmp_path)
    ds = KaistDataset(str(tmp_path))
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem

    opts = EstimatorOptions()
    opts.wheel.enabled = True
    opts.wheel.intrinsics = list(ds.wheel_intr)
    sys_ = VioSystem(opts)
    sys_.set_wheel_calibration([0, 0, 0, 1.0], [0, 0, 0], list(ds.wheel_intr))
    for t, kind, payload in ds.stream():
        if kind == "imu":
            sys_.feed_imu(t, payload[0], payload[1])
        elif kind == "wheel":
            sys_.feed_wheel(t, *payload)
        elif kind == "gps":
            pass  # gps disabled in this config
    # not enough motion to initialize — but nothing may crash
    assert not sys_.initialized or True
