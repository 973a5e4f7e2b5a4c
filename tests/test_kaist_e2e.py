"""End-to-end KAIST-layout replay (round-3 VERDICT item 3).

Generates a synthetic dataset in the raw KAIST on-disk layout (images +
encoder ticks + vrs_gps + data_stamp.csv + calibration, via
sim/kaist_fixture.py), writes a layered YAML config carrying the simulator's
calibration, and drives `run_kaist.main()` over it — the first test that
exercises the real-data path end to end (zero KAIST frames had ever been
processed before round 3; the round-2 config-clobber bug lived here).

Reference bar: run_bag.cpp:51-144 + config/kaist/kaist_C/*.
"""

import json
import os

import numpy as np
import pytest

from plviwo_tpu.data.kaist import KaistDataset
from plviwo_tpu.sim.kaist_fixture import enu_to_geodetic, generate_kaist_fixture
from plviwo_tpu.sim.simulator import SimConfig, Simulator
from plviwo_tpu.update.gps import geodetic_to_enu


def test_enu_geodetic_roundtrip():
    datum = (36.37, 127.36, 70.0)
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = rng.uniform(-500, 500, 3)
        lat, lon, alt = enu_to_geodetic(p, datum)
        back = geodetic_to_enu(lat, lon, alt, datum)
        assert np.linalg.norm(back - p) < 1e-3, (p, back)


@pytest.fixture(scope="module")
def kaist_fixture_small(tmp_path_factory):
    """Cheap fixture for the fast parsing/precedence tests (4 s, 12 frames,
    quarter-size images — rendering dominates fixture cost)."""
    root = str(tmp_path_factory.mktemp("kaist_urban_small"))
    cfg = SimConfig(duration=7.0, n_landmarks=150, n_lines=20,
                    width=320, height=240, seed=5)
    sim = Simulator(cfg)
    man = generate_kaist_fixture(root, sim, t_start=1.0, duration=4.0,
                                 cam_hz=3.0)
    return root, sim, man


@pytest.fixture(scope="module")
def kaist_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kaist_urban_synth"))
    cfg = SimConfig(duration=16.0, n_landmarks=350, n_lines=40,
                    width=640, height=480, seed=5)
    sim = Simulator(cfg)
    man = generate_kaist_fixture(root, sim, t_start=1.0, duration=12.0,
                                 cam_hz=8.0)
    return root, sim, man


def test_fixture_layout_parses(kaist_fixture_small):
    """The reader must see the fixture exactly like the real dataset."""
    root, sim, man = kaist_fixture_small
    ds = KaistDataset(root)
    assert ds.has_imu and ds.has_encoder and ds.has_images
    assert ds.gps_file is not None
    t, w, a = ds.imu()
    assert len(t) == man["imu"] and t[0] < t[-1]
    # wheel rates recovered from integrated ticks match the simulator
    # (reader times are absolute = epoch + sim time)
    wt, rl, rr = ds.wheel()
    m1s = np.array([sim.wheel_sample(t_ - man["epoch"])[0] for t_ in wt])
    # differentiation averages over the tick interval; compare loosely
    assert np.median(np.abs(rl - m1s)) < 0.2 * (np.abs(m1s).mean() + 0.1)
    gt_t, gt_p, gt_R = ds.ground_truth()
    assert len(gt_t) > 20
    # R orthonormal
    RtR = np.einsum("nij,nik->njk", gt_R, gt_R)
    assert np.abs(RtR - np.eye(3)).max() < 1e-6
    img = ds.image(ds.image_times()[0])
    assert img.shape == (240, 320) and 0.0 <= img.min() <= img.max() <= 1.0
    assert ds.wheel_intr == pytest.approx([0.3, 0.3, 1.5], abs=1e-6)


def _write_config(dirpath, cfg):
    """Layered YAML carrying the simulator rig's calibration."""
    master = os.path.join(dirpath, "config.yaml")
    with open(os.path.join(dirpath, "config_camera.yaml"), "w") as f:
        k = list(cfg.intrinsics)
        q = list(cfg.cam_ext_q)
        p = list(cfg.cam_ext_p)
        f.write(
            "est:\n  cam:\n"
            "    n_pts: 120\n"
            "    sigma_pix: 1.5\n"
            "    chi2_mult: 8.0\n"
            "    min_track_length: 4\n"
            "    max_msckf: 40\n"
            "    max_lines: 24\n"
            f"    intrinsics: [[{', '.join(str(x) for x in k)}]]\n"
            f"    extrinsics: [[{', '.join(str(x) for x in q + p)}]]\n"
            "    timeoffsets: [0.0]\n")
    with open(os.path.join(dirpath, "config_wheel.yaml"), "w") as f:
        wq = list(cfg.wheel_ext_q)
        wp = list(cfg.wheel_ext_p)
        f.write(
            "est:\n  wheel:\n"
            "    noise_w: 0.05\n    noise_v: 0.1\n    noise_p: 0.05\n"
            f"    extrinsics: [{', '.join(str(x) for x in wq + wp)}]\n")
    with open(os.path.join(dirpath, "config_gps.yaml"), "w") as f:
        gp = list(cfg.gps_ext_p)
        f.write(
            "est:\n  gps:\n"
            "    noise: 1.5\n"
            "    init_distance: 12.0\n"
            f"    extrinsics: [[{', '.join(str(x) for x in gp)}]]\n")
    with open(master, "w") as f:
        f.write("config_files: [config_camera.yaml, config_wheel.yaml, "
                "config_gps.yaml]\n")
    return master


def test_config_precedence_yaml_wins(kaist_fixture_small, tmp_path):
    """Round-2 bug regression: values the YAML sets must survive the KAIST
    driver's defaults (run_kaist clobbered sigma_pix/chi2_mult post-load)."""
    from plviwo_tpu.config.options import Options
    from plviwo_tpu.config.yaml_io import load_options

    root, sim, _ = kaist_fixture_small
    master = _write_config(str(tmp_path), sim.cfg)
    base = Options()
    base.est.cam.sigma_pix = 9.9   # driver default, must lose to YAML's 1.5
    base.est.cam.max_msckf = 7     # driver default, must lose to YAML's 40
    base.est.clone_freq = 11       # not in YAML: driver default must survive
    opts = load_options(master, base=base).est
    assert opts.cam.sigma_pix == 1.5
    assert opts.cam.max_msckf == 40
    assert opts.clone_freq == 11


@pytest.mark.slow
def test_run_kaist_e2e(kaist_fixture, tmp_path):
    """The full driver over the fixture: wheel + lines mono VIWO, bounded
    posyaw ATE vs the fixture's ground truth."""
    import jax

    from plviwo_tpu import run_kaist

    root, sim, man = kaist_fixture
    master = _write_config(str(tmp_path), sim.cfg)
    out = str(tmp_path / "traj.txt")

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_kaist.main([
            "--root", root, "--config", master, "--wheel", "--lines",
            "--out", out])
    assert rc == 0, buf.getvalue()
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["frames"] >= 90, summary
    assert summary["clones"] > 50, summary
    assert summary["updates"] > 30, summary
    ate = summary.get("ate_rmse_m")
    assert ate is not None and np.isfinite(ate), summary
    # auto-initialized (IMU+wheel Dong-Si), real front-end, 12 s replay
    assert ate < 1.0, summary
    assert os.path.exists(out)
