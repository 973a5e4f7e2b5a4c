"""Config system tests: layered YAML -> Options tree, strict unknown keys."""

import pytest

from plviwo_tpu.config.yaml_io import load_options


def test_loads_kaist_layered_config():
    opts = load_options("/root/repo/configs/kaist/config.yaml")
    assert opts.est.clone_freq == 20
    assert opts.est.dynamic_cloning is True
    assert opts.est.imu.sigma_w == pytest.approx(1.7e-4)
    assert opts.est.cam.n_pts == 150
    assert opts.est.cam.use_lines is True
    assert opts.est.wheel.enabled is True
    assert opts.est.wheel.type == "Wheel3DAng"
    assert opts.est.gps.chi2_mult == pytest.approx(9999.0)


def test_strict_unknown_key(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("est:\n  nonexistent_option: 5\n")
    with pytest.raises(ValueError, match="unparsed"):
        load_options(str(p))
    # non-strict tolerates
    opts = load_options(str(p), strict=False)
    assert opts.est.clone_freq == 10  # defaults intact


def test_options_feed_system(tmp_path):
    from plviwo_tpu.core.system import VioSystem

    opts = load_options("/root/repo/configs/kaist/config.yaml")
    sys_ = VioSystem(opts.est)
    assert sys_.layout.use_wheel
    assert sys_.gps is not None
