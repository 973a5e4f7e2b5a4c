"""Descriptor front-end tests: matching invariance + tracker e2e on rendered
frames (reference: ov_core::TrackDescriptor)."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops import descriptor as desc_ops


def _texture(seed=0, h=120, w=160):
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0, 1, (h // 8 + 2, w // 8 + 2))
    ys = np.linspace(0, coarse.shape[0] - 1.01, h)
    xs = np.linspace(0, coarse.shape[1] - 1.01, w)
    y0, x0 = ys.astype(int), xs.astype(int)
    fy, fx = ys - y0, xs - x0
    up = coarse[y0][:, x0] * (1 - fy)[:, None] * (1 - fx)[None, :] \
        + coarse[y0 + 1][:, x0] * fy[:, None] * (1 - fx)[None, :] \
        + coarse[y0][:, x0 + 1] * (1 - fy)[:, None] * fx[None, :] \
        + coarse[y0 + 1][:, x0 + 1] * fy[:, None] * fx[None, :]
    return up


def test_descriptor_matches_under_shift():
    """Descriptors at the same physical points of a translated image must
    match one-to-one under the ratio test."""
    img = _texture()
    shift = 3
    img2 = np.roll(img, shift, axis=1)
    rng = np.random.default_rng(1)
    uv1 = np.stack([rng.uniform(30, 120, 20), rng.uniform(30, 90, 20)], 1)
    uv2_true = uv1 + np.array([shift, 0.0])
    perm = rng.permutation(20)
    pattern = desc_ops.brief_pattern()
    d1 = desc_ops.describe(jnp.asarray(img), jnp.asarray(uv1),
                           jnp.ones(20, dtype=bool), pattern)
    d2 = desc_ops.describe(jnp.asarray(img2), jnp.asarray(uv2_true[perm]),
                           jnp.ones(20, dtype=bool), pattern)
    idx2 = np.asarray(desc_ops.match(d1, jnp.ones(20, dtype=bool),
                                     d2, jnp.ones(20, dtype=bool)))
    n_correct = sum(1 for i in range(20) if idx2[i] >= 0 and perm[idx2[i]] == i)
    assert n_correct >= 16, f"only {n_correct}/20 correct matches"


@pytest.mark.slow
def test_desc_tracker_e2e():
    """DescTracker drives the same image-fed VIO path as KltTracker with
    bounded ATE (the reference's alternative descriptor front-end)."""
    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.ops import lie
    from plviwo_tpu.sim.simulator import SimConfig, Simulator
    from plviwo_tpu.update.desc_tracker import DescTracker

    cfg = SimConfig(duration=8.0, seed=2, n_pts=45)
    sim = Simulator(cfg)
    opts = EstimatorOptions()
    opts.cam.max_msckf = 25
    opts.cam.sigma_pix = 2.0
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 8.0
    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    sys_.initialize_from(float(imu_t[0]), q0, kin0["p_IinG"],
                         kin0["v_IinG"], sim.bg_true[0], sim.ba_true[0])

    tracker = DescTracker(n_pts=80, cam_k=np.asarray(cfg.intrinsics),
                          grid_x=12, grid_y=10)
    frames = iter([(float(t), sim.render_frame(t, with_lines=False))
                   for t in sim.cam_times()])
    next_f = next(frames, None)
    for i in range(len(imu_t)):
        while next_f is not None and next_f[0] <= imu_t[i]:
            ids, uvs = tracker.feed(next_f[1])
            sys_.feed_camera(next_f[0], ids, uvs)
            next_f = next(frames, None)
        sys_.feed_imu(imu_t[i], imu_w[i], imu_a[i])

    errs = [np.linalg.norm(p - np.asarray(sim.gt_kin(t)["p_IinG"]))
            for t, q, p in sys_.traj]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert sys_.stats["cam_accept"] > 10, sys_.stats
    assert rmse < 1.0, f"descriptor-tracked VIO RMSE {rmse:.3f}"
