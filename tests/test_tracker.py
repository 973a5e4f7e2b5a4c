"""Visual front-end tests: detection, LK tracking, RANSAC, full tracker on
rendered frames (the test_tracking.cpp analogue, image-in -> tracks-out)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops import image as image_ops
from plviwo_tpu.ops import klt as klt_ops
from plviwo_tpu.sim.simulator import SimConfig, Simulator
from plviwo_tpu.update.tracker import KltTracker


def _blob_image(H, W, pts, amp=0.5, sigma=1.3):
    img = np.full((H, W), 0.4, dtype=np.float32)
    for u, v in pts:
        iu, iv = int(u), int(v)
        ys = np.arange(max(iv - 5, 0), min(iv + 6, H))
        xs = np.arange(max(iu - 5, 0), min(iu + 6, W))
        dy = (ys - v)[:, None]
        dx = (xs - u)[None, :]
        img[np.ix_(ys, xs)] += amp * np.exp(-(dx**2 + dy**2) / (2 * sigma**2))
    return np.clip(img, 0, 1)


class TestImageOps:
    def test_pyramid_shapes(self):
        img = jnp.zeros((480, 640), dtype=jnp.float32)
        pyr = image_ops.build_pyramid(img, 3)
        assert pyr[1].shape == (240, 320)
        assert pyr[2].shape == (120, 160)

    def test_hist_equalize_range(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0.4, 0.6, (64, 64)), dtype=jnp.float32)
        out = image_ops.hist_equalize(img)
        assert float(out.max()) > 0.9 and float(out.min()) < 0.1

    def test_bilinear_sample(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        v = image_ops.bilinear_sample(img, jnp.asarray([1.5, 1.5]))
        np.testing.assert_allclose(float(v), (5 + 6 + 9 + 10) / 4.0, atol=1e-6)


class TestDetect:
    def test_detects_blobs(self):
        pts = [(100.5, 80.2), (300.0, 200.0), (500.7, 400.3), (50.0, 400.0)]
        img = jnp.asarray(_blob_image(480, 640, pts))
        uv, valid = klt_ops.detect_grid(
            img, jnp.zeros((1, 2), dtype=jnp.float32), jnp.zeros(1, dtype=bool),
            grid_x=12, grid_y=10, n_max=20,
        )
        uv = np.asarray(uv)[np.asarray(valid)]
        for p in pts:
            d = np.linalg.norm(uv - np.asarray(p), axis=1).min()
            assert d < 2.0, f"blob {p} not detected (nearest {d:.1f} px)"

    def test_occupancy_suppression(self):
        pts = [(100.5, 80.2), (300.0, 200.0)]
        img = jnp.asarray(_blob_image(480, 640, pts))
        occ = jnp.asarray([[100.5, 80.2]], dtype=jnp.float32)
        uv, valid = klt_ops.detect_grid(
            img, occ, jnp.ones(1, dtype=bool), grid_x=12, grid_y=10, n_max=20,
            min_px_dist=10.0,
        )
        uv = np.asarray(uv)[np.asarray(valid)]
        d = np.linalg.norm(uv - np.asarray([100.5, 80.2]), axis=1).min()
        assert d > 8.0, "occupied location re-detected"


class TestLK:
    def test_tracks_pure_translation(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(60, 380, size=(20, 2))
        shift = np.array([3.7, -2.4])
        img1 = jnp.asarray(_blob_image(480, 640, pts))
        img2 = jnp.asarray(_blob_image(480, 640, pts + shift))
        pyr1 = tuple(image_ops.build_pyramid(img1, 3))
        pyr2 = tuple(image_ops.build_pyramid(img2, 3))
        uv0 = jnp.asarray(pts, dtype=jnp.float32)
        uv1, ok = klt_ops.pyramidal_lk(pyr1, pyr2, uv0, jnp.ones(20, dtype=bool), 3)
        uv1 = np.asarray(uv1)
        ok = np.asarray(ok)
        assert ok.sum() >= 15
        err = np.linalg.norm(uv1[ok] - (pts[ok] + shift), axis=1)
        assert np.median(err) < 0.3, f"median LK error {np.median(err):.2f} px"

    def test_large_shift_needs_pyramid(self):
        rng = np.random.default_rng(4)
        pts = rng.uniform(100, 350, size=(15, 2))
        shift = np.array([14.0, 9.0])
        img1 = jnp.asarray(_blob_image(480, 640, pts))
        img2 = jnp.asarray(_blob_image(480, 640, pts + shift))
        pyr1 = tuple(image_ops.build_pyramid(img1, 4))
        pyr2 = tuple(image_ops.build_pyramid(img2, 4))
        uv1, ok = klt_ops.pyramidal_lk(pyr1, pyr2, jnp.asarray(pts, dtype=jnp.float32),
                                       jnp.ones(15, dtype=bool), 4)
        err = np.linalg.norm(np.asarray(uv1)[np.asarray(ok)]
                             - (pts[np.asarray(ok)] + shift), axis=1)
        assert len(err) >= 10 and np.median(err) < 0.5


class TestRansac:
    def test_rejects_outliers(self):
        rng = np.random.default_rng(5)
        N = 60
        # rigid scene: points on two depth planes, camera translates
        p3 = np.concatenate([
            rng.uniform(-1, 1, (N // 2, 2)) * 2,
            rng.uniform(-1, 1, (N - N // 2, 2)) * 2,
        ])
        z = np.concatenate([np.full(N // 2, 5.0), np.full(N - N // 2, 12.0)])
        P = np.concatenate([p3, z[:, None]], axis=1)
        t = np.array([0.3, 0.1, 0.0])
        x1 = P[:, :2] / P[:, 2:3]
        P2 = P - t
        x2 = P2[:, :2] / P2[:, 2:3]
        # corrupt 10 correspondences
        x2_bad = x2.copy()
        x2_bad[:10] += rng.uniform(0.05, 0.15, (10, 2))
        inl = np.asarray(klt_ops.ransac_fundamental(
            jnp.asarray(x1), jnp.asarray(x2_bad), jnp.ones(N, dtype=bool),
            jax.random.PRNGKey(0)))
        assert inl[10:].sum() >= 45, f"too many true inliers lost: {inl[10:].sum()}"
        assert inl[:10].sum() <= 2, f"outliers kept: {inl[:10].sum()}"


@pytest.mark.slow
def test_tracker_on_rendered_sequence():
    """Full tracker on rendered sim frames: ids persist, tracks match the
    ground-truth projections (the test_tracking.cpp analogue)."""
    from plviwo_tpu.ops import cam as cam_ops
    from plviwo_tpu.ops import lie

    cfg = SimConfig(duration=3.0, seed=2, n_landmarks=300, n_pts=60)
    sim = Simulator(cfg)
    tracker = KltTracker(n_pts=80, cam_k=np.asarray(cfg.intrinsics),
                         grid_x=12, grid_y=10)
    ts = sim.cam_times()[:10]
    prev = None
    epi = []
    R_ItoC = np.asarray(lie.quat_2_rot(jnp.asarray(cfg.cam_ext_q)))
    p_ext = np.asarray(cfg.cam_ext_p)

    def cam_pose(t):
        kin = sim.gt_kin(t)
        R_GtoC = R_ItoC @ np.asarray(kin["R_GtoI"])
        cc = np.asarray(kin["p_IinG"]) - R_GtoC.T @ p_ext
        return R_GtoC, cc

    for t in ts:
        img = sim.render_frame(t, with_lines=False)
        ids, uvs = tracker.feed(img)
        assert len(ids) > 20
        if prev is not None:
            t0, ids0, uvs0 = prev
            common, i1, i0 = np.intersect1d(ids, ids0, return_indices=True)
            assert len(common) > 10, "tracks do not persist"
            # epipolar consistency against the TRUE camera motion
            R0, c0 = cam_pose(t0)
            R1, c1 = cam_pose(t)
            R_rel = R1 @ R0.T                      # C0 -> C1
            t_rel = R1 @ (c0 - c1)                 # translation in C1
            E = np.cross(t_rel, R_rel.T, axisa=0, axisb=0).T  # [t]x R
            k = jnp.asarray(cfg.intrinsics)
            x0 = np.asarray(cam_ops.undistort_radtan(jnp.asarray(uvs0[i0]), k))
            x1 = np.asarray(cam_ops.undistort_radtan(jnp.asarray(uvs[i1]), k))
            h0 = np.concatenate([x0, np.ones((len(x0), 1))], 1)
            h1 = np.concatenate([x1, np.ones((len(x1), 1))], 1)
            l1 = h0 @ E.T
            d = np.abs(np.sum(h1 * l1, axis=1)) / np.linalg.norm(l1[:, :2], axis=1)
            epi.extend(d.tolist())
        prev = (t, ids, uvs)
    # tracks should satisfy the true epipolar geometry to sub-pixel levels
    # (normalized units; ~1/fx rad per pixel)
    assert len(epi) > 100
    med = float(np.median(epi))
    assert med < 2.0 / 300.0, f"median epipolar error {med:.5f} (norm. units)"


@pytest.mark.slow
def test_image_driven_vio_e2e():
    """The full image path: rendered frames -> KLT tracker -> MSCKF filter.
    This is the honest front-end integration (no simulator data association)."""
    import jax.numpy as jnp2

    from plviwo_tpu.config.options import EstimatorOptions
    from plviwo_tpu.core.system import VioSystem
    from plviwo_tpu.ops import lie

    cfg = SimConfig(duration=8.0, seed=2, n_landmarks=350)
    sim = Simulator(cfg)
    tracker = KltTracker(n_pts=80, cam_k=np.asarray(cfg.intrinsics),
                         grid_x=12, grid_y=10)
    opts = EstimatorOptions()
    opts.cam.n_pts = 80
    opts.cam.max_msckf = 30
    opts.cam.sigma_pix = 1.5
    opts.cam.min_track_length = 4
    opts.cam.chi2_mult = 8.0
    sys_ = VioSystem(opts)
    sys_.set_calibration(cfg.intrinsics, cfg.cam_ext_q, cfg.cam_ext_p)
    imu_t, imu_w, imu_a = sim.imu_stream()
    kin0 = sim.gt_kin(imu_t[0])
    q0 = lie.rot_2_quat(kin0["R_GtoI"])
    sys_.initialize_from(float(imu_t[0]), q0, kin0["p_IinG"], kin0["v_IinG"],
                         sim.bg_true[0], sim.ba_true[0])

    cam_ts = sim.cam_times()
    frames = iter([(float(t), sim.render_frame(t, with_lines=False))
                   for t in cam_ts])
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
    assert sys_.stats["updates"] > 30, sys_.stats
    assert rmse < 0.6, f"image-driven VIO RMSE {rmse:.3f} m, stats {sys_.stats}"
