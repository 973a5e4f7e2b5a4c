"""Fiducial tag detection (ops/aruco.py) — the TrackAruco substrate.

The reference wraps cv::aruco::detectMarkers (TrackAruco.cpp:97) and feeds
corner features with ids tag_id + n*max_tag_id.  Here the detector itself is
rebuilt as a rotation x scale NCC template bank + batched bit decode; these
tests paint tags into synthetic images and require correct id decode and
subpixel-accurate, consistently-ordered corners.
"""

import numpy as np
import pytest

from plviwo_tpu.ops import aruco


def _paint(img, bitmap, cx, cy, s, theta=0.0, ss=4):
    """Paint a tag bitmap (rendered at `cell` px/cell) into img, centered at
    (cx, cy), scaled to s px/cell, rotated by theta (image CW, y-down).
    ss x ss supersampling anti-aliases the edges so ground-truth corner
    positions are subpixel-faithful."""
    cell = 8
    n = bitmap.shape[0] / cell  # cells across (8 with quiet zone)
    H, W = img.shape
    off = (np.arange(ss) + 0.5) / ss - 0.5
    acc = np.zeros((H, W))
    cov = np.zeros((H, W))
    ct, st = np.cos(theta), np.sin(theta)
    ys, xs = np.meshgrid(np.arange(H, dtype=float),
                         np.arange(W, dtype=float), indexing="ij")
    for oy in off:
        for ox in off:
            X = xs + ox - cx
            Y = ys + oy - cy
            u = (ct * X + st * Y) / s
            v = (-st * X + ct * Y) / s
            inside = (np.abs(u) < n / 2) & (np.abs(v) < n / 2)
            bi = np.clip(((v + n / 2) * cell).astype(int), 0,
                         bitmap.shape[0] - 1)
            bj = np.clip(((u + n / 2) * cell).astype(int), 0,
                         bitmap.shape[1] - 1)
            acc += np.where(inside, bitmap[bi, bj], 0.0)
            cov += inside
    w = cov / (ss * ss)
    img[:] = (1 - w) * img + w * np.where(cov > 0, acc / np.maximum(cov, 1), 0)
    return img


def _gt_corners(cx, cy, s, theta):
    """True painted positions of the canonical TL,TR,BR,BL border corners."""
    c = np.array([[-3.0, -3.0], [3.0, -3.0], [3.0, 3.0], [-3.0, 3.0]]) * s
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return np.array([cx, cy]) + c @ R.T


@pytest.fixture(scope="module")
def det():
    return aruco.TagDetector(max_det=4)


def _base_img(seed=0):
    rng = np.random.default_rng(seed)
    img = 0.55 + 0.06 * rng.normal(size=(240, 320))
    return np.clip(img, 0, 1).astype(np.float32)


def test_family_properties():
    codes = aruco.tag_family()
    assert codes.shape == (16, 16)
    c4 = aruco._codes_rot4(codes)
    for i in range(len(codes)):
        for j in range(len(codes)):
            for r in range(4):
                if i == j and r == 0:
                    continue
                assert np.sum(codes[i] != c4[j, r]) >= 4


def test_detect_axis_aligned(det):
    img = _base_img()
    bm = aruco.tag_bitmap(det.codes[3])
    _paint(img, bm, 160.3, 120.7, 5.0)
    out = {k: np.asarray(v) for k, v in det.detect(img).items()}
    ok = np.nonzero(out["valid"])[0]
    assert len(ok) == 1, out
    i = ok[0]
    assert out["tag_id"][i] == 3
    gt = _gt_corners(160.3, 120.7, 5.0, 0.0)
    err = np.linalg.norm(out["corners"][i] - gt, axis=-1)
    assert err.max() < 1.0, (out["corners"][i], gt)


def test_detect_rotated(det):
    for theta in (0.3, 0.9, 2.0, -0.6):
        img = _base_img(1)
        bm = aruco.tag_bitmap(det.codes[7])
        _paint(img, bm, 100.0, 130.0, 6.0, theta)
        out = {k: np.asarray(v) for k, v in det.detect(img).items()}
        ok = np.nonzero(out["valid"])[0]
        assert len(ok) == 1, (theta, out["score"], out["n_match"])
        i = ok[0]
        assert out["tag_id"][i] == 7, theta
        gt = _gt_corners(100.0, 130.0, 6.0, theta)
        err = np.linalg.norm(out["corners"][i] - gt, axis=-1)
        assert err.max() < 1.8, (theta, err)


def test_detect_two_tags_and_scale_interp(det):
    img = _base_img(2)
    _paint(img, aruco.tag_bitmap(det.codes[0]), 80.0, 60.0, 4.6)
    _paint(img, aruco.tag_bitmap(det.codes[12]), 230.0, 170.0, 6.8)
    out = {k: np.asarray(v) for k, v in det.detect(img).items()}
    ok = np.nonzero(out["valid"])[0]
    got = {int(out["tag_id"][i]) for i in ok}
    assert got == {0, 12}, (got, out["score"])
    for i in ok:
        if out["tag_id"][i] == 0:
            gt = _gt_corners(80.0, 60.0, 4.6, 0.0)
        else:
            gt = _gt_corners(230.0, 170.0, 6.8, 0.0)
        err = np.linalg.norm(out["corners"][i] - gt, axis=-1)
        assert err.max() < 1.8, (int(out["tag_id"][i]), err)


def test_no_false_positives(det):
    img = _base_img(3)
    out = {k: np.asarray(v) for k, v in det.detect(img).items()}
    assert not np.any(out["valid"]), out["score"]


def test_corner_order_stable_under_rotation(det):
    """Corner n must track the same physical tag corner as the view rotates
    (the property the filter needs for corner-feature tracks)."""
    bm = aruco.tag_bitmap(det.codes[5])
    prev = None
    for theta in (0.0, 0.25, 0.5, 0.75):
        img = _base_img(4)
        _paint(img, bm, 160.0, 120.0, 6.0, theta)
        out = {k: np.asarray(v) for k, v in det.detect(img).items()}
        i = np.nonzero(out["valid"])[0]
        assert len(i) == 1 and out["tag_id"][i[0]] == 5
        gt = _gt_corners(160.0, 120.0, 6.0, theta)
        err = np.linalg.norm(out["corners"][i[0]] - gt, axis=-1)
        assert err.max() < 1.8, (theta, err)
        prev = out


@pytest.mark.slow
def test_sim_ground_tags_detected_and_world_consistent():
    """End-to-end front-end loop: tags painted on the sim ground plane
    (perspective raycast render, nadir camera) must be detected, decoded,
    and each corner feature must reproject to its fixed world corner point
    (the property the MSCKF needs from TrackAruco corner tracks)."""
    import jax.numpy as jnp

    from plviwo_tpu.ops import cam as cam_ops
    from plviwo_tpu.sim.simulator import SimConfig, Simulator
    from plviwo_tpu.update.aruco_tracker import ArucoTracker

    cfg = SimConfig(
        duration=8.0, seed=3, n_tags=5, tag_size=0.5,
        width=320, height=240,
        intrinsics=(300.0, 300.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0),
        cam_ext_q=(1.0, 0.0, 0.0, 0.0),  # nadir: camera looks straight down
        cam_ext_p=(0.0, 0.0, 0.0),
    )
    sim = Simulator(cfg)
    tracker = ArucoTracker(max_tag_id=16)
    corners_w = sim.tag_corners_world()
    k = jnp.asarray(cfg.intrinsics)

    hits, errs = 0, []
    times = sim.cam_times()[::3][:8]
    for t in times:
        img = sim.render_frame(t, with_lines=False)
        ids, uvs = tracker.feed(img)
        if len(ids) == 0:
            continue
        kin = sim.gt_kin(t)
        R_GtoI = np.asarray(kin["R_GtoI"])
        p_I = np.asarray(kin["p_IinG"])
        import plviwo_tpu.ops.lie as lie
        R_ItoC = np.asarray(lie.quat_2_rot(jnp.asarray(cfg.cam_ext_q,
                                                       dtype=jnp.float64)))
        for fid, uv in zip(ids, uvs):
            rel = int(fid - tracker.id_base)
            tag, n = rel % 16, rel // 16
            p_G = corners_w[tag, n]
            p_C = R_ItoC @ (R_GtoI @ (p_G - p_I)) + np.asarray(cfg.cam_ext_p)
            assert p_C[2] > 0.1
            uv_gt = np.asarray(cam_ops.project(jnp.asarray(p_C[None]), k,
                                               cam_ops.RADTAN))[0]
            errs.append(np.linalg.norm(uv - uv_gt))
            hits += 1
    errs = np.asarray(errs)
    assert hits >= 8, hits
    # median: decode-correct corners must be subpixel-consistent with their
    # world points; max guards against corner-order mixups (those would be
    # ~tag-size errors, tens of px)
    assert np.median(errs) < 1.5, (np.median(errs), errs.max(), hits)
    assert errs.max() < 4.0, errs


@pytest.mark.slow
def test_tags_e2e_replay():
    """Full replay with ground tags + ArucoTracker corner feed merged into
    the KLT stream (run_sim --tags): must stay bounded on the weak-geometry
    nadir-camera scenario."""
    import contextlib
    import io
    import json

    from plviwo_tpu.run_sim import main as run_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = run_main(["--platform", "cpu", "--duration", "8", "--seed", "2",
                       "--tags", "--out", "/tmp/_tags_traj.txt"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["ate_rmse_m"] < 1.0, out
