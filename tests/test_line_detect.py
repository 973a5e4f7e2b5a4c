"""Line detector + tracker tests on rendered imagery."""

import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops import line_detect
from plviwo_tpu.sim.simulator import SimConfig, Simulator
from plviwo_tpu.update.line_tracker import LineTracker
from plviwo_tpu.update.tracker import KltTracker


def _line_image(H, W, segs, depth=0.4):
    img = np.full((H, W), 0.5, dtype=np.float32)
    for x1, y1, x2, y2 in segs:
        n = int(max(abs(x2 - x1), abs(y2 - y1)) * 2)
        for t in np.linspace(0, 1, n):
            x = x1 + (x2 - x1) * t
            y = y1 + (y2 - y1) * t
            iu, iv = int(round(x)), int(round(y))
            if 1 <= iu < W - 1 and 1 <= iv < H - 1:
                img[iv, iu] -= depth
                img[iv + 1, iu] -= depth * 0.5
    return np.clip(img, 0, 1)


def _seg_dist(a, b):
    """Symmetric endpoint distance allowing endpoint swap."""
    d1 = np.linalg.norm(a[0:2] - b[0:2]) + np.linalg.norm(a[2:4] - b[2:4])
    d2 = np.linalg.norm(a[0:2] - b[2:4]) + np.linalg.norm(a[2:4] - b[0:2])
    return min(d1, d2) / 2.0


def _line_angle(seg):
    return np.arctan2(seg[3] - seg[1], seg[2] - seg[0]) % np.pi


class TestDetect:
    def test_detects_synthetic_segments(self):
        gt = np.array([
            [100.0, 100.0, 300.0, 120.0],
            [400.0, 50.0, 420.0, 300.0],
            [150.0, 350.0, 350.0, 250.0],
        ])
        img = _line_image(480, 640, gt)
        segs_raw, lens, valid = line_detect.detect_segments(jnp.asarray(img))
        segs = line_detect.merge_segments(segs_raw, lens, valid, min_length=40.0)
        assert len(segs) >= 3
        for g in gt:
            # some detected segment must be collinear with g (angle + distance
            # of midpoint to the gt line)
            ga = _line_angle(g)
            best = np.inf
            for s in segs:
                da = abs((_line_angle(s) - ga + np.pi / 2) % np.pi - np.pi / 2)
                mid = 0.5 * (s[0:2] + s[2:4])
                d = np.array([g[2] - g[0], g[3] - g[1]])
                d = d / np.linalg.norm(d)
                n = np.array([-d[1], d[0]])
                perp = abs((mid - g[0:2]) @ n)
                if da < 0.05 and perp < 3.0:
                    best = min(best, perp)
            assert best < 3.0, f"gt line {g} not detected"

    def test_runlen_detector_matches_walk_on_synthetic(self):
        """`detect_segments_runlen` (gather-free pointer-doubling) must find
        the same structural lines as the anchor walk: every gt line at
        >= 75% of its length with midpoint-perpendicular error < 4 px."""
        gt = np.array([
            [100.0, 100.0, 300.0, 120.0],   # 5.7 deg off-lattice
            [400.0, 50.0, 420.0, 300.0],    # 4.6 deg off vertical
            [150.0, 350.0, 350.0, 250.0],   # exactly on a lattice ray
            [50.0, 430.0, 600.0, 460.0],    # long shallow diagonal
            [500.0, 100.0, 560.0, 310.0],   # steep
        ])
        img = _line_image(480, 640, gt)
        segs_raw, lens, valid = line_detect.detect_segments_runlen(
            jnp.asarray(img))
        segs = line_detect.merge_segments(segs_raw, lens, valid,
                                          min_length=40.0)
        for g in gt:
            ga = _line_angle(g)
            gl = np.linalg.norm(g[2:4] - g[0:2])
            d = np.array([g[2] - g[0], g[3] - g[1]]) / gl
            n = np.array([-d[1], d[0]])
            best_len = 0.0
            for s in segs:
                da = abs((_line_angle(s) - ga + np.pi / 2) % np.pi
                         - np.pi / 2)
                mid = 0.5 * (s[0:2] + s[2:4])
                perp = abs((mid - g[0:2]) @ n)
                if da < 0.06 and perp < 4.0:
                    best_len = max(best_len,
                                   np.linalg.norm(s[2:4] - s[0:2]))
            assert best_len >= 0.75 * gl, (
                f"gt line {g}: best collinear len {best_len} < 0.75*{gl}")

    def test_merge_removes_duplicates(self):
        # two collinear overlapping candidates -> one kept
        segs = jnp.asarray([
            [10.0, 10.0, 110.0, 10.0],
            [40.0, 10.5, 140.0, 10.5],
            [10.0, 200.0, 110.0, 200.0],
        ])
        lens = jnp.asarray([100.0, 100.0, 100.0])
        valid = jnp.ones(3, dtype=bool)
        out = line_detect.merge_segments(segs, lens, valid, min_length=25.0)
        assert len(out) == 2

    def test_merge_extends_endpoints(self):
        """Round-3 MergeLines parity (TrackLSD.cpp:450-622): collinear
        fragments JOIN into one long segment spanning the cluster, instead
        of the shorter fragment being dropped."""
        segs = jnp.asarray([
            [10.0, 50.0, 120.0, 50.0],    # anchor (longest)
            [115.0, 50.4, 220.0, 50.4],   # collinear continuation
            [215.0, 49.7, 300.0, 49.7],   # chains onto the extended span
        ])
        lens = jnp.asarray([110.0, 105.0, 85.0])
        valid = jnp.ones(3, dtype=bool)
        out = line_detect.merge_segments(segs, lens, valid, min_length=25.0)
        assert len(out) == 1
        xs = sorted([out[0][0], out[0][2]])
        assert xs[0] < 15.0 and xs[1] > 295.0, out  # full 10..300 span
        # keep-longest mode: no span extension, so the far fragment cannot
        # chain onto the first -> two survivors, neither extended
        out_nms = line_detect.merge_segments(segs, lens, valid,
                                             min_length=25.0, extend=False)
        assert len(out_nms) == 2
        for seg in out_nms:
            xs = sorted([seg[0], seg[2]])
            assert xs[1] - xs[0] < 115.0  # original fragment lengths


@pytest.mark.slow
def test_line_tracker_on_rendered_sequence():
    cfg = SimConfig(duration=2.0, seed=2, n_lines=40)
    sim = Simulator(cfg)
    kt = KltTracker(n_pts=80, cam_k=np.asarray(cfg.intrinsics))
    lt = LineTracker(max_lines=30, min_length=30.0)
    persist = 0
    prev_ids = None
    for t in sim.cam_times()[:6]:
        img = sim.render_frame(t, with_lines=True)
        pids, puvs = kt.feed(img)
        lids, segs, _ = lt.feed(img, pids, puvs)
        assert len(lids) >= 2, f"too few lines tracked at t={t}"
        if prev_ids is not None:
            persist += len(np.intersect1d(lids, prev_ids))
        prev_ids = lids
    assert persist >= 5, f"line ids do not persist (persist={persist})"


class TestSegmentNms:
    """Device-side collinear merge (`core/frame._segment_nms`): the fused
    path's MergeLines analogue (TrackLSD.cpp:450-622) must EXTEND the kept
    segment over its suppressed collinear fragments, not just drop them."""

    def test_collinear_fragments_extend_keeper(self):
        from plviwo_tpu.core.frame import _segment_nms

        segs = jnp.asarray([
            [10.0, 50.0, 110.0, 50.0],   # keeper (longest)
            [100.0, 50.5, 160.0, 50.5],  # collinear fragment, overlaps end
            [164.0, 50.0, 200.0, 50.0],  # collinear, within overlap slack
            [10.0, 120.0, 80.0, 120.0],  # separate line, kept
            [30.0, 49.0, 60.0, 49.0],    # interior fragment (absorbed)
        ])
        L = jnp.linalg.norm(segs[:, 2:] - segs[:, :2], axis=-1)
        valid = jnp.ones(5, dtype=bool)
        merged, keep, length = _segment_nms(segs, L, valid, 20.0)
        keep = np.asarray(keep)
        assert keep.tolist() == [True, False, False, True, False]
        m0 = np.asarray(merged[0])
        # extended over fragments 1, 2 and 4: span ~[10, 200] on y=50
        assert m0[0] <= 10.5 and m0[2] >= 199.0, m0
        assert abs(m0[1] - 50.0) < 1.5 and abs(m0[3] - 50.0) < 1.5
        assert float(length[0]) > 185.0
        # the separate line is untouched
        assert np.allclose(np.asarray(merged[3]), np.asarray(segs[3]), atol=1e-5)

    def test_no_duplicates_identity(self):
        from plviwo_tpu.core.frame import _segment_nms

        segs = jnp.asarray([
            [10.0, 10.0, 80.0, 10.0],
            [10.0, 100.0, 10.0, 180.0],
            [200.0, 30.0, 260.0, 90.0],
        ])
        L = jnp.linalg.norm(segs[:, 2:] - segs[:, :2], axis=-1)
        merged, keep, _ = _segment_nms(segs, L, jnp.ones(3, dtype=bool), 20.0)
        assert bool(jnp.all(keep))
        assert np.allclose(np.asarray(merged), np.asarray(segs), atol=1e-5)
