"""Line tracker (L1 host orchestration): the `TrackLSD` equivalent.

Per frame (mirrors TrackLSD::feed_monocular, TrackLSD.cpp:70-192):
1. detect segments (`ops/line_detect`: anchor walks + collinear merge);
2. attach the current KLT point tracks to segments
   (`assign_points_to_lines`, batched);
3. match against the previous frame's segments by *shared point ids* —
   >= 2 shared points, or 1 shared + midpoint distance gate
   (LineMatch/LineSimilar, TrackLSD.cpp:368-433, 816-830);
4. unmatched segments get fresh ids; segments with no attached points are
   dropped (the paper's point-assisted pruning).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import line_detect
from .lines import assign_points_to_lines


class LineTracker:
    def __init__(self, max_lines=40, min_length=25.0, attach_dist=5.0,
                 midpoint_gate=10.0, grid=16, n_anchors=256,
                 merge_extend=False):
        self.max_lines = max_lines
        self.min_length = min_length
        self.attach_dist = attach_dist
        self.midpoint_gate = midpoint_gate
        self.grid = grid
        self.n_anchors = n_anchors
        # merge_extend=True joins collinear fragments into their union span
        # (full MergeLines, TrackLSD.cpp:450-622); the reference SHIPS with
        # MergeLines bypassed, and extended endpoints localize worse
        # (measured +0.15 m ATE on the image-driven sim), so keep-longest
        # NMS is the default here too
        self.merge_extend = merge_extend
        self.prev: list[dict] = []  # [{lid, seg, pids}]
        self._next_id = 0

    def feed(self, img, pt_ids, pt_uvs):
        """Process one frame with the current KLT points.

        Returns (line_ids (K,), segs (K, 4), pids (list of K id-arrays) —
        the attached KLT point ids per line, for the PLC rows).
        """
        segs_raw, lengths, valid = line_detect.detect_segments(
            jnp.asarray(img, dtype=jnp.float32), grid=self.grid,
            n_anchors=self.n_anchors,
        )
        segs = line_detect.merge_segments(segs_raw, lengths, valid,
                                          min_length=self.min_length,
                                          extend=self.merge_extend)
        if len(segs) == 0:
            self.prev = []
            return np.zeros(0, dtype=np.int64), np.zeros((0, 4)), []
        segs = segs[: self.max_lines]

        # --- attach points ---
        pt_uvs = np.atleast_2d(np.asarray(pt_uvs, dtype=np.float64))
        if len(pt_ids) > 0:
            A = np.asarray(assign_points_to_lines(
                jnp.asarray(segs), jnp.asarray(pt_uvs),
                jnp.ones(len(pt_ids), dtype=bool),
                dist_thresh=self.attach_dist,
            ))
            pids = [set(np.asarray(pt_ids)[A[i]].tolist()) for i in range(len(segs))]
        else:
            pids = [set() for _ in range(len(segs))]

        # the paper's pruning: lines without attached points are dropped
        keep = [i for i in range(len(segs)) if len(pids[i]) > 0]
        segs = segs[keep]
        pids = [pids[i] for i in keep]

        # --- temporal matching by shared ids ---
        out = []
        used_prev = set()
        for i, (seg, pid) in enumerate(zip(segs, pids)):
            best = None
            best_shared = 0
            for j, pr in enumerate(self.prev):
                if j in used_prev:
                    continue
                shared = len(pid & pr["pids"])
                if shared == 0:
                    continue
                if shared >= 2:
                    score = shared
                elif shared == 1:
                    m_new = 0.5 * (seg[0:2] + seg[2:4])
                    m_old = 0.5 * (pr["seg"][0:2] + pr["seg"][2:4])
                    if np.linalg.norm(m_new - m_old) > self.midpoint_gate:
                        continue
                    score = 1
                if score > best_shared:
                    best_shared = score
                    best = j
            if best is not None:
                lid = self.prev[best]["lid"]
                used_prev.add(best)
            else:
                lid = self._next_id
                self._next_id += 1
            out.append({"lid": lid, "seg": seg, "pids": pid})

        self.prev = out
        ids = np.asarray([o["lid"] for o in out], dtype=np.int64)
        segs_out = np.asarray([o["seg"] for o in out])
        pids_out = [np.asarray(sorted(o["pids"]), dtype=np.int64) for o in out]
        return ids, segs_out, pids_out
