"""Descriptor-based point tracker (L1 host orchestration).

Rebuild of `ov_core::TrackDescriptor` (track/TrackDescriptor.cpp): per frame
— detect corners, describe (batched BRIEF, ops/descriptor.py), match against
the previous frame's descriptors by mutual-best ratio test, RANSAC-gate,
replenish.  Same (ids, uvs) output contract as `KltTracker`, so it drops
into the same feed path.  The reference ships this as the alternative to
KLT; its PL-VIWO config does not use it, and neither do ours by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cam as cam_ops
from ..ops import descriptor as desc_ops
from ..ops import image as image_ops
from ..ops import klt as klt_ops

F32 = jnp.float32


class DescTracker:
    def __init__(self, n_pts=150, grid_x=12, grid_y=10, min_px_dist=10,
                 n_bits=256, max_dist=80.0, ratio=0.8, cam_k=None,
                 distortion_model=0, histogram=True, seed=0):
        self.n_pts = n_pts
        self.grid_x = grid_x
        self.grid_y = grid_y
        self.min_px_dist = min_px_dist
        self.pattern = desc_ops.brief_pattern(n_bits=n_bits)
        self.max_dist = max_dist
        self.ratio = ratio
        self.cam_k = jnp.asarray(cam_k) if cam_k is not None else None
        self.model = distortion_model
        self.histogram = histogram

        self.uv = np.zeros((n_pts, 2), dtype=np.float64)
        self.valid = np.zeros(n_pts, dtype=bool)
        self.ids = np.full(n_pts, -1, dtype=np.int64)
        self.desc = None  # (n_pts, B) bool of the previous frame
        self._next_id = 0
        self.key = jax.random.PRNGKey(seed)

    def feed(self, img):
        """Process one grayscale frame; returns (ids (K,), uvs (K, 2))."""
        img = jnp.asarray(img, dtype=F32)
        if self.histogram:
            img = image_ops.hist_equalize(img)

        # detect this frame's corners (full budget, no occupancy seed)
        det_uv, det_ok = klt_ops.detect_grid(
            img, jnp.zeros((self.n_pts, 2), dtype=F32),
            jnp.zeros(self.n_pts, dtype=bool),
            self.grid_x, self.grid_y, self.n_pts,
            min_px_dist=float(self.min_px_dist),
        )
        det_desc = desc_ops.describe(img, det_uv, det_ok, self.pattern)

        new_uv = np.zeros_like(self.uv)
        new_valid = np.zeros_like(self.valid)
        new_ids = np.full_like(self.ids, -1)

        if self.desc is not None and self.valid.any():
            idx2 = np.asarray(desc_ops.match(
                self.desc, jnp.asarray(self.valid), det_desc, det_ok,
                self.max_dist, self.ratio))
            matched_prev = np.nonzero(idx2 >= 0)[0]
            uv_prev = self.uv[matched_prev]
            uv_next = np.asarray(det_uv, dtype=np.float64)[idx2[matched_prev]]
            keep = np.ones(len(matched_prev), dtype=bool)
            if self.cam_k is not None and len(matched_prev) >= 12:
                pad = self.n_pts
                z1 = np.zeros((pad, 2)); z1[: len(uv_prev)] = uv_prev
                z2 = np.zeros((pad, 2)); z2[: len(uv_next)] = uv_next
                vm = np.zeros(pad, dtype=bool); vm[: len(uv_prev)] = True
                zn1 = cam_ops.undistort(jnp.asarray(z1), self.cam_k, self.model)
                zn2 = cam_ops.undistort(jnp.asarray(z2), self.cam_k, self.model)
                self.key, sub = jax.random.split(self.key)
                inl = np.asarray(klt_ops.ransac_fundamental(
                    zn1, zn2, jnp.asarray(vm), sub))
                keep = inl[: len(matched_prev)]
            for s, (slot_prev, ok_i) in enumerate(zip(matched_prev, keep)):
                if not ok_i:
                    continue
                new_uv[slot_prev] = uv_next[s]
                new_valid[slot_prev] = True
                new_ids[slot_prev] = self.ids[slot_prev]

        # replenish free slots with unmatched detections
        used_det = set()
        for slot in np.nonzero(new_valid)[0]:
            pass  # matched slots keep their det index implicitly
        det_uv_np = np.asarray(det_uv, dtype=np.float64)
        det_ok_np = np.asarray(det_ok)
        taken = np.zeros(len(det_uv_np), dtype=bool)
        if self.desc is not None and self.valid.any():
            for slot_prev in matched_prev:
                di = idx2[slot_prev]
                if di >= 0:
                    taken[di] = True
        free_slots = np.nonzero(~new_valid)[0]
        j = 0
        for i in range(len(det_uv_np)):
            if not det_ok_np[i] or taken[i] or j >= len(free_slots):
                continue
            # min-distance suppression against tracked features
            if new_valid.any():
                dmin = np.min(np.linalg.norm(
                    new_uv[new_valid] - det_uv_np[i], axis=1))
                if dmin < self.min_px_dist:
                    continue
            s = free_slots[j]
            new_uv[s] = det_uv_np[i]
            new_valid[s] = True
            new_ids[s] = self._next_id
            self._next_id += 1
            j += 1

        self.uv, self.valid, self.ids = new_uv, new_valid, new_ids
        # re-describe at the (possibly matched) feature locations for the
        # next frame's matching
        self.desc = desc_ops.describe(
            img, jnp.asarray(self.uv, dtype=F32), jnp.asarray(self.valid),
            self.pattern)
        sel = self.valid
        return self.ids[sel].copy(), self.uv[sel].copy()
