"""State/trajectory/timing recording (reference: viw::State_Logger,
State_Logger.h:53-240: MINS-format est/std/gt triplets consumed by the NEES
tooling, a TUM trajectory file, and a timing file; plus check_files)."""

from __future__ import annotations

import os

import numpy as np


class StateRecorder:
    """Accumulates per-clone state snapshots and writes MINS-style outputs."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.rows_est = []  # t, q(4), p(3), v(3), bg(3), ba(3)
        self.rows_std = []
        self.rows_gt = []
        self.traj = []      # t, p(3), q(4)
        self.timing = []    # t, total_ms per-stage...
        self.timing_names = None

    def record(self, system, gt=None):
        """Snapshot the current filter state (call after each clone)."""
        st = system.state
        t = float(st.time)
        q = np.asarray(st.q)
        p = np.asarray(st.p)
        v = np.asarray(st.v)
        bg = np.asarray(st.bg)
        ba = np.asarray(st.ba)
        self.rows_est.append(np.concatenate([[t], q, p, v, bg, ba]))
        d = np.sqrt(np.maximum(np.diag(np.asarray(st.cov))[:15], 0.0))
        self.rows_std.append(np.concatenate([[t], d]))
        self.traj.append(np.concatenate([[t], p, q]))
        if gt is not None:
            self.rows_gt.append(
                np.concatenate([[t], gt["q"], gt["p"], gt["v"], gt["bg"], gt["ba"]])
            )

    def record_timing(self, t, values: dict):
        if self.timing_names is None:
            self.timing_names = ["t"] + list(values.keys())
        self.timing.append([t] + [values.get(k, 0.0) for k in self.timing_names[1:]])

    def save(self):
        def dump(name, rows):
            if not rows:
                return
            np.savetxt(os.path.join(self.out_dir, name), np.asarray(rows), fmt="%.9f")

        dump("state_est.txt", self.rows_est)
        dump("state_std.txt", self.rows_std)
        dump("state_gt.txt", self.rows_gt)
        if self.traj:
            from ..eval.loader import save_tum

            arr = np.asarray(self.traj)
            save_tum(os.path.join(self.out_dir, "trajectory.txt"),
                     arr[:, 0], arr[:, 1:4], arr[:, 4:8])
        if self.timing:
            from ..eval.loader import save_timing

            save_timing(os.path.join(self.out_dir, "timing.txt"),
                        self.timing_names, self.timing)

    def check_files(self) -> bool:
        """Post-run sanity: outputs exist and are non-empty
        (reference: State_Logger::check_files, State_Logger.h:215-238)."""
        ok = True
        for name in ("trajectory.txt",):
            p = os.path.join(self.out_dir, name)
            ok &= os.path.exists(p) and os.path.getsize(p) > 0
        return ok
