"""Filter checkpoint/resume.

The reference has none (SURVEY.md 5.4: recovery = rerun the bag).  Here the
full estimator state — FilterState arrays, feature/line databases, buffers,
updater bookkeeping — serializes to a single npz + pickle blob, so a long
replay can snapshot and resume mid-sequence (elastic recovery for the batch
replay layer).
"""

from __future__ import annotations

import dataclasses
import pickle

import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, system):
    """Snapshot a VioSystem to `path` (pickle)."""
    state_arrays = {
        f.name: np.asarray(getattr(system.state, f.name))
        for f in dataclasses.fields(system.state)
        if f.name != "layout"
    }
    blob = {
        "state": state_arrays,
        "layout": system.state.layout,
        "initialized": system.initialized,
        "fdb": system.fdb,
        "ldb": system.ldb,
        "imu_buf": (system.imu_buf.t, system.imu_buf.w, system.imu_buf.a),
        "wheel_buf": (system.wheel_buf.t, system.wheel_buf.m1, system.wheel_buf.m2),
        "last_wheel_clone_t": system.last_wheel_clone_t,
        "pending_frames": list(system.pending_frames),
        "stats": system.stats,
        "traj": system.traj,
        "gps": system.gps,
        "opts": system.opts,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_checkpoint(path: str):
    """Restore a VioSystem from `path`."""
    from ..core.system import VioSystem

    with open(path, "rb") as f:
        blob = pickle.load(f)
    system = VioSystem(blob["opts"])
    st = system.state
    updates = {k: jnp.asarray(v) for k, v in blob["state"].items()}
    system.state = st.replace(**updates)
    system.initialized = blob["initialized"]
    system.fdb = blob["fdb"]
    system.ldb = blob["ldb"]
    t, w, a = blob["imu_buf"]
    system.imu_buf.t, system.imu_buf.w, system.imu_buf.a = t, w, a
    t, m1, m2 = blob["wheel_buf"]
    system.wheel_buf.t, system.wheel_buf.m1, system.wheel_buf.m2 = t, m1, m2
    system.last_wheel_clone_t = blob["last_wheel_clone_t"]
    from collections import deque

    system.pending_frames = deque(blob["pending_frames"])
    system.stats = blob["stats"]
    system.traj = blob["traj"]
    system.gps = blob["gps"]
    return system
