"""Zero-velocity updater (L3).

The reference *references* a ZuptUpdater but the snapshot does not contain it
(SURVEY.md defect #1: `SystemManager.cpp:51` constructs it, the source is
missing).  This implements the intended behavior (MINS-style):

- stationarity detection from short-window IMU statistics (gyro magnitude and
  accel variance below thresholds);
- when stationary, a 3-row pseudo-measurement v = 0 (+ optionally w - bg = 0)
  updates the filter, clamping velocity drift at stops — critical for the
  urban driving sequences with traffic lights.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import ekf

F64 = jnp.float64


class ZuptUpdater:
    def __init__(self, layout, chi2_table, sigma_v=0.05, sigma_w=0.01,
                 gyro_thresh=0.02, accel_var_thresh=0.05, window=0.3,
                 chi2_mult=5.0):
        self.layout = layout
        self.chi2_table = chi2_table
        self.sigma_v = sigma_v
        self.sigma_w = sigma_w
        self.gyro_thresh = gyro_thresh
        self.accel_var_thresh = accel_var_thresh
        self.window = window
        self.chi2_mult = chi2_mult
        self.stats = {"applied": 0, "rejected": 0}
        self.last_zupt_t = -np.inf

    def is_stationary(self, imu_t, imu_w, imu_a, bg) -> bool:
        """Short-window stationarity test (gyro magnitude + accel variance)."""
        if len(imu_t) < 5:
            return False
        t_hi = imu_t[-1]
        sel = imu_t >= t_hi - self.window
        if sel.sum() < 5:
            return False
        w = np.asarray(imu_w)[sel] - np.asarray(bg)
        a = np.asarray(imu_a)[sel]
        gyro_ok = np.linalg.norm(w, axis=1).max() < self.gyro_thresh
        accel_ok = np.sqrt(
            np.mean(np.sum((a - a.mean(0)) ** 2, axis=1))) < self.accel_var_thresh
        return bool(gyro_ok and accel_ok)

    def try_update(self, system, imu_w_latest) -> bool:
        """Apply the zero-velocity (+ gyro-bias) pseudo-measurement."""
        st = system.state
        lo = self.layout
        t = float(st.time)
        if t - self.last_zupt_t < 0.2:
            return False
        D = lo.dim
        # rows: v = 0 (3), w_meas - bg = 0 (3)
        H = np.zeros((6, D))
        H[0:3, lo.IMU_V : lo.IMU_V + 3] = np.eye(3)
        H[3:6, lo.IMU_BG : lo.IMU_BG + 3] = np.eye(3)
        r = np.concatenate([
            -np.asarray(st.v),                     # 0 - v
            np.asarray(imu_w_latest) - np.asarray(st.bg),  # w_meas - bg ~ 0
        ])
        H = jnp.asarray(H)
        r = jnp.asarray(r)
        r_diag = jnp.asarray(
            [self.sigma_v**2] * 3 + [self.sigma_w**2] * 3, dtype=F64)
        mask = jnp.ones(6, dtype=bool)
        chi = float(ekf.chi2(st.cov, H, r, r_diag, mask))
        if chi > float(self.chi2_table[6]) * self.chi2_mult:
            self.stats["rejected"] += 1
            return False
        system.state = ekf.update(st, H, r, r_diag, mask)
        self.stats["applied"] += 1
        self.last_zupt_t = t
        return True
