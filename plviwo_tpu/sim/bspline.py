"""Uniform cumulative SE(3) B-spline (analytic pose/velocity/acceleration).

Rebuild of the reference `ov_core/sim/BsplineSE3` (sim/BsplineSE3.h/.cpp):
a uniform cubic B-spline over SE(3) control poses using the cumulative
formulation

    T(u) = T_{i-1} exp(B1(u) O_i) exp(B2(u) O_{i+1}) exp(B3(u) O_{i+2}),
    O_j  = log(T_{j-1}^{-1} T_j),

with the cumulative basis B(u) = C [1 u u^2 u^3]^T.  Instead of the
reference's hand-derived velocity/acceleration formulas we differentiate the
pose map with `jax.jacfwd` — exact to machine precision and far less code.

Control poses are T_ItoG (R_ItoG, p_IinG) at uniform spacing dt_knot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import lie

F64 = jnp.float64


class BsplineSE3:
    def __init__(self, control_T: jnp.ndarray, t0: float, dt_knot: float):
        """control_T: (K, 4, 4) control poses T_ItoG at times t0 + k*dt_knot."""
        self.control_T = jnp.asarray(control_T, dtype=F64)
        self.t0 = float(t0)
        self.dt = float(dt_knot)
        self.K = self.control_T.shape[0]
        # relative twists O_j = log(T_{j-1}^-1 T_j), shape (K-1, 6)
        Tm = self.control_T
        self.omegas = lie.log_se3(lie.inv_se3(Tm[:-1]) @ Tm[1:])

        def pose_fn(t):
            return self._pose(t)

        self._pose_jit = jax.jit(pose_fn)
        self._vel_jit = jax.jit(jax.jacfwd(pose_fn))
        self._acc_jit = jax.jit(jax.jacfwd(jax.jacfwd(pose_fn)))

    @property
    def t_min(self) -> float:
        return self.t0 + self.dt  # need one knot before

    @property
    def t_max(self) -> float:
        return self.t0 + (self.K - 3) * self.dt

    def _pose(self, t):
        """T_ItoG(t) as a (4,4) matrix; t a traced scalar."""
        s = (t - self.t0) / self.dt
        # NOTE: no clip on u: jnp.clip's maximum/minimum give subgradient 1/2
        # at ties, which silently halves jacfwd velocities at knot-aligned
        # times.  Clamp s away from the ends with strict bounds instead.
        s = jnp.minimum(jnp.maximum(s, 1.0), self.K - 2 - 1e-9)
        i = jnp.floor(s).astype(jnp.int32)
        u = s - i.astype(s.dtype)
        b1 = (5.0 + 3.0 * u - 3.0 * u * u + u**3) / 6.0
        b2 = (1.0 + 3.0 * u + 3.0 * u * u - 2.0 * u**3) / 6.0
        b3 = u**3 / 6.0
        T_im1 = jax.lax.dynamic_index_in_dim(self.control_T, i - 1, keepdims=False)
        O_i = jax.lax.dynamic_index_in_dim(self.omegas, i - 1, keepdims=False)
        O_ip1 = jax.lax.dynamic_index_in_dim(self.omegas, i, keepdims=False)
        O_ip2 = jax.lax.dynamic_index_in_dim(self.omegas, i + 1, keepdims=False)
        return (
            T_im1
            @ lie.exp_se3(b1 * O_i)
            @ lie.exp_se3(b2 * O_ip1)
            @ lie.exp_se3(b3 * O_ip2)
        )

    def pose(self, t):
        """T_ItoG (4,4) at time t."""
        return self._pose_jit(jnp.asarray(t, dtype=F64))

    def imu_true(self, t):
        """True body rates and world kinematics at t.

        Returns dict with R_GtoI (3,3), p_IinG, v_IinG, a_IinG, w_IinI.
        """
        t = jnp.asarray(t, dtype=F64)
        T = self._pose_jit(t)
        dT = self._vel_jit(t)
        ddT = self._acc_jit(t)
        R_ItoG = T[:3, :3]
        # body angular velocity: [w]_x = R_ItoG^T dR_ItoG
        w_body = lie.unskew(R_ItoG.T @ dT[:3, :3])
        return {
            "R_GtoI": R_ItoG.T,
            "p_IinG": T[:3, 3],
            "v_IinG": dT[:3, 3],
            "a_IinG": ddT[:3, 3],
            "w_IinI": w_body,
        }


def figure8_controls(
    duration: float = 60.0,
    dt_knot: float = 0.5,
    rx: float = 20.0,
    ry: float = 10.0,
    rz: float = 1.0,
    yaw_follow: bool = True,
    rp_excite: float = 0.0,
    rp_hz: float = 0.5,
    speed_mod: float = 0.0,
    speed_hz: float = 0.3,
):
    """Car-like figure-8 path control poses (for tests and synthetic benches).

    rp_excite adds sinusoidal roll/pitch oscillation (amplitude in rad at
    rp_hz) on top of the path-following yaw — needed by calibration tests:
    yaw-only rotation leaves parts of the camera extrinsic unobservable.

    speed_mod (< 1) warps progress along the same path with a sinusoidal
    time-dilation (speed varies by +-speed_mod at speed_hz) — longitudinal
    acceleration + yaw-rate changes make sensor time offsets observable
    (constant-speed paths are invariant under a time shift).  The path and
    its tangent (heading) are unchanged; only the pacing varies, so the
    nonholonomic wheel model still holds.
    """
    import numpy as np

    K = int(duration / dt_knot) + 6
    ts = (np.arange(K) - 2) * dt_knot
    tau = ts  # path parameter; == time unless speed-warped
    if speed_mod > 0.0:
        ph = 2 * np.pi * speed_hz
        tau = ts + speed_mod * np.sin(ph * ts) / ph
    w = 2 * np.pi / duration
    x = rx * np.sin(w * tau)
    y = ry * np.sin(2 * w * tau)
    z = rz * np.sin(w * tau * 0.5) * 0.2
    Ts = np.zeros((K, 4, 4))
    dx = rx * w * np.cos(w * tau)
    dy = 2 * ry * w * np.cos(2 * w * tau)
    for k in range(K):
        yaw = np.arctan2(dy[k], dx[k]) if yaw_follow else 0.0
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        if rp_excite > 0:
            ph = 2 * np.pi * rp_hz * ts[k]
            r_, p_ = rp_excite * np.sin(ph), rp_excite * np.sin(1.618 * ph)
            cr, sr = np.cos(r_), np.sin(r_)
            cp, sp = np.cos(p_), np.sin(p_)
            Rr = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
            Rp = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
            R = R @ Rp @ Rr
        Ts[k, :3, :3] = R
        Ts[k, :3, 3] = [x[k], y[k], z[k]]
        Ts[k, 3, 3] = 1.0
    return jnp.asarray(Ts), float(ts[0]), dt_knot
