"""On-manifold pose interpolation between clones (L2).

The reference supports high-order polynomial interpolation with analytic
Jacobians (`State::get_interpolated_jacobian`, State.cpp:833-973) plus a
linear fallback (`get_interpolated_pose_linear`).  This module provides the
linear (geodesic) interpolation used by measurement updates at arbitrary
times (GPS, time-offset calib); the polynomial order-n version builds on the
same structure (interp weights over bounding clones).

Jacobians of the interpolated pose wrt the bounding clones' error states are
obtained with `jax.jacfwd` at the FEJ linearization point — exact and fused,
replacing the reference's hand-derived chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import lie


def interpolate_pose_linear(q0, p0, q1, p1, lam):
    """Geodesic interpolation between two JPL poses at fraction lam in [0,1].

    R(lam) = exp(lam * log(R1 R0^T)) R0  (frame rotations);
    p(lam) = (1 - lam) p0 + lam p1.
    """
    R0 = lie.quat_2_rot(q0)
    R1 = lie.quat_2_rot(q1)
    w = lie.log_so3(R1 @ jnp.swapaxes(R0, -1, -2)) if R0.ndim > 2 else lie.log_so3(R1 @ R0.T)
    R_t = lie.exp_so3(lam * w) @ R0
    p_t = (1.0 - lam) * p0 + lam * p1
    return R_t, p_t


def polynomial_pose(q0, p0, qs, ps, dts, dt_eval):
    """Order-n on-manifold polynomial interpolation (MINS-style).

    Fit theta(dt) = sum_i c_i dt^i through the SO(3) log-differences of n
    later clones relative to the anchor (q0, p0), likewise for position
    (reference: State::add_polynomial, State.cpp:725-798):

        V_t C = [log(R_i R_0^T); ...],   R(dt) = exp(theta(dt)) R_0,
        p(dt) = p_0 + sum_i d_i dt^i.

    Args:
      q0, p0: anchor pose.  qs (n,4), ps (n,3): later clones.
      dts (n,): their time offsets from the anchor (static shape = order).
      dt_eval: evaluation offset in [0, dts[-1]].
    Returns (R_t (3,3), p_t (3,)).
    """
    from ..ops import lie

    n = dts.shape[0]
    R0 = lie.quat_2_rot(q0)
    Ri = lie.quat_2_rot(qs)
    th = lie.log_so3(Ri @ R0.T)  # (n,3)
    dp = ps - p0  # (n,3)

    # Vandermonde in dt powers; (n,n) with entries dts[i]^(j+1)
    # (QR-based inverse: TPU has no f64 LU kernels, see ops/linalg.py)
    from ..ops.linalg import inv_small

    powers = dts[:, None] ** (jnp.arange(1, n + 1)[None, :])
    V_inv = inv_small(powers)
    c_ori = V_inv @ th  # (n,3) coefficient rows
    c_pos = V_inv @ dp

    ev = dt_eval ** jnp.arange(1, n + 1)
    th_t = ev @ c_ori
    p_t = p0 + ev @ c_pos
    R_t = lie.exp_so3(th_t) @ R0
    return R_t, p_t


def bounding_clones(clone_t, clone_valid, t):
    """Slots of the clones bounding time t (host-free, masked argmin logic).

    Returns (slot0, slot1, lam, ok): slot0 <= t <= slot1.  When t exactly
    matches a clone, slot0 == slot1 and lam == 0.
    """
    t_arr = jnp.where(clone_valid, clone_t, jnp.inf)
    # nearest older-or-equal
    older = jnp.where(t_arr <= t, t_arr, -jnp.inf)
    slot0 = jnp.argmax(older)
    t0 = older[slot0]
    newer = jnp.where(t_arr >= t, t_arr, jnp.inf)
    slot1 = jnp.argmin(newer)
    t1 = newer[slot1]
    ok = jnp.isfinite(t0) & jnp.isfinite(t1)
    denom = jnp.where(t1 > t0, t1 - t0, 1.0)
    lam = jnp.where(t1 > t0, (t - t0) / denom, 0.0)
    return slot0, slot1, lam, ok
