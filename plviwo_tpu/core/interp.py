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
