"""Joint vs sequential multi-sensor update: the fused step applies all
whitened compressed rows in one EKF update (one covariance rewrite); the
difference vs the sequential per-sensor order is second order in the
per-frame correction and must stay far below measurement noise."""

import jax
import jax.numpy as jnp
import numpy as np


def test_joint_matches_sequential_to_second_order():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import (
        SIGMA_LINE, WHEEL_NOISE, _example_inputs_full)
    from plviwo_tpu.core import ekf, propagator
    from plviwo_tpu.core.state import newest_clone_slot
    from plviwo_tpu.core.step import (
        _auto_marginalize, _camera_msckf_update, _line_msckf_update,
        _wheel_update_fused, fused_step_full)

    args = _example_inputs_full()
    (state, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
     luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid,
     gravity, sigmas, sp, cm) = args

    joint, metrics = fused_step_full(
        state, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
        luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid,
        gravity, sigmas, sp, cm, SIGMA_LINE, WHEEL_NOISE)
    assert int(metrics["accepted"]) > 0
    assert int(metrics["lines_accepted"]) > 0
    assert int(metrics["wheel_accepted"]) > 0

    # sequential reference
    st = propagator.propagate(state, imu_t, imu_w, imu_a, t_new, gravity,
                              sigmas)
    st = _auto_marginalize(st, t_new, 1.0)
    slot0 = newest_clone_slot(st)
    st = ekf.augment_clone(st)
    slot1 = newest_clone_slot(st)
    st, _ = _camera_msckf_update(st, ouv, ouvn, oslot, ovalid, sp, cm, 0,
                                 jnp.float64)
    st, _ = _line_msckf_update(st, luv, luvn, lslot, lvalid, SIGMA_LINE, cm)
    st, _ = _wheel_update_fused(st, slot0, slot1, wt, wm1, wm2, wvalid,
                                WHEEL_NOISE, cm, 3)

    dp = float(jnp.max(jnp.abs(joint.p - st.p)))
    dcl = float(jnp.max(jnp.abs(joint.clone_p - st.clone_p)))
    dcov = float(jnp.max(jnp.abs(joint.cov - st.cov)))
    # second-order in the (sub-millimeter) per-frame correction
    assert dp < 1e-4, dp
    assert dcl < 1e-4, dcl
    assert dcov < 1e-5, dcov
