"""Fused per-frame filter step (L2/L3): one jit dispatch per camera frame.

Composes the device math of `propagator`, `ekf` and `update.cam_helper` into a
single jitted function: IMU-window propagation -> window marginalization ->
clone augmentation -> batched triangulation -> MSCKF systems -> nullspace
projection + chi2 gate -> QR compression -> EKF update.  This is the hot path
the benchmarks time and the unit the distributed replay layer maps over
sequences (vmap/shard_map) — host code only assembles the padded inputs.

All control flow is masked (no data-dependent branching): rejected features
become zero rows, marginalization is a keep-mask product, the clone ring is
fixed-size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.chi2 import _TABLE as _CHI2_NP
from ..update import cam_helper
from . import ekf, propagator
from .layout import StateLayout
from .state import FilterState

F64 = jnp.float64


def marginalize_mask(state: FilterState, drop) -> FilterState:
    """Vectorized marginalization: zero rows/cols of every dropped clone slot.

    drop: (C,) bool.  Replaces per-slot `marginalize_clone` calls with one
    masked outer product (TPU idiom: no loop, no dynamic shapes).
    """
    lo = state.layout
    D = lo.dim
    keep_clone = jnp.repeat(~drop, 6)  # (6C,)
    keep = jnp.ones(D, dtype=state.cov.dtype)
    keep = keep.at[lo.clone_off : lo.clone_off + 6 * lo.n_clones].set(
        keep_clone.astype(state.cov.dtype)
    )
    cov = state.cov * keep[:, None] * keep[None, :]
    return state.replace(
        clone_valid=state.clone_valid & ~drop,
        clone_keyframe=state.clone_keyframe & ~drop,
        clone_t=jnp.where(drop, jnp.inf, state.clone_t),
        cov=cov,
    )


def _auto_marginalize(state: FilterState, t_now, window_size) -> FilterState:
    """Drop clones outside the time window; ensure at least one free slot."""
    valid = state.clone_valid
    drop = valid & (state.clone_t < t_now - window_size) & ~state.clone_keyframe
    remaining = jnp.sum(valid & ~drop)
    t_for_old = jnp.where(valid & ~drop & ~state.clone_keyframe, state.clone_t, jnp.inf)
    oldest = jnp.argmin(t_for_old)
    need_slot = remaining >= state.layout.n_clones
    drop = drop | (need_slot & (jnp.arange(drop.shape[0]) == oldest))
    return marginalize_mask(state, drop)


@partial(
    jax.jit,
    static_argnames=("model", "window_size", "cam_dtype"),
)
def fused_step(
    state: FilterState,
    imu_t, imu_w, imu_a, t_new,
    obs_uv, obs_uvn, obs_slot, obs_valid,
    gravity, sigmas, sigma_pix, chi2_mult,
    model: int = 0, window_size: float = 1.0, cam_dtype=jnp.float64,
):
    """One full frame: propagate + clone + MSCKF update.  Returns (state, metrics).

    obs_*: (F, O, ...) padded per-feature observation batches whose `obs_slot`
    indices refer to clone slots *after* this frame's clone insertion (the
    host front-end knows the timetable; `free_clone_slot` is deterministic).

    cam_dtype: dtype of the heavy per-feature camera tensors (Jacobian
    stacks, gate, compression).  f32 keeps residual precision at ~1e-3 px —
    far below the pixel noise — while the f64-emulation cost on TPU applies
    only to the tiny covariance-level algebra.  The compressed system is
    promoted back to f64 before the EKF update.
    """
    lo: StateLayout = state.layout

    # --- propagate to frame time ---
    state = propagator.propagate(state, imu_t, imu_w, imu_a, t_new, gravity, sigmas)

    # --- marginalize + clone ---
    state = _auto_marginalize(state, t_new, window_size)
    state = ekf.augment_clone(state)

    # --- camera update (heavy tensors in cam_dtype) ---
    cd = cam_dtype
    cq = state.clone_q[obs_slot].astype(cd)
    cp = state.clone_p[obs_slot].astype(cd)
    p_f, ok, avg_err = cam_helper.triangulate_batch(
        obs_uvn.astype(cd), cq, cp, obs_valid,
        state.cam_q[0].astype(cd), state.cam_p[0].astype(cd)
    )
    fx = state.cam_k[0, 0]
    ok = ok & (avg_err < 3.0 / fx.astype(cd))

    Hx, Hf, r, rowmask = cam_helper.point_systems_batch(
        p_f, obs_uv.astype(cd), obs_slot, obs_valid,
        state.clone_q.astype(cd), state.clone_p.astype(cd),
        state.clone_q_fej.astype(cd), state.clone_p_fej.astype(cd),
        state.cam_q[0].astype(cd), state.cam_p[0].astype(cd),
        state.cam_k[0].astype(cd),
        model, lo.n_clones, lo.clone_off, lo.dim,
    )
    rowmask = rowmask & ok[:, None]
    sigma2 = sigma_pix**2
    chi2_table = jnp.asarray(_CHI2_NP).astype(cd)
    Hn, rn, rowvalid, feat_ok = cam_helper.msckf_project_and_gate(
        Hx, Hf, r, rowmask, state.cov.astype(cd), jnp.asarray(sigma2, dtype=cd),
        chi2_table, chi2_mult
    )
    M = Hn.shape[0] * Hn.shape[1]
    H_all = Hn.reshape(M, lo.dim)
    r_all = rn.reshape(M)
    mask_all = rowvalid.reshape(M)
    Hc, rc, cmask = ekf.measurement_compress(H_all, r_all, mask_all)
    state = ekf.update(state, Hc.astype(F64), rc.astype(F64),
                       jnp.full(rc.shape, sigma2, dtype=F64), cmask)

    metrics = {
        "accepted": jnp.sum(feat_ok),
        "rows": jnp.sum(mask_all),
        "avg_reproj": jnp.mean(jnp.where(ok, avg_err, 0.0)),
    }
    return state, metrics
