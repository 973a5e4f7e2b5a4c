"""Pallas TPU kernel: fused per-feature MSCKF projection + gate + Gram.

The XLA path (`cam_helper.msckf_project_and_gate` + `ekf.measurement_compress`)
materializes the nullspace-projected stacks Hn (F, M, D) to HBM and re-reads
the (D, D) covariance from HBM for every feature's innovation matrix — the
dominant memory traffic of the camera slice (roofline: the fused step is
bandwidth-bound, AI ~6 vs the v5e balance ~240).  This kernel runs the whole
per-feature chain in VMEM with the covariance resident across the feature
grid, accumulating the gated Gram system directly:

    per feature i (grid step):
      whiten+mask rows -> k Householder reflectors (nullspace of Hf)
      S = Hv cov Hv^T + I   (unit noise after whitening => S >= I, so the
                             in-kernel Cholesky needs no pivoting/jitter)
      chi2 = || L^-1 rv ||^2  (forward solve, accumulated, no y storage)
      gate: chi2 < gate_vec[dof]  &  dof >= 2  &  max|r| < resid_cap
      G += ok * Hv^T Hv ;  c += ok * Hv^T rv   (VMEM accumulators)

Outputs (G, c, ok, chi2): the EKF update consumes chol(G) exactly like
`measurement_compress`'s Gram path.  Bit-comparable (f32 order differences)
to the XLA composition — tested in interpret mode on CPU.

Works for points (k=3) and lines (k=4); M, D, k are static from shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _kernel(Hx_ref, Hf_ref, r_ref, mask_ref, w_ref, cov_ref, gate_ref,
            cap_ref, G_ref, c_ref, ok_ref, chi_ref, *, k: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    Hx = Hx_ref[0]          # (M, D)
    Hf = Hf_ref[0]          # (M, k)
    r = r_ref[0]            # (1, M) row layout
    mask = mask_ref[0]      # (1, M) f32 0/1
    w = w_ref[0]            # (1, M) row whitening weights
    M = Hx.shape[0]
    D = Hx.shape[1]

    mw = (mask * w)[0]      # (M,)
    Hx_m = Hx * mw[:, None]
    Hf_m = Hf * mw[:, None]
    r_m = (r * mask * w)[0]  # (M,)
    raw_max = jnp.max(jnp.abs(r_m))

    # --- k Householder reflectors against Hf (cam_helper._nullspace) ---
    idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]
    A_hf = Hf_m
    A_hx = Hx_m
    a_r = r_m
    for j in range(k):
        x = jnp.where(idx >= j, A_hf[:, j], 0.0)
        nx = jnp.sqrt(jnp.sum(x * x))
        sgn = jnp.where(x[j] >= 0.0, 1.0, -1.0)
        alpha = -sgn * nx
        v = x - alpha * (idx == j).astype(x.dtype)
        nv = jnp.sqrt(jnp.sum(v * v))
        v = v / jnp.where(nv < 1e-12, 1.0, nv)
        scale = jnp.where(nv < 1e-12, 0.0, 2.0)
        A_hf = A_hf - scale * v[:, None] * (v @ A_hf)[None, :]
        A_hx = A_hx - scale * v[:, None] * jnp.dot(
            v, A_hx, preferred_element_type=F32)[None, :]
        a_r = a_r - scale * v * jnp.sum(v * a_r)

    valid = (idx >= k).astype(F32)   # complement rows (no roll: order-free)
    Hv = A_hx * valid[:, None]       # (M, D)
    rv = a_r * valid                 # (M,)

    # --- innovation S = Hv cov Hv^T + I  (cov stays resident in VMEM) ---
    PHt = jnp.dot(cov_ref[:], Hv.T, preferred_element_type=F32)   # (D, M)
    S = jnp.dot(Hv, PHt, preferred_element_type=F32)              # (M, M)
    S = 0.5 * (S + S.T) + jnp.eye(M, dtype=F32)

    # --- in-kernel Cholesky S = U^T U (right-looking on rows; S symmetric
    #     so column j == row j) + forward solve accumulating chi2 ---
    col = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]

    # forward solve U^T y = rv:  y[j] = (rv_j - sum_{t<j} U[t,j] y[t]) / U[j,j]
    # fold into the factor loop: after emitting U row j, subtract y_j * U[j,:]
    # from the pending right-hand side (columns > j).
    def body(j, carry):
        St, chi, rhs = carry
        piv = jnp.maximum(St[j, j], 1e-12)
        d = jnp.sqrt(piv)
        u = jnp.where(col >= j, St[j, :] / d, 0.0)
        St = St - u[:, None] * u[None, :]
        yj = rhs[j] / d
        rhs = rhs - yj * jnp.where(col > j, u, 0.0)
        return St, chi + yj * yj, rhs

    _, chi2, _ = jax.lax.fori_loop(
        0, M, body, (S, jnp.asarray(0.0, F32), rv))

    # --- gate ---
    n_rows = jnp.sum(mask[0]).astype(jnp.int32)
    dof = jnp.maximum(n_rows - k, 1)
    gate = gate_ref[jnp.minimum(dof, gate_ref.shape[0] - 1), 0]
    ok = (chi2 < gate) & (n_rows >= k + 2) & (raw_max < cap_ref[0, 0])
    okf = ok.astype(F32)

    # --- gated Gram accumulation (MXU) ---
    G_ref[:] += okf * jnp.dot(Hv.T, Hv, preferred_element_type=F32)
    c_ref[:] += okf * jnp.dot(Hv.T, rv[:, None],
                              preferred_element_type=F32)
    ok_ref[0, 0] = ok
    chi_ref[0, 0] = chi2


@partial(jax.jit, static_argnames=("interpret",))
def gram_gate_fused(Hx, Hf, r, rowmask, w_row, cov, gate_vec, resid_cap,
                    interpret: bool = False):
    """Fused gated-Gram build over the feature batch.

    Args:
      Hx: (F, M, D) f32 state Jacobian stacks.
      Hf: (F, M, k) f32 nuisance (feature) Jacobians, k in {3, 4}.
      r:  (F, M) residuals;  rowmask: (F, M) bool;
      w_row: (F, M) row whitening weights (1/sigma per row; the projected
        system then has unit noise — pass 1/sigma broadcast for scalar noise).
      cov: (D, D) f32 covariance.
      gate_vec: (M+1,) chi2 thresholds indexed by dof (table * chi2_mult).
      resid_cap: scalar raw-residual pre-gate (whitened units).
    Returns:
      G (D, D), c (D,), ok (F,) bool, chi2 (F,) — with
      G = sum_ok Hn^T Hn and c = sum_ok Hn^T rn, the Gram system
      `measurement_compress` would build from the accepted projected rows.
    """
    F, M, D = Hx.shape
    k = Hf.shape[-1]
    dt = F32
    Hx = Hx.astype(dt)
    Hf = Hf.astype(dt)
    r2 = r.astype(dt).reshape(F, 1, M)
    mask2 = rowmask.astype(dt).reshape(F, 1, M)
    w2 = w_row.astype(dt).reshape(F, 1, M)
    gate2 = jnp.pad(gate_vec.astype(dt), (0, 1))[:, None]  # (M+2, 1)
    cap2 = jnp.asarray(resid_cap, dt).reshape(1, 1)

    grid = (F,)
    out = pl.pallas_call(
        partial(_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # cov: resident
            pl.BlockSpec((gate_vec.shape[0] + 1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D), dt),
            jax.ShapeDtypeStruct((D, 1), dt),
            jax.ShapeDtypeStruct((F, 1), jnp.bool_),
            jax.ShapeDtypeStruct((F, 1), dt),
        ],
        interpret=interpret,
    )(Hx, Hf, r2, mask2, w2, cov.astype(dt), gate2, cap2)
    G, c, ok, chi = out
    return G, c[:, 0], ok[:, 0], chi[:, 0]
