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
to the XLA composition — equivalence-tested interpret vs compiled.

Mosaic lowering constraints shape the implementation: no rank-1 arrays
anywhere (row vectors live as (M, 1) columns / (1, M) rows), no
dynamic_slice (one-hot reductions instead), no explicit transposes
(dot_general contraction dims instead), and per-feature scalar outputs are
written as one-hot accumulations into full (F, 1) blocks.

Works for points (k=3) and lines (k=4); M, D, k are static from shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _dot_t(a, b):
    """a (M, P) contracted with b (M, Q) over dim 0 -> (P, Q): a^T b."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=F32)


def _dot_rt(a, b):
    """a (P, M) contracted with b (Q, M) over dim 1 -> (P, Q): a b^T."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=F32)


def _kernel(Hx_ref, Hf_ref, r_ref, mask_ref, w_ref, cov_ref, gate_ref,
            cap_ref, G_ref, c_ref, ok_ref, chi_ref, *, k: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)
        c_ref[:] = jnp.zeros_like(c_ref)
        ok_ref[:] = jnp.zeros_like(ok_ref)
        chi_ref[:] = jnp.zeros_like(chi_ref)

    Hx = Hx_ref[0]          # (M, D)
    Hf = Hf_ref[0]          # (M, k)
    r = r_ref[0]            # (M, 1) column layout
    mask = mask_ref[0]      # (M, 1) f32 0/1
    w = w_ref[0]            # (M, 1) row whitening weights
    M = Hx.shape[0]

    mw = mask * w           # (M, 1)
    Hx_m = Hx * mw
    Hf_m = Hf * mw
    r_m = r * mw            # (M, 1)
    raw_max = jnp.max(jnp.abs(r_m))

    # --- k Householder reflectors against Hf (cam_helper._nullspace) ---
    idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)   # (M, 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, k)
    A_hf = Hf_m
    A_hx = Hx_m
    a_r = r_m
    for j in range(k):
        # column j of A_hf via one-hot reduction (no offset-changing slices)
        xcol = jnp.sum(A_hf * (colk == j).astype(F32), axis=1, keepdims=True)
        x = jnp.where(idx >= j, xcol, 0.0)                 # (M, 1)
        nx = jnp.sqrt(jnp.sum(x * x))
        xj = jnp.sum(x * (idx == j).astype(F32))
        # literals must be strongly f32: where(pred, 1.0, -1.0) with two
        # weak python floats yields f64 under jax_enable_x64, which Mosaic
        # cannot lower
        one = jnp.asarray(1.0, F32)
        sgn = jnp.where(xj >= 0.0, one, -one)
        alpha = -sgn * nx
        v = x - alpha * (idx == j).astype(F32)             # (M, 1)
        nv = jnp.sqrt(jnp.sum(v * v))
        v = v / jnp.where(nv < 1e-12, one, nv)
        scale = jnp.where(nv < 1e-12, jnp.asarray(0.0, F32), 2 * one)
        A_hf = A_hf - scale * v * _dot_t(v, A_hf)          # (M,1)*(1,k)
        A_hx = A_hx - scale * v * _dot_t(v, A_hx)          # (M,1)*(1,D)
        a_r = a_r - scale * v * jnp.sum(v * a_r)

    validc = (idx >= k).astype(F32)  # (M, 1) complement rows (order-free)
    Hv = A_hx * validc               # (M, D)
    rv = a_r * validc                # (M, 1)

    # --- innovation S = Hv cov Hv^T + I  (cov stays resident in VMEM) ---
    B = jnp.dot(Hv, cov_ref[:], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=F32)                   # (M, D)
    S = _dot_rt(B, Hv)                                        # (M, M)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)).astype(F32)
    S = 0.5 * (S + _dot_rt(eye, S)) + eye   # S^T via eye@S^T = (S@eye)^T trick

    # --- in-kernel Cholesky S = U^T U + forward solve accumulating chi2.
    # St stays symmetric under the rank-1 downdate, so row j and column j
    # are both recovered by one-hot reductions (no transposes, no slices).
    rowm = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)   # (1, M)

    def body(j, carry):
        St, chi, rhs = carry
        ejc = (idx == j).astype(F32)     # (M, 1)
        ejr = (rowm == j).astype(F32)    # (1, M)
        Srow = jnp.sum(St * ejc, axis=0, keepdims=True)     # (1, M) row j
        Scol = jnp.sum(St * ejr, axis=1, keepdims=True)     # (M, 1) col j
        piv = jnp.maximum(jnp.sum(Srow * ejr), 1e-12)
        d = jnp.sqrt(piv)
        u_row = jnp.where(rowm >= j, Srow / d, 0.0)         # (1, M)
        u_col = jnp.where(idx >= j, Scol / d, 0.0)          # (M, 1)
        St = St - u_col * u_row
        yj = jnp.sum(rhs * ejc) / d
        rhs = rhs - yj * jnp.where(idx > j, u_col, 0.0)
        return St, chi + yj * yj, rhs

    # int32 loop bounds: under jax_enable_x64 python-int bounds make the
    # index i64, and i32==i64 comparisons insert i32->i64 converts Mosaic
    # cannot lower (its convert rule recurses forever)
    _, chi2, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(M), body, (S, jnp.asarray(0.0, F32), rv))

    # --- gate (dof-indexed lookup as a one-hot reduction) ---
    n_rows = jnp.sum(mask).astype(jnp.int32)
    dof = jnp.maximum(n_rows - k, 1)
    dof_idx = jnp.minimum(dof, gate_ref.shape[0] - 1)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (gate_ref.shape[0], 1), 0)
    gate = jnp.sum(jnp.where(gidx == dof_idx, gate_ref[:], 0.0))
    ok = (chi2 < gate) & (n_rows >= k + 2) & (raw_max < cap_ref[0, 0])
    okf = ok.astype(F32)

    # --- gated Gram accumulation (MXU) ---
    G_ref[:] += okf * _dot_t(Hv, Hv)
    c_ref[:] += okf * _dot_t(Hv, rv)
    # per-feature outputs live as full (F, 1) blocks (TPU lowering requires
    # block dims divisible by the tile or equal to the array dims; a (1, 1)
    # grid-mapped block is neither) — write lane i via a one-hot accumulate
    onehot = (jax.lax.broadcasted_iota(jnp.int32, ok_ref.shape, 0) == i
              ).astype(F32)
    ok_ref[:] += okf * onehot
    chi_ref[:] += chi2 * onehot


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
    r2 = r.astype(dt).reshape(F, M, 1)
    mask2 = rowmask.astype(dt).reshape(F, M, 1)
    w2 = w_row.astype(dt).reshape(F, M, 1)
    gate2 = jnp.pad(gate_vec.astype(dt), (0, 1))[:, None]  # (M+2, 1)
    cap2 = jnp.asarray(resid_cap, dt).reshape(1, 1)

    # index-map constants must be strongly int32: under jax_enable_x64 a
    # literal 0 traces as i64 and Mosaic cannot legalize an i64 func.return
    # (a numpy scalar, not jnp: index maps must not capture tracers)
    z = np.int32(0)
    grid = (F,)
    out = pl.pallas_call(
        partial(_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M, D), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, k), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 1), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 1), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 1), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (z, z),
                         memory_space=pltpu.VMEM),   # cov: resident
            pl.BlockSpec((gate_vec.shape[0] + 1, 1), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (z, z),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, D), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D), dt),
            jax.ShapeDtypeStruct((D, 1), dt),
            jax.ShapeDtypeStruct((F, 1), dt),
            jax.ShapeDtypeStruct((F, 1), dt),
        ],
        interpret=interpret,
    )(Hx, Hf, r2, mask2, w2, cov.astype(dt), gate2, cap2)
    G, c, ok, chi = out
    return G, c[:, 0], ok[:, 0] > 0.5, chi[:, 0]
