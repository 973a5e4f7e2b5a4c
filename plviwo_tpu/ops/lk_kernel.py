"""Pallas TPU kernel for pyramidal inverse-compositional LK.

Round-5 perf work: the XLA shifted-MAC formulation (`ops/klt.py
pyramidal_lk_conv`) is the images-in bottleneck at reference feature
density — 1649.7 of 1856.6 ms per B=64 batch at n_pts=1500 (89% of the
frame; PROFILE artifacts) because every tap pass of every iteration
streams the (PS, PS, N) patch tensors through HBM.  This kernel keeps
each 128-feature patch block VMEM-RESIDENT for the whole iteration loop:
one HBM read per patch, then `iters` x KS tap passes of pure VPU
multiply-accumulates on-chip.

Same math as `_lk_level_conv` (ops/klt.py): extended (W+2)^2 template via
separable triangle-weighted taps, central-difference gradients, fixed
`iters` Gauss-Newton steps with the 2x2 normal matrix, drift budget D
bounding the in-patch window offset.  Feature axis = TPU lane axis
(blocks of 128).  Extraction of patches (vmapped dynamic_slice block
reads) stays in XLA where it is already cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _lk_kernel(pp_ref, pn_ref, uty_ref, utx_ref, u0y_ref, u0x_ref,
               uy_ref, ux_ref, err_ref, det_ref,
               *, W: int, D: int, iters: int, FB: int,
               shift_free: bool = False):
    """One (PS, PS, FB) feature block: template setup + GN iterations.

    pp/pn: (PS, PS, FB) template/target patches (FB = lane-block of
    features, a multiple of 128 — wide blocks amortize per-grid-step
    overhead).
    uty/utx: (1, FB) template extended-window start offsets.
    u0y/u0x: (1, FB) initial target window start offsets.
    Outputs: final window offsets (1, FB), mean abs error, template det.
    """
    KS = 2 * D + 3
    W2 = W + 2
    PS = W2 + KS - 1

    pp = pp_ref[:]          # (PS, PS, FB) — VMEM-resident
    pn = pn_ref[:]
    uty = uty_ref[0, :]     # (FB,)
    utx = utx_ref[0, :]

    def tri(u, k):
        # triangle (bilinear) tap weight, (128,) -> broadcast over sublanes
        return jnp.maximum(0.0, 1.0 - jnp.abs(u - k))

    # ---- extended template (W+2, W+2, 128) ----
    a_t = jnp.zeros((W2, PS, FB), F32)
    for k in range(KS):
        a_t = a_t + pp[k : k + W2] * tri(uty, k)[None, None, :]
    t_ext = jnp.zeros((W2, W2, FB), F32)
    for k in range(KS):
        t_ext = t_ext + a_t[:, k : k + W2, :] * tri(utx, k)[None, None, :]
    T = t_ext[1:-1, 1:-1]
    Gx = 0.5 * (t_ext[1:-1, 2:] - t_ext[1:-1, :-2])
    Gy = 0.5 * (t_ext[2:, 1:-1] - t_ext[:-2, 1:-1])
    a = jnp.sum(Gx * Gx, axis=(0, 1))
    b = jnp.sum(Gx * Gy, axis=(0, 1))
    c = jnp.sum(Gy * Gy, axis=(0, 1))
    det = a * c - b * b
    det_ref[0, :] = det
    bad = det < 1e-8
    det_s = jnp.where(bad, 1.0, det)

    def sample(uy, ux):
        acc = jnp.zeros((W, PS, FB), F32)
        for k in range(KS):
            acc = acc + pn[k : k + W] * tri(uy, k)[None, None, :]
        out = jnp.zeros((W, W, FB), F32)
        for k in range(KS):
            out = out + acc[:, k : k + W, :] * tri(ux, k)[None, None, :]
        return out

    # shift-free per-iteration sampling: the x-taps above slice the SUBLANE
    # dimension (`acc[:, k:k+W]`) — a real data-movement op on TPU, paid
    # KS times per iteration.  Pre-shifting pn along x ONCE moves every
    # per-iteration slice to the leading dimension (free addressing) at the
    # cost of KS^2 instead of 2*KS tap MACs.
    pnx = [pn[:, k : k + W, :] for k in range(KS)]  # KS x (PS, W, FB)

    def sample_sf(uy, ux):
        out = jnp.zeros((W, W, FB), F32)
        for k in range(KS):
            wxk = tri(ux, k)[None, None, :]
            for j in range(KS):
                out = out + pnx[k][j : j + W] * (
                    tri(uy, j)[None, None, :] * wxk)
        return out

    # statically unrolled GN iterations (x64 mode's i64 fori_loop indices
    # fail Mosaic legalization; iters is small and static anyway)
    uy, ux = u0y_ref[0, :], u0x_ref[0, :]
    smp = sample_sf if shift_free else sample
    for _ in range(iters):
        I = smp(uy, ux)
        e = I - T
        bx = jnp.sum(Gx * e, axis=(0, 1))
        by = jnp.sum(Gy * e, axis=(0, 1))
        dx = jnp.where(bad, 0.0, (c * bx - b * by) / det_s)
        dy = jnp.where(bad, 0.0, (-b * bx + a * by) / det_s)
        uy, ux = uy - dy, ux - dx
    I = sample(uy, ux)
    err_ref[0, :] = jnp.mean(jnp.abs(I - T), axis=(0, 1))
    uy_ref[0, :] = uy
    ux_ref[0, :] = ux


@functools.partial(jax.jit, static_argnames=("W", "D", "iters", "interpret",
                                              "lane_block", "shift_free"))
def lk_level_kernel(Pp, Pn, uty, utx, u0y, u0x, W: int, D: int, iters: int,
                    interpret: bool = False, lane_block: int = 512,
                    shift_free: bool = False):
    """Run the block kernel over all features.  Pp/Pn: (PS, PS, N) with N a
    multiple of `lane_block`; offset vectors (N,).  Returns
    (uy, ux, err, det).  Wide lane blocks amortize per-grid-step overhead
    (grid steps execute sequentially on the TensorCore)."""
    import numpy as np

    PS, _, N = Pp.shape
    FB = min(lane_block, N)
    assert N % FB == 0, (N, FB)
    grid = (N // FB,)
    # index-map constants as i32: under jax_enable_x64 a Python literal 0
    # lowers to i64, which Mosaic fails to legalize in the grid machinery
    z = np.int32(0)
    vec = lambda: pl.BlockSpec((1, FB), lambda i: (z, i),
                               memory_space=pltpu.VMEM)
    patch = lambda: pl.BlockSpec((PS, PS, FB), lambda i: (z, z, i),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lk_kernel, W=W, D=D, iters=iters, FB=FB,
                          shift_free=shift_free),
        grid=grid,
        in_specs=[patch(), patch(), vec(), vec(), vec(), vec()],
        out_specs=[vec(), vec(), vec(), vec()],
        out_shape=[jax.ShapeDtypeStruct((1, N), F32)] * 4,
        interpret=interpret,
    )(Pp, Pn, uty.reshape(1, N).astype(F32), utx.reshape(1, N).astype(F32),
      u0y.reshape(1, N).astype(F32), u0x.reshape(1, N).astype(F32))
    uy, ux, err, det = (o[0] for o in out)
    return uy, ux, err, det


def _pad_n(x, N_pad, axis=-1, fill=0.0):
    n = x.shape[axis]
    if n == N_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, N_pad - n)
    return jnp.pad(x, pad, constant_values=fill)


def _lk_level_pallas(img_prev, img_next, uv_prev, uv_guess, half: int,
                     iters: int, drift: int, interpret: bool = False,
                     shift_free: bool = False):
    """Drop-in replacement for `_lk_level_conv` (same contract: returns
    (uv, err, good, inb)) with the iteration loop in the Pallas kernel."""
    from .klt import _extract_patches

    W = 2 * half + 1
    D = drift
    KS = 2 * D + 3
    PS = W + 2 + KS - 1
    H, Wd = img_next.shape
    f32 = jnp.float32
    N = uv_prev.shape[0]
    N_pad = ((N + 127) // 128) * 128
    if N_pad > 512:  # wide lane blocks: pad to the 512-feature block size
        N_pad = ((N_pad + 511) // 512) * 512

    gp = jnp.floor(uv_prev)
    oxp = jnp.clip(gp[:, 0].astype(jnp.int32) - (half + 1) - (D + 1), 0,
                   Wd - PS)
    oyp = jnp.clip(gp[:, 1].astype(jnp.int32) - (half + 1) - (D + 1), 0,
                   H - PS)
    Pp = _extract_patches(img_prev.astype(f32), oyp, oxp, PS)
    uty = uv_prev[:, 1].astype(f32) - oyp.astype(f32) - (half + 1)
    utx = uv_prev[:, 0].astype(f32) - oxp.astype(f32) - (half + 1)

    gg = jnp.floor(uv_guess)
    oxg = jnp.clip(gg[:, 0].astype(jnp.int32) - half - (D + 1), 0, Wd - PS)
    oyg = jnp.clip(gg[:, 1].astype(jnp.int32) - half - (D + 1), 0, H - PS)
    Pn = _extract_patches(img_next.astype(f32), oyg, oxg, PS)
    u0y = uv_guess[:, 1].astype(f32) - oyg.astype(f32) - half
    u0x = uv_guess[:, 0].astype(f32) - oxg.astype(f32) - half

    uy, ux, err, det = lk_level_kernel(
        _pad_n(Pp, N_pad), _pad_n(Pn, N_pad), _pad_n(uty, N_pad),
        _pad_n(utx, N_pad), _pad_n(u0y, N_pad), _pad_n(u0x, N_pad),
        W, D, iters, interpret=interpret, shift_free=shift_free)
    uy, ux, err, det = uy[:N], ux[:N], err[:N], det[:N]

    uv = jnp.stack([ux + oxg.astype(f32) + half,
                    uy + oyg.astype(f32) + half], -1)
    good = det > 1e-6
    in_patch = ((ux >= 0.0) & (ux <= PS - W - 1)
                & (uy >= 0.0) & (uy <= PS - W - 1))
    inb = (
        (uv[:, 0] > half) & (uv[:, 0] < Wd - half - 1)
        & (uv[:, 1] > half) & (uv[:, 1] < H - half - 1)
    ) & in_patch
    return uv, err, good, inb


@functools.partial(jax.jit, static_argnames=("levels", "half", "iters",
                                             "drift", "drift_fine",
                                             "interpret", "shift_free"))
def pyramidal_lk_pallas(prev_pyr, next_pyr, uv_prev, valid, levels: int,
                        half: int = 7, iters: int = 10,
                        max_err: float = 0.08, drift: int = 5,
                        drift_fine: int = 2, interpret: bool = False,
                        shift_free: bool = False):
    """Gather-free pyramidal LK with the per-level iteration loop as a
    Pallas kernel (same contract and per-level drift budgets as
    `pyramidal_lk_conv`)."""
    scale = 2.0 ** (levels - 1)
    uv = uv_prev / scale
    ok = valid
    for l in range(levels - 1, -1, -1):
        uv_l_prev = uv_prev / (2.0**l)
        D = drift if l == levels - 1 else drift_fine
        uv, err, good, inb = _lk_level_pallas(
            prev_pyr[l], next_pyr[l], uv_l_prev, uv, half, iters, D,
            interpret=interpret, shift_free=shift_free)
        ok = ok & inb & (good if l == 0 else True)
        if l > 0:
            uv = uv * 2.0
    ok = ok & (err < max_err)
    return uv, ok
