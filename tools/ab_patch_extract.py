"""On-chip A/B of patch-extraction formulations for conv-LK.

At n_pts=1500 the fused frame is 89% conv-LK, and the honest chained-timer
bisect (tools/prof_lk_stages.py) shows the cost is per-feature PATCH
EXTRACTION: each `_extract_patches` call (vmapped dynamic_slice -> XLA
gather) costs ~195 ms at B=64, N=1500, PS=23, and the frame does ~6 of
them (2 images x 3 levels).  GN iterations and shifted-MAC sampling are
nearly free.

TIMING NOTE: on the tunneled 'axon' platform, block_until_ready on a single
small dispatch returns early (a bf16 8k matmul "measured" 7000 TFLOP/s),
so every number here comes from a chained Python loop of data-dependent
dispatches (the bench.py methodology): the next call's indices derive from
the previous call's output.

Variants (all produce the feature-trailing (PS, PS, N) layout):
  a. vmapped dynamic_slice (PS, PS)            — current default
  b. row-take (N*PS row gather) + one-hot column matmul
  c. full one-hot row matmul over H + one-hot column matmul (MXU)
  d. full-width strip dynamic_slice (PS, W) + one-hot column matmul
  g. row-BAND one-hot matmul: quantize oy to 8-row bands (H/8 of them), so
     the row contraction is N x (H/8) x (PS+8) x W — 8x fewer FLOPs and a
     tiny one-hot — then one-hot column matmul; final 8-row alignment is
     folded into the column stage's (PS+8 -> PS) row window via a second
     small per-feature matmul.

Reference cost being replaced: `TrackKLT.cpp:829-886` per-feature CPU LK.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
BF16 = jnp.bfloat16


def _onehot_cols(ox, W: int, PS: int, dtype):
    w = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    j = jnp.arange(PS, dtype=jnp.int32)[None, None, :]
    return (w == ox[:, None, None] + j).astype(dtype)


def extract_a(img, oy, ox, PS: int):
    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (PS, PS))

    return jnp.transpose(jax.vmap(one)(oy, ox), (1, 2, 0))


def extract_b(img, oy, ox, PS: int, dtype=BF16):
    H, W = img.shape
    N = oy.shape[0]
    ridx = (oy[:, None] + jnp.arange(PS, dtype=jnp.int32)[None, :]).reshape(-1)
    rows = jnp.take(img, ridx, axis=0).reshape(N, PS, W)
    C = _onehot_cols(ox, W, PS, dtype)
    return jnp.einsum("npw,nwj->pjn", rows.astype(dtype), C,
                      preferred_element_type=F32)


def extract_c(img, oy, ox, PS: int, dtype=BF16):
    H, W = img.shape
    pad = jnp.pad(img, ((0, PS), (0, 0)))
    sh = jnp.stack([pad[k : k + H] for k in range(PS)], 0)  # (PS, H, W)
    R = (jnp.arange(H, dtype=jnp.int32)[None, :] == oy[:, None]).astype(dtype)
    strip = jnp.einsum("nh,khw->nkw", R, sh.astype(dtype),
                       preferred_element_type=F32)
    C = _onehot_cols(ox, W, PS, dtype)
    return jnp.einsum("nkw,nwj->kjn", strip.astype(dtype), C,
                      preferred_element_type=F32)


def extract_d(img, oy, ox, PS: int, dtype=BF16):
    H, W = img.shape

    def one(y):
        return jax.lax.dynamic_slice(img, (y, 0), (PS, W))

    strip = jax.vmap(one)(oy)
    C = _onehot_cols(ox, W, PS, dtype)
    return jnp.einsum("nkw,nwj->kjn", strip.astype(dtype), C,
                      preferred_element_type=F32)


def extract_g(img, oy, ox, PS: int, dtype=BF16):
    """Row-band one-hot matmul + fused column/row-offset stage."""
    H, W = img.shape
    N = oy.shape[0]
    SB = H // 8  # 8-row bands
    KB = PS + 8  # band strip height covers any oy%8 offset
    pad = jnp.pad(img, ((0, KB), (0, 0)))
    # bands[s] = img[8s : 8s+KB]  -> (SB, KB, W) without gathers
    bands = jnp.stack([pad[8 * s : 8 * s + KB] for s in range(SB)], 0)
    band = oy // 8
    rem = oy - 8 * band  # 0..7
    Rb = (jnp.arange(SB, dtype=jnp.int32)[None, :] == band[:, None]).astype(dtype)
    strip = jnp.einsum("ns,skw->nkw", Rb, bands.astype(dtype),
                       preferred_element_type=F32)  # (N, KB, W)
    # columns: one-hot over W
    C = _onehot_cols(ox, W, PS, dtype)
    cols = jnp.einsum("nkw,nwj->nkj", strip.astype(dtype), C,
                      preferred_element_type=F32)  # (N, KB, PS)
    # rows within band: one-hot over the 8 possible offsets -> (PS, PS, N)
    k = jnp.arange(KB, dtype=jnp.int32)[None, :, None]
    p = jnp.arange(PS, dtype=jnp.int32)[None, None, :]
    Rr = (k == rem[:, None, None] + p).astype(dtype)  # (N, KB, PS)
    return jnp.einsum("nkj,nkp->pjn", cols.astype(dtype), Rr,
                      preferred_element_type=F32)


VARIANTS = {
    "a_dynslice": extract_a,
    "b_rowtake_colmm": extract_b,
    "c_onehot_mm": extract_c,
    "d_strip_colmm": extract_d,
    "g_band_mm": extract_g,
}


def chained_ms(f, img, uv0, reps: int):
    """f: (img(B,H,W), oy(B,N), ox(B,N)) -> (B,PS,PS,N).  Chain: indices for
    call k+1 derive from call k's output."""

    @jax.jit
    def step(img, uv):
        oy = uv[..., 1].astype(jnp.int32)
        ox = uv[..., 0].astype(jnp.int32)
        out = f(img, oy, ox)
        h = jnp.tanh(out.sum((1, 2)) * 1e-3)  # (B, N)
        return uv0 + h[..., None]

    uv = jax.block_until_ready(step(img, uv0))
    t0 = time.perf_counter()
    for _ in range(reps):
        uv = step(img, uv)
    jax.block_until_ready(uv)
    return 1e3 * (time.perf_counter() - t0) / reps


def calibrate(reps=30):
    x = jnp.asarray(np.random.default_rng(1).random((64, 480, 640),
                                                    dtype=np.float32))

    @jax.jit
    def cp(x):
        return x * 1.000001 + 1e-7

    y = jax.block_until_ready(cp(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = cp(y)
    jax.block_until_ready(y)
    gbs = 2 * x.nbytes * reps / (time.perf_counter() - t0) / 1e9

    a = jnp.asarray(np.random.default_rng(2).random((4096, 4096),
                                                    dtype=np.float32)).astype(BF16)

    @jax.jit
    def mm(a):
        return (a @ a) * jnp.bfloat16(1e-4)

    b = jax.block_until_ready(mm(a))
    t0 = time.perf_counter()
    for _ in range(reps):
        b = mm(b)
    jax.block_until_ready(b)
    tf = 2 * 4096**3 * reps / (time.perf_counter() - t0) / 1e12
    return gbs, tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--n", type=int, default=1500)
    ap.add_argument("--ps", type=int, default=23)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    gbs, tf = calibrate()
    print(f"calibration: elementwise {gbs:.0f} GB/s, bf16 matmul {tf:.0f} TFLOP/s")

    B, N, PS, H, W = args.b, args.n, args.ps, args.h, args.w
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, H, W), dtype=np.float32))
    uv0 = jnp.asarray(
        np.stack([rng.uniform(0, W - PS - 2, (B, N)),
                  rng.uniform(0, H - PS - 2, (B, N))], -1), dtype=F32)

    # correctness vs (a) on one batch
    oy = uv0[..., 1].astype(jnp.int32)
    ox = uv0[..., 0].astype(jnp.int32)
    ref = jax.jit(jax.vmap(partial(extract_a, PS=PS)))(img, oy, ox)

    results = {}
    for name, fn in VARIANTS.items():
        f = jax.vmap(partial(fn, PS=PS))
        try:
            out = jax.jit(f)(img, oy, ox)
            maxdev = float(jnp.max(jnp.abs(out.astype(F32) - ref)))
            ms = chained_ms(f, img, uv0, args.reps)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": str(exc)[:200]}
            print(f"{name:18s} ERROR {str(exc)[:120]}")
            continue
        results[name] = {"ms": round(ms, 2), "maxdev": maxdev}
        print(f"{name:18s} {ms:9.2f} ms   maxdev {maxdev:.2e}")

    print(json.dumps({"B": B, "N": N, "PS": PS, "H": H, "W": W,
                      "calib_gbs": round(gbs), "calib_tflops": round(tf),
                      "results": results}))


if __name__ == "__main__":
    main()
