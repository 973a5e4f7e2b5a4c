"""Chip A/B: Pallas VMEM-resident LK kernel vs the XLA shifted-MAC path.

Times `pyramidal_lk_pallas` vs `pyramidal_lk_conv` at bench shapes
(B sequences x N features, 640x480 3-level pyramids) and checks the two
produce the same tracks.  Run on the TPU:
    python tools/ab_lk_kernel.py --b 64 --n-pts 128 1500
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--n-pts", type=int, nargs="+", default=[128, 1500])
    ap.add_argument("--n-iter", type=int, default=10)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/plviwo_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from plviwo_tpu.ops import image as image_ops
    from plviwo_tpu.ops import klt as klt_ops
    from plviwo_tpu.ops.lk_kernel import pyramidal_lk_pallas
    from plviwo_tpu.sim.simulator import SimConfig, Simulator

    B = args.b
    cfg = SimConfig(duration=4.0, n_landmarks=400, n_lines=0,
                    width=640, height=480, seed=3)
    sim = Simulator(cfg)
    img0 = jnp.asarray(sim.render_frame(1.0), jnp.float32)
    img1 = jnp.asarray(sim.render_frame(1.1), jnp.float32)
    key = jax.random.PRNGKey(0)
    decor = jax.jit(lambda im, k: jnp.clip(
        im[None] + 2e-3 * jax.random.normal(k, (B,) + im.shape,
                                            dtype=jnp.float32), 0.0, 1.0))
    k0, k1 = jax.random.split(key)
    b0 = decor(img0, k0)
    b1 = decor(img1, k1)
    jit_pyr = jax.jit(jax.vmap(lambda im: tuple(
        image_ops.build_pyramid(im, 3))))
    p0 = jit_pyr(b0)
    p1 = jit_pyr(b1)

    def t_ms(fn, *a, n=args.n_iter):
        out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t1 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return 1e3 * (time.perf_counter() - t1) / n

    for N in args.n_pts:
        rng = np.random.default_rng(N)
        uv = jnp.asarray(np.stack(
            [rng.uniform(30, 610, (B, N)), rng.uniform(30, 450, (B, N))],
            -1), jnp.float32)
        valid = jnp.ones((B, N), bool)

        jit_conv = jax.jit(jax.vmap(
            lambda a0, a1, a2, b0_, b1_, b2_, u, v:
            klt_ops.pyramidal_lk_conv((a0, a1, a2), (b0_, b1_, b2_), u, v,
                                      3, 7, 10)))
        jit_pal = jax.jit(jax.vmap(
            lambda a0, a1, a2, b0_, b1_, b2_, u, v:
            pyramidal_lk_pallas((a0, a1, a2), (b0_, b1_, b2_), u, v,
                                3, 7, 10)))
        jit_pal_sf = jax.jit(jax.vmap(
            lambda a0, a1, a2, b0_, b1_, b2_, u, v:
            pyramidal_lk_pallas((a0, a1, a2), (b0_, b1_, b2_), u, v,
                                3, 7, 10, shift_free=True)))
        uc, okc = jit_conv(*p0, *p1, uv, valid)
        up, okp = jit_pal(*p0, *p1, uv, valid)
        usf, oksf = jit_pal_sf(*p0, *p1, uv, valid)
        both = np.asarray(okc & okp)
        d = np.linalg.norm(np.asarray(uc - up), axis=-1)[both]
        dsf = np.linalg.norm(np.asarray(uc - usf), axis=-1)[
            np.asarray(okc & oksf)]
        ms_c = t_ms(lambda: jit_conv(*p0, *p1, uv, valid))
        ms_p = t_ms(lambda: jit_pal(*p0, *p1, uv, valid))
        ms_sf = t_ms(lambda: jit_pal_sf(*p0, *p1, uv, valid))
        print(json.dumps({
            "N": N, "B": B,
            "conv_ms": round(ms_c, 1), "pallas_ms": round(ms_p, 1),
            "pallas_sf_ms": round(ms_sf, 1),
            "speedup": round(ms_c / ms_p, 2),
            "speedup_sf": round(ms_c / ms_sf, 2),
            "sf_median_dev_px": round(float(np.median(dsf)), 5)
            if dsf.size else None,
            "ok_conv": int(np.asarray(okc).sum()),
            "ok_pallas": int(np.asarray(okp).sum()),
            "median_dev_px": round(float(np.median(d)), 5) if d.size else None,
            "p99_dev_px": round(float(np.percentile(d, 99)), 4)
            if d.size else None,
        }), flush=True)


if __name__ == "__main__":
    main()
