"""Bisect pyramidal_lk_conv cost at density shapes (B x N) on the chip.

Round-5 recorded conv-LK as 89% of the frame at n_pts=1500 and attributed
the fixed cost to patch extraction.  CAVEAT discovered while writing this
tool: on the tunneled 'axon' platform, `block_until_ready` on a single
dispatch returns early for fast ops (a bf16 8k matmul "measured" 7000
TFLOP/s), so single-shot timings under ~100 ms are meaningless.  Every
number here therefore comes from a CHAINED timer: the op runs R times
inside one jit with a data dependency (the op's output perturbs the next
iteration's feature coordinates), so the device cannot overlap or elide
repetitions; cost = total/R with the R=0 overhead subtracted.
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from plviwo_tpu.ops import klt as K
from plviwo_tpu.ops import image as image_ops

F32 = jnp.float32


def chained_ms(step, uv0, reps: int):
    """step: uv (B,N,2) -> uv' (B,N,2).  Python-loop chain of `reps`
    data-dependent dispatches (the bench.py methodology) — the device must
    execute them serially, so total/reps is an honest per-op cost even where
    a single dispatch's block_until_ready returns early."""
    f = jax.jit(step)
    uv = jax.block_until_ready(f(uv0))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        uv = f(uv)
    jax.block_until_ready(uv)
    return 1e3 * (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--n", type=int, default=1500)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    B, N = args.b, args.n
    H, W = 480, 640
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((B, H, W), dtype=np.float32))
    img1 = jnp.asarray(rng.random((B, H, W), dtype=np.float32))
    uv0 = jnp.asarray(
        np.stack([rng.uniform(40, W - 40, (B, N)),
                  rng.uniform(40, H - 40, (B, N))], -1), dtype=F32)
    valid = jnp.ones((B, N), dtype=bool)

    def wiggle(uv, sig):
        # keep coordinates in-frame while changing every iteration
        c = jnp.asarray([W / 2.0, H / 2.0], F32)
        r = jnp.asarray([W / 2.0 - 40.0, H / 2.0 - 40.0], F32)
        return c + r * jnp.sin(uv * 0.37 + sig)

    R = args.reps

    # whole pyramidal LK
    pyr0 = jax.jit(jax.vmap(partial(image_ops.build_pyramid,
                                    levels=args.levels)))(img0)
    pyr1 = jax.jit(jax.vmap(partial(image_ops.build_pyramid,
                                    levels=args.levels)))(img1)
    pyr0 = tuple(pyr0)
    pyr1 = tuple(pyr1)

    def step_full(uv):
        out, ok = jax.vmap(partial(K.pyramidal_lk_conv, levels=args.levels,
                                   half=7, iters=args.iters),
                           in_axes=(0, 0, 0, 0))(pyr0, pyr1, uv, valid)
        return wiggle(out, 0.1)

    print(f"pyramidal_lk_conv   {chained_ms(step_full, uv0, R):9.2f} ms")

    # one full-res level
    for D, tag in ((2, "fine  D=2"), (5, "coarse D=5")):
        def step_lvl(uv, D=D):
            out, err, good, inb = jax.vmap(
                partial(K._lk_level_conv, half=7, iters=args.iters, drift=D),
                in_axes=(0, 0, 0, 0))(img0, img1, uv, uv)
            return wiggle(out, 0.2)

        print(f"_lk_level_conv L0 {tag}  {chained_ms(step_lvl, uv0, R):9.2f} ms")

    # stage bisect at level 0, D=2
    half, D = 7, 2
    Wn = 2 * half + 1
    KS = 2 * D + 3
    PS = Wn + 2 + KS - 1

    def origins(uvq, back):
        g = jnp.floor(uvq)
        ox = jnp.clip(g[:, 0].astype(jnp.int32) - back, 0, W - PS)
        oy = jnp.clip(g[:, 1].astype(jnp.int32) - back, 0, H - PS)
        return oy, ox

    def mk(stage):
        def step(uv):
            out = jax.vmap(stage)(img0, img1, uv)
            return wiggle(uv + out[:, None, :], 0.3)

        return step

    def s_extract1(i0, i1, uvp):
        oy, ox = origins(uvp, (half + 1) + (D + 1))
        Pp = K._extract_patches(i0, oy, ox, PS)
        return jnp.stack([Pp.sum(), Pp.max()]) * 1e-6

    def s_extract2(i0, i1, uvp):
        oy, ox = origins(uvp, (half + 1) + (D + 1))
        Pp = K._extract_patches(i0, oy, ox, PS)
        oyg, oxg = origins(uvp, half + (D + 1))
        Pn = K._extract_patches(i1, oyg, oxg, PS)
        return jnp.stack([Pp.sum() + Pn.sum(), Pp.max()]) * 1e-6

    def s_template(i0, i1, uvp):
        oy, ox = origins(uvp, (half + 1) + (D + 1))
        Pp = K._extract_patches(i0, oy, ox, PS)
        uty = uvp[:, 1] - oy.astype(F32) - (half + 1)
        utx = uvp[:, 0] - ox.astype(F32) - (half + 1)
        T_ext = K._patch_sample(Pp, uty, utx, Wn + 2, Wn + 2, D)
        return jnp.stack([T_ext.sum(), T_ext.max()]) * 1e-6

    def s_iters(i0, i1, uvp):
        oyg, oxg = origins(uvp, half + (D + 1))
        Pn = K._extract_patches(i1, oyg, oxg, PS)
        og = jnp.stack([oxg, oyg], -1).astype(F32)

        def body(uvq, _):
            u = uvq - og - half
            I = K._patch_sample(Pn, u[:, 1], u[:, 0], Wn, Wn, D)
            duv = jnp.stack([I.sum((0, 1)), I.max((0, 1))], -1) * 1e-6
            return uvq - duv, None

        uvq, _ = jax.lax.scan(body, uvp, None, length=args.iters)
        return jnp.stack([uvq.sum(), uvq.max()]) * 1e-6

    for name, st in (("extract x1     ", s_extract1),
                     ("extract x2     ", s_extract2),
                     ("extract+templ  ", s_template),
                     (f"extract+{args.iters}iter ", s_iters)):
        print(f"  {name} {chained_ms(mk(st), uv0, R):9.2f} ms")


if __name__ == "__main__":
    main()
