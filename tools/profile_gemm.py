"""Compare f64 GEMM vs split double-f32 GEMM vs f32 GEMM (in-jit scans).

The EKF update + joint compression spend ~6 D^3-class f64 GEMMs per frame.
TPU f64 matmul is software-emulated (double-word arithmetic); a hi/lo f32
split A@B ~= Ah@Bh + (Ah@Bl + Al@Bh) costs 3 f32 GEMMs with accumulation
error ~ K*eps_f32 — candidate replacement.  This script measures both time
and worst-case relative error on covariance-scale operands.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    B = int(os.environ.get("PROF_B", 64))
    D = int(os.environ.get("PROF_D", 162))
    n_iter = 20
    rng = np.random.default_rng(0)
    # covariance-like operand: strong diagonal + correlations, wide dynamic range
    A = np.tile(np.eye(D), (B, 1, 1)) + 0.1 * rng.normal(size=(B, D, D))
    scale = np.exp(rng.uniform(-6, 2, size=D))  # variance dynamic range ~1e8
    A = A * scale[None, :, None] * scale[None, None, :]
    P = jnp.asarray(0.5 * (A + A.transpose(0, 2, 1)) + np.diag(scale**2))
    H = jnp.asarray(rng.normal(size=(B, D, D)))

    def split_matmul(a, b):
        ah = a.astype(jnp.float32)
        al = (a - ah.astype(jnp.float64)).astype(jnp.float32)
        bh = b.astype(jnp.float32)
        bl = (b - bh.astype(jnp.float64)).astype(jnp.float32)
        hi = jnp.matmul(ah, bh, precision=jax.lax.Precision.HIGHEST)
        lo = (jnp.matmul(ah, bl, precision=jax.lax.Precision.HIGHEST)
              + jnp.matmul(al, bh, precision=jax.lax.Precision.HIGHEST))
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)

    # accuracy check
    ref = P @ H
    got = split_matmul(P, H)
    rel = jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref))
    f32v = (P.astype(jnp.float32) @ H.astype(jnp.float32)).astype(jnp.float64)
    rel32 = jnp.max(jnp.abs(f32v - ref)) / jnp.max(jnp.abs(ref))
    print(f"split GEMM max rel err {float(rel):.3e}   plain f32 {float(rel32):.3e}")

    def scan_time(name, body, carry0):
        @jax.jit
        def run(c0):
            return jax.lax.scan(lambda c, i: (body(c, i), 0.0),
                                c0, jnp.arange(n_iter))[0]
        out = run(carry0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(carry0)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n_iter * 1e3
        print(f"{name:26s} {ms:8.3f} ms/iter")
        return ms

    def b_f64(c, i):
        return 0.999 * (P @ (H + 1e-15 * c)) @ jnp.eye(D) * 1e-3

    def b_split(c, i):
        return 0.999 * split_matmul(P, H + 1e-15 * c) * 1e-3

    def b_f32(c, i):
        x = (P.astype(jnp.float32) @ (H + 1e-15 * c).astype(jnp.float32))
        return 0.999 * x.astype(jnp.float64) * 1e-3

    z = jnp.zeros((B, D, D))
    scan_time("f64 GEMM (BxDxD@DxD)", b_f64, z)
    scan_time("split df32 GEMM", b_split, z)
    scan_time("plain f32 GEMM", b_f32, z)


if __name__ == "__main__":
    main()
