"""Isolate the f64 linalg primitives of the EKF update inside in-jit scans."""

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

    B, D = 64, 162
    n_iter = 10
    rng = np.random.default_rng(0)
    A = np.tile(np.eye(D), (B, 1, 1)) + 0.01 * rng.normal(size=(B, D, D))
    S64 = jnp.asarray(0.5 * (A + A.transpose(0, 2, 1)) + 2.0 * np.eye(D))
    rhs64 = jnp.asarray(rng.normal(size=(B, D, D)))

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
        print(f"{name:30s} {ms:8.2f} ms/iter")
        return ms

    import jax.scipy.linalg as jsl

    for dt, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        S = S64.astype(dt)
        rhs = rhs64.astype(dt)

        def b_chol(c, i):
            L = jnp.linalg.cholesky(S + c)
            return 1e-12 * jnp.mean(L) * jnp.eye(D, dtype=dt)

        def b_tri(c, i):
            x = jax.lax.linalg.triangular_solve(
                S, rhs + c, left_side=True, lower=True)
            return 1e-12 * jnp.mean(x) * jnp.ones_like(rhs)

        def b_chosolve(c, i):
            cho = jsl.cho_factor(S + c, lower=True)
            x = jsl.cho_solve(cho, rhs)
            return 1e-12 * jnp.mean(x) * jnp.eye(D, dtype=dt)

        def b_matmul3(c, i):
            X = (S + c) @ rhs
            Y = X @ S
            Z = Y @ rhs
            return 1e-12 * jnp.mean(Z) * jnp.eye(D, dtype=dt)

        z = jnp.zeros((B, D, D), dtype=dt) if False else jnp.zeros((D, D), dtype=dt)
        scan_time(f"cholesky {tag}", b_chol, jnp.zeros((D, D), dtype=dt))
        scan_time(f"triangular_solve {tag}", b_tri, jnp.zeros((B, D, D), dtype=dt))
        scan_time(f"cho_factor+cho_solve {tag}", b_chosolve,
                  jnp.zeros((D, D), dtype=dt))
        scan_time(f"3x matmul {tag}", b_matmul3, jnp.zeros((D, D), dtype=dt))


if __name__ == "__main__":
    main()
