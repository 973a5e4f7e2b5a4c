"""Inside-propagate attribution: mean-only, +transitions, +tree, +cov."""

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

    from __graft_entry__ import _batch_args, _example_inputs_full
    from plviwo_tpu.core import propagator
    from plviwo_tpu.core.ekf import propagate_cov
    from plviwo_tpu.ops import lie

    B = int(os.environ.get("PROF_B", 64))
    n_iter = int(os.environ.get("PROF_ITERS", 10))
    args = _example_inputs_full(n_clones=22, F=40, O=20, imu_n=32, L=16,
                                n_wheel=32)
    b = _batch_args(args, B, n_batched=16)
    st, imu_t, imu_w, imu_a, t_new = b[0], b[1], b[2], b[3], b[4]
    gravity, sigmas = b[17], b[18]

    def scan_time(name, seg_body):
        @jax.jit
        def run(s0):
            def body(s, _):
                return seg_body(s), 0.0
            return jax.lax.scan(body, s0, jnp.arange(n_iter))[0]

        out = run(st)
        jax.block_until_ready(out.p)
        t0 = time.perf_counter()
        out = run(st)
        jax.block_until_ready(out.p)
        ms = (time.perf_counter() - t0) / n_iter * 1e3
        print(f"{name:20s} {ms:8.2f} ms/iter")

    def stage(n_stages):
        def one(s, a, bb, c, d):
            q, p, v, Phi, Qd = propagator.propagate_arrays(
                s.q, s.p, s.v, s.bg, s.ba, s.q_fej, s.p_fej, s.v_fej,
                a, bb, c, gravity, sigmas)
            if n_stages == 1:
                return s.replace(p=s.p + 1e-30 * (p + q[:3] + v))
            cov = propagate_cov(s.cov, Phi, Qd)
            return s.replace(q=q, p=p, v=v, cov=cov)

        def seg(s):
            return jax.vmap(one)(s, imu_t, imu_w, imu_a,
                                 t_new + 1e-9 * s.p[:, 0])
        return seg

    # mean + transitions + tree (propagate_arrays returns all of it fused;
    # stage 1 discards Phi/Qd so DCE strips what the mean doesn't need)
    scan_time("mean_only(dce)", stage(1))
    scan_time("full_propagate", stage(2))


if __name__ == "__main__":
    main()
