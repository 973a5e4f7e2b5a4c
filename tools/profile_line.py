"""Localize the line-slice cost: rows-only vs rows+update vs full fused step,
all timed with the in-jit scan-chain harness (see profile_full2.py)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import (
        SIGMA_LINE, WHEEL_NOISE, _batch_args, _example_inputs_full)
    from plviwo_tpu.core import ekf, propagator
    from plviwo_tpu.core.state import newest_clone_slot
    from plviwo_tpu.core.step import (
        _auto_marginalize, _line_msckf_rows, fused_step_full)
    from plviwo_tpu.update import lines as line_up

    B = int(os.environ.get("PROF_B", 64))
    n_iter = int(os.environ.get("PROF_ITERS", 10))
    args = _example_inputs_full(n_clones=22, F=40, O=20, imu_n=32, L=16,
                                n_wheel=32)
    b = _batch_args(args, B, n_batched=16)
    (st, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
     luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid) = b[:17]
    gravity, sigmas = b[17], b[18]
    f32 = jnp.float32

    @jax.jit
    def prep(st):
        def one(s, a, bb, c, d):
            s = propagator.propagate(s, a, bb, c, d, gravity, sigmas)
            s = _auto_marginalize(s, d, 1.0)
            s = ekf.augment_clone(s)
            return s
        return jax.vmap(one)(st, imu_t, imu_w, imu_a, t_new)

    st2 = prep(st)
    jax.block_until_ready(st2.p)

    def scan_time(name, seg_body):
        @jax.jit
        def run(s0):
            def body(s, _):
                return seg_body(s), 0.0
            return jax.lax.scan(body, s0, jnp.arange(n_iter))[0]

        out = run(st2)
        jax.block_until_ready(out.p)
        t0 = time.perf_counter()
        out = run(st2)
        jax.block_until_ready(out.p)
        ms = (time.perf_counter() - t0) / n_iter * 1e3
        print(f"{name:24s} {ms:8.2f} ms/iter")

    F64 = jnp.float64

    def seg_tri(s):
        # triangulation only; fold the result back into the state so the
        # scan carries a dependency
        def one(s_, a, bb, c, d):
            cq = s_.clone_q[c]
            cp = s_.clone_p[c]
            n_G, v_G, ok, cnt = line_up.triangulate_two_plane(
                bb, cq, cp, d, s_.cam_q[0], s_.cam_p[0])
            return s_.replace(p=s_.p + 1e-30 * jnp.sum(n_G))
        return jax.vmap(one)(s, luv, luvn, lslot, lvalid)

    def seg_rows(s):
        def one(s_, a, bb, c, d):
            Hc, rc, m, n_ok = _line_msckf_rows(
                s_, a, bb, c, d, SIGMA_LINE, 1.0, cam_dtype=f32)
            return s_.replace(p=s_.p + 1e-30 * jnp.sum(Hc))
        return jax.vmap(one)(s, luv, luvn, lslot, lvalid)

    def seg_rows_update(s):
        def one(s_, a, bb, c, d):
            Hc, rc, m, n_ok = _line_msckf_rows(
                s_, a, bb, c, d, SIGMA_LINE, 1.0, cam_dtype=f32)
            return ekf.update(s_, Hc, rc, jnp.ones(rc.shape, dtype=F64), m)
        return jax.vmap(one)(s, luv, luvn, lslot, lvalid)

    def seg_full(s):
        def one(s_, a, bb, c, d, e, f, g, h, li, lj, lk, ll, wa, wb, wc, wd):
            return fused_step_full(
                s_, a, bb, c, d, e, f, g, h, li, lj, lk, ll, wa, wb, wc, wd,
                gravity, sigmas, 1.0, 1.0, SIGMA_LINE, WHEEL_NOISE,
                model=0, window_size=1.0, cam_dtype=f32)[0]
        return jax.vmap(one)(s, imu_t, imu_w, imu_a,
                             t_new + 1e-9 * s.p[:, 0], ouv, ouvn, oslot,
                             ovalid, luv, luvn, lslot, lvalid, wt, wm1, wm2,
                             wvalid)

    scan_time("line_triangulate", seg_tri)
    scan_time("line_rows", seg_rows)
    scan_time("line_rows+update", seg_rows_update)
    scan_time("fused_full", seg_full)


if __name__ == "__main__":
    main()
