"""Per-segment breakdown of fused_step_full using the in-jit scan harness.

Each segment is timed cumulatively (prefix sums): prop, +marg, +augment,
+cam_rows, +line_rows, +wheel_rows, +compress, +update — successive
differences attribute the milliseconds.
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

    from __graft_entry__ import (
        SIGMA_LINE, WHEEL_NOISE, _batch_args, _example_inputs_full)
    from plviwo_tpu.core import ekf, propagator
    from plviwo_tpu.core.state import newest_clone_slot
    from plviwo_tpu.core.step import (
        _auto_marginalize, _camera_msckf_rows, _line_msckf_rows, _wheel_rows)
    from plviwo_tpu.update import wheel as wheel_up

    B = int(os.environ.get("PROF_B", 64))
    n_iter = int(os.environ.get("PROF_ITERS", 10))
    args = _example_inputs_full(n_clones=22, F=40, O=20, imu_n=32, L=16,
                                n_wheel=32)
    b = _batch_args(args, B, n_batched=16)
    (st, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
     luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid) = b[:17]
    gravity, sigmas = b[17], b[18]
    f32 = jnp.float32
    F64 = jnp.float64

    def make_prefix(n_stages):
        def one(s_, a, bb, c, d, e, f, g, h, li, lj, lk, ll, wa, wb, wc, wd):
            s_ = propagator.propagate(s_, a, bb, c, d, gravity, sigmas)
            if n_stages == 1:
                return s_
            s_ = _auto_marginalize(s_, d, 1.0)
            if n_stages == 2:
                return s_
            slot0 = newest_clone_slot(s_)
            s_ = ekf.augment_clone(s_)
            slot1 = newest_clone_slot(s_)
            if n_stages == 3:
                return s_
            Hc1, rc1, m1, _ = _camera_msckf_rows(
                s_, e, f, g, h, 1.0, 1.0, 0, f32)
            if n_stages == 4:
                return s_.replace(p=s_.p + 1e-30 * jnp.sum(Hc1))
            Hc2, rc2, m2, _ = _line_msckf_rows(
                s_, li, lj, lk, ll, SIGMA_LINE, 1.0, cam_dtype=f32)
            if n_stages == 5:
                return s_.replace(p=s_.p + 1e-30 * (jnp.sum(Hc1) + jnp.sum(Hc2)))
            Hw, rw, mw, _ = _wheel_rows(
                s_, slot0, slot1, wa, wb, wc, wd, WHEEL_NOISE, 1.0,
                wheel_up.W3D_ANG)
            if n_stages == 6:
                return s_.replace(p=s_.p + 1e-30 * (
                    jnp.sum(Hc1) + jnp.sum(Hc2) + jnp.sum(Hw)))
            H_all = jnp.concatenate([Hc1, Hc2, Hw], axis=0)
            r_all = jnp.concatenate([rc1, rc2, rw])
            mask_all = jnp.concatenate([m1, m2, mw])
            Hj, rj, mj = ekf.measurement_compress(H_all, r_all, mask_all)
            if n_stages == 7:
                return s_.replace(p=s_.p + 1e-30 * jnp.sum(Hj))
            return ekf.update(s_, Hj, rj, jnp.ones(rj.shape, dtype=F64), mj)

        def seg(s):
            return jax.vmap(one)(
                s, imu_t, imu_w, imu_a, t_new + 1e-9 * s.p[:, 0], ouv, ouvn,
                oslot, ovalid, luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid)
        return seg

    def scan_time(seg_body):
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
        return (time.perf_counter() - t0) / n_iter * 1e3

    names = ["propagate", "marginalize", "augment", "cam_rows", "line_rows",
             "wheel_rows", "compress", "update"]
    prev = 0.0
    for i, name in enumerate(names, start=1):
        ms = scan_time(make_prefix(i))
        print(f"+{name:16s} cum {ms:8.2f} ms  delta {ms - prev:8.2f} ms")
        prev = ms


if __name__ == "__main__":
    main()
