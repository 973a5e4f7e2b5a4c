"""Break down propagate cost: mean RK4+prefix vs transition build vs tree
reduction vs covariance propagation (in-jit scan timing, B batched)."""

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

    from plviwo_tpu.core import propagator
    from plviwo_tpu.core.ekf import propagate_cov
    from plviwo_tpu.ops import lie

    B = int(os.environ.get("PROF_B", 64))
    N = int(os.environ.get("PROF_N", 32))
    D = int(os.environ.get("PROF_D", 162))
    n_iter = 20
    rng = np.random.default_rng(0)

    q = jnp.asarray(np.tile([0.0, 0, 0, 1], (B, 1)))
    p = jnp.asarray(rng.normal(size=(B, 3)))
    v = jnp.asarray(rng.normal(size=(B, 3)))
    bg = jnp.asarray(0.01 * rng.normal(size=(B, 3)))
    ba = jnp.asarray(0.01 * rng.normal(size=(B, 3)))
    imu_t = jnp.asarray(np.tile(np.linspace(0, 0.1, N), (B, 1)))
    imu_w = jnp.asarray(0.3 * rng.normal(size=(B, N, 3)))
    imu_a = jnp.asarray(rng.normal(size=(B, N, 3)) + [0, 0, 9.81])
    gravity = jnp.asarray([0.0, 0, 9.81])
    sigmas = tuple(jnp.asarray(s) for s in (1.7e-4, 2e-3, 2e-5, 3e-3))
    A0 = np.tile(np.eye(D), (B, 1, 1)) + 0.01 * rng.normal(size=(B, D, D))
    cov = jnp.asarray(0.5 * (A0 + A0.transpose(0, 2, 1)) + 2 * np.eye(D))

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
        print(f"{name:24s} {ms:8.2f} ms/iter")

    def full(c, i):
        out = jax.vmap(
            lambda *a: propagator.propagate_arrays(*a, gravity, sigmas)
        )(q, p + 1e-12 * c, v, bg + 1e-15 * c, ba + 1e-15 * c, q, p, v,
          imu_t, imu_w, imu_a)
        return c + 1e-12 * out[1]

    scan_time("propagate_arrays", full, jnp.zeros((B, 3)))

    def cov_only(c, i):
        phi = jnp.broadcast_to(jnp.eye(15), (B, 15, 15)) + 1e-12 * c[:, :15, :15]
        qd = jnp.broadcast_to(1e-6 * jnp.eye(15), (B, 15, 15))
        out = jax.vmap(propagate_cov)(cov, phi, qd)
        return c + 1e-12 * out

    scan_time("propagate_cov", cov_only, jnp.zeros((B, D, D)))

    # --- the full state-level propagate exactly as profile_full2 runs it ---
    from __graft_entry__ import _batch_args, _example_inputs_full

    args = _example_inputs_full(n_clones=22, F=40, O=20, imu_n=N, L=16,
                                n_wheel=32)
    bb = _batch_args(args, B, n_batched=16)
    st, bimu_t, bimu_w, bimu_a, bt_new = bb[0], bb[1], bb[2], bb[3], bb[4]

    def seg_propagate(s):
        def one(s_, a, w_, c, d):
            return propagator.propagate(s_, a, w_, c, d, gravity, sigmas)
        return jax.vmap(one)(s, bimu_t, bimu_w, bimu_a,
                             bt_new + 1e-9 * s.p[:, 0])

    def body_state(s, i):
        return seg_propagate(s)

    @jax.jit
    def run_state(s0):
        return jax.lax.scan(lambda s, i: (body_state(s, i), 0.0),
                            s0, jnp.arange(n_iter))[0]

    out = run_state(st)
    jax.block_until_ready(out.p)
    t0 = time.perf_counter()
    out = run_state(st)
    jax.block_until_ready(out.p)
    ms = (time.perf_counter() - t0) / n_iter * 1e3
    print(f"{'propagate(state)':24s} {ms:8.2f} ms/iter")

    # bisect: arrays-only with the graft inputs (carried via p)
    def arrays_graft(c, i):
        out = jax.vmap(
            lambda *a: propagator.propagate_arrays(*a, gravity, sigmas)
        )(st.q, st.p + 1e-12 * c, st.v, st.bg + 1e-15 * c, st.ba + 1e-15 * c,
          st.q_fej, st.p_fej, st.v_fej, bimu_t, bimu_w, bimu_a)
        return c + 1e-12 * out[1]

    scan_time("arrays(graft inputs)", arrays_graft, jnp.zeros((B, 3)))

    # bisect: state carry, arrays only (skip cov)
    def seg_prop_nocov(s):
        def one(s_, a, w_, c, d):
            g = jnp.asarray(gravity, dtype=jnp.float64)
            qq, pp, vv, Phi, Qd = propagator.propagate_arrays(
                s_.q, s_.p, s_.v, s_.bg, s_.ba, s_.q_fej, s_.p_fej, s_.v_fej,
                a, w_, c, g, sigmas)
            return s_.replace(q=qq, p=pp, v=vv, q_fej=qq, p_fej=pp, v_fej=vv,
                              time=jnp.asarray(d, dtype=jnp.float64))
        return jax.vmap(one)(s, bimu_t, bimu_w, bimu_a,
                             bt_new + 1e-9 * s.p[:, 0])

    @jax.jit
    def run_state2(s0):
        return jax.lax.scan(lambda s, i: (seg_prop_nocov(s), 0.0),
                            s0, jnp.arange(n_iter))[0]

    out = run_state2(st)
    jax.block_until_ready(out.p)
    t0 = time.perf_counter()
    out = run_state2(st)
    jax.block_until_ready(out.p)
    ms = (time.perf_counter() - t0) / n_iter * 1e3
    print(f"{'propagate(state,nocov)':24s} {ms:8.2f} ms/iter")


if __name__ == "__main__":
    main()
