"""Decompose the fused step's cam_rows segment (25.3 ms of 69 at B=64):
triangulation vs Jacobian-system build vs nullspace+gate vs compression.
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

    from __graft_entry__ import _batch_args, _example_inputs_full
    from plviwo_tpu.core import ekf
    from plviwo_tpu.ops.chi2 import _TABLE as _CHI2_NP
    from plviwo_tpu.update import cam_helper

    B = int(os.environ.get("PROF_B", 64))
    n_iter = 10
    args = _example_inputs_full(n_clones=22, F=40, O=20, imu_n=32, L=16,
                                n_wheel=32)
    b = _batch_args(args, B, n_batched=16)
    (st, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid) = b[:9]
    f32 = jnp.float32

    def t_run(fn, *a):
        out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n_iter * 1e3

    lo = st.layout

    def tri(s, uvn, slot, valid):
        cq = s.clone_q[slot].astype(f32)
        cp = s.clone_p[slot].astype(f32)
        return cam_helper.triangulate_batch(
            uvn.astype(f32), cq, cp, valid, s.cam_q[0].astype(f32),
            s.cam_p[0].astype(f32))

    tri_b = jax.jit(jax.vmap(tri))
    ms = t_run(tri_b, st, ouvn, oslot, ovalid)
    print(f"triangulate_batch (40x20, f32)  {ms:8.2f} ms/batch (B={B})")
    p_f, ok, avg = tri_b(st, ouvn, oslot, ovalid)

    def systems(s, pf, uv, slot, valid):
        return cam_helper.point_systems_batch(
            pf, uv.astype(f32), slot, valid,
            s.clone_q.astype(f32), s.clone_p.astype(f32),
            s.clone_q_fej.astype(f32), s.clone_p_fej.astype(f32),
            s.cam_q[0].astype(f32), s.cam_p[0].astype(f32),
            s.cam_k[0].astype(f32), 0, lo.n_clones, lo.clone_off, lo.dim)

    sys_b = jax.jit(jax.vmap(systems))
    ms = t_run(sys_b, st, p_f, ouv, oslot, ovalid)
    print(f"point_systems_batch (jacfwd)    {ms:8.2f} ms/batch")
    Hx, Hf, r, rowmask = sys_b(st, p_f, ouv, oslot, ovalid)

    chi2_table = jnp.asarray(_CHI2_NP).astype(f32)

    def gate(s, hx, hf, rr, mask):
        return cam_helper.msckf_project_and_gate(
            hx, hf, rr, mask, s.cov.astype(f32), jnp.asarray(1.0, f32),
            chi2_table, 1.0)

    gate_b = jax.jit(jax.vmap(gate))
    ms = t_run(gate_b, st, Hx, Hf, r, rowmask)
    print(f"nullspace+chi2 gate             {ms:8.2f} ms/batch")
    Hn, rn, rowvalid, feat_ok = gate_b(st, Hx, Hf, r, rowmask)

    def compress(hn, rr, rv):
        M = hn.shape[0] * hn.shape[1]
        return ekf.measurement_compress(
            hn.reshape(M, lo.dim), rr.reshape(M), rv.reshape(M))

    comp_b = jax.jit(jax.vmap(compress))
    ms = t_run(comp_b, Hn, rn, rowvalid)
    print(f"measurement_compress (QR)       {ms:8.2f} ms/batch")


if __name__ == "__main__":
    main()
