"""On-device roofline for the fused full-pipeline step (SURVEY 5.1 gap).

Measures wall time of `fused_step_full` on the attached chip (relay-safe
chained iterations), pulls FLOP/byte counts from XLA's compiled cost
analysis, and reports achieved GFLOP/s + GB/s against the chip's peaks —
locating the step on the roofline (compute- vs bandwidth-bound).

Peaks default to TPU v5e-1 and are overridable:
    ROOF_PEAK_TFLOPS (bf16 197 / f32 ~49 on v5e; cost analysis counts
    algorithmic flops, so compare against the dtype mix actually used)
    ROOF_PEAK_GBS    (HBM, v5e ~819)

Usage:  python tools/roofline.py          (TPU via the axon relay)
        JAX_PLATFORMS=cpu python tools/roofline.py   (smoke on CPU)
"""

from __future__ import annotations

import json
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
    from plviwo_tpu.core.step import fused_step_full

    B = int(os.environ.get("ROOF_B", 64))
    peak_tflops = float(os.environ.get("ROOF_PEAK_TFLOPS", 197.0))
    peak_gbs = float(os.environ.get("ROOF_PEAK_GBS", 819.0))

    args = _example_inputs_full(n_clones=22, F=40, O=20, imu_n=32, L=16,
                                n_wheel=32)
    b = _batch_args(args, B, n_batched=16)
    batched, per_frame = b[0], b[1:17]
    gravity, sigmas = b[17], b[18]

    def step_batch(st, *pf):
        return jax.vmap(
            lambda s, a, c, d, e, f, g, h, i, li, lj, lk, ll, wa, wb, wc, wd:
            fused_step_full(
                s, a, c, d, e, f, g, h, i, li, lj, lk, ll, wa, wb, wc, wd,
                gravity, sigmas, 1.0, 1.0, SIGMA_LINE, WHEEL_NOISE,
                model=0, window_size=1.0, cam_dtype=jnp.float32,
            )
        )(st, *pf)

    lowered = jax.jit(step_batch).lower(batched, *per_frame)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    out, _ = compiled(batched, *per_frame)
    jax.block_until_ready(out.p)
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out, _ = compiled(out, *per_frame)
    jax.block_until_ready(out.p)
    dt = (time.perf_counter() - t0) / n_iter

    gflops = flops / dt / 1e9
    gbs = bytes_acc / dt / 1e9
    # arithmetic intensity vs the machine balance point
    ai = flops / max(bytes_acc, 1.0)
    balance = peak_tflops * 1e3 / peak_gbs
    print(json.dumps({
        "step_ms": round(dt * 1e3, 2),
        "frames_per_s": round(B / dt, 1),
        "flops_per_step": flops,
        "bytes_per_step": bytes_acc,
        "achieved_gflops": round(gflops, 1),
        "achieved_gbs": round(gbs, 1),
        "pct_peak_flops": round(100 * gflops / (peak_tflops * 1e3), 2),
        "pct_peak_bw": round(100 * gbs / peak_gbs, 2),
        "arith_intensity": round(ai, 2),
        "machine_balance": round(balance, 2),
        "bound": "compute" if ai > balance else "bandwidth",
    }))


if __name__ == "__main__":
    main()
