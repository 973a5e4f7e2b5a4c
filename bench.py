"""Benchmark: fused filter-step throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: full PL-VIWO frames per second on one chip, batched over independent
sequences (the data-parallel replay unit).  Each step is the full per-frame
device pipeline in ONE dispatch: IMU-window RK4+FEJ propagation (32 samples),
window marginalization, clone augmentation, batched point triangulation (40
features x 20 obs), MSCKF Jacobians, nullspace projection + chi2 gating,
Gram compression, the EKF update on the ~200-dim state, PLUS the line update
(two-plane Plücker triangulation, 16 lines, 4-dof nullspace, gate, compress,
update) and the wheel preintegration update (32-sample 3D RK4, whiten, gate,
update).  All measurement rows are real (geometrically consistent inputs).

Baseline: the reference (MINS-class C++ sliding-window filter, SURVEY.md
section 6) publishes no in-repo numbers; its class of filter processes a
frame in ~2 ms on a desktop CPU (~500 frames/s).  BASELINE.json targets
>=3x reference throughput per chip, so vs_baseline = fps / 1500.

Round-1 measured (single v5e chip through the axon relay): ~25 fps with the
all-f64 step, ~85 fps with the f32 camera path at B=16, ~120-130 fps at
B=64.  Remaining gap is under investigation (needs an on-device profiler;
the relay's remote dispatch makes fine-grained attribution unreliable).
"""

from __future__ import annotations

import json
import time

REFERENCE_FPS = 500.0  # assumed reference CPU frames/s (documented above)
TARGET_MULT = 3.0


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import (
        SIGMA_LINE, WHEEL_NOISE, _batch_args, _example_inputs_full)
    from plviwo_tpu.core.step import fused_step_full

    import os

    B = int(os.environ.get("BENCH_B", 64))   # sequences per chip
    n_clones = 22   # 1 s window at up to 20 Hz + margin (KAIST config scale)
    F = int(os.environ.get("BENCH_F", 40))
    O = 20
    L = int(os.environ.get("BENCH_L", 16))   # line tracks per frame
    IMU_N = int(os.environ.get("BENCH_IMU_N", 32))
    N_WHEEL = 32
    cam_dtype = (jnp.float32 if os.environ.get("BENCH_CAM_DTYPE", "f32") == "f32"
                 else jnp.float64)
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"

    # geometrically consistent observations (real accepted point/line/wheel
    # rows, shared with the driver's multichip dryrun — VERDICT round-1 weak
    # items 1 and 2: the benched step includes the line + wheel work)
    args = _example_inputs_full(n_clones=n_clones, F=F, O=O, imu_n=IMU_N,
                                L=L, n_wheel=N_WHEEL)
    b = _batch_args(args, B, n_batched=16)
    (batched, imu_t, imu_w, imu_a, t_new, obs_uv, obs_uvn, obs_slot,
     obs_valid, line_uv, line_uvn, line_slot, line_valid,
     wheel_t, wheel_m1, wheel_m2, wheel_valid) = b[:17]
    gravity, sigmas = b[17], b[18]

    @jax.jit
    def step_batch(st, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
                   luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid):
        return jax.vmap(
            lambda s, a, b, c, d, e, f, g, h, li, lj, lk, ll, wa, wb, wc, wd:
            fused_step_full(
                s, a, b, c, d, e, f, g, h, li, lj, lk, ll, wa, wb, wc, wd,
                gravity, sigmas, 1.0, 1.0, SIGMA_LINE, WHEEL_NOISE,
                model=0, window_size=1.0, cam_dtype=cam_dtype,
                use_pallas=use_pallas,
            )
        )(st, imu_t, imu_w, imu_a, t_new, ouv, ouvn, oslot, ovalid,
          luv, luvn, lslot, lvalid, wt, wm1, wm2, wvalid)

    per_frame = (imu_t, imu_w, imu_a, t_new, obs_uv, obs_uvn, obs_slot,
                 obs_valid, line_uv, line_uvn, line_slot, line_valid,
                 wheel_t, wheel_m1, wheel_m2, wheel_valid)

    # warmup / compile
    out, metrics = step_batch(batched, *per_frame)
    jax.block_until_ready(out.p)
    accepted0 = int(jnp.sum(metrics["accepted"]))
    lines0 = int(jnp.sum(metrics["lines_accepted"]))
    wheel0 = int(jnp.sum(metrics["wheel_accepted"]))
    assert accepted0 > 0, "bench step accepted no features"
    assert lines0 > 0 and wheel0 > 0, "bench step accepted no lines/wheel"

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out, _ = step_batch(out, *per_frame)
    jax.block_until_ready(out.p)
    wall = time.perf_counter() - t0

    fps = B * n_iter / wall
    print(json.dumps({
        "metric": f"full PL-VIWO frames/s per chip (fused points+lines+wheel "
                  f"step, B={B}, accepted={accepted0}, lines={lines0}, "
                  f"wheel={wheel0})",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / (REFERENCE_FPS * TARGET_MULT), 3),
    }))


if __name__ == "__main__":
    main()
