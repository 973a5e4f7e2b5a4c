"""Reproduce the round-3 bench failure: images-in accepted ZERO rows on TPU.

Runs the bench's exact images-in unit with per-frame metric dumps so we can
see WHERE acceptance dies: tracking (tracked), harvest (harvested), or the
gate (accepted).  Platform + matmul precision are knobs:

  python tools/debug_bench_images.py --platform cpu --b 4
  python tools/debug_bench_images.py --b 8 --prec float32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--n-pre", type=int, default=6)
    ap.add_argument("--n-iter", type=int, default=12)
    ap.add_argument("--n-pts", type=int, default=128)
    ap.add_argument("--prec", type=str, default=None,
                    help="jax default_matmul_precision (e.g. float32)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/plviwo_jax_cache_tpu"
                      if args.platform != "cpu" else "/tmp/plviwo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.prec:
        jax.config.update("jax_default_matmul_precision", args.prec)
    import jax.numpy as jnp

    from plviwo_tpu.core.frame import fused_frame, make_track_state
    from plviwo_tpu.core.layout import StateLayout
    from plviwo_tpu.sim.simulator import SimConfig, Simulator
    from tests.test_fused_frame import _imu_window, _seed_state, _wheel_window

    F64 = jnp.float64
    B = args.b
    W, H = 640, 480
    n_pts = args.n_pts
    max_lines = 24

    cfg = SimConfig(duration=6.0, n_landmarks=350, n_lines=40,
                    width=W, height=H, seed=3)
    sim = Simulator(cfg)
    layout = StateLayout(n_clones=14, n_cams=1, use_wheel=True)
    t0 = 1.0
    state0 = _seed_state(sim, layout, t0)
    ts0 = make_track_state(H, W, n_pts=n_pts, max_lines=max_lines, max_obs=8)
    imu_t, imu_w, imu_a = sim.imu_stream()
    gravity = jnp.asarray([0.0, 0.0, 9.81])
    sigmas = (cfg.sigma_w, cfg.sigma_a, cfg.sigma_wb, cfg.sigma_ab)
    wheel_noise = (0.05, 0.05, 0.02)

    n_pre, n_iter = args.n_pre, args.n_iter
    frames, imus, wheels, t_news = [], [], [], []
    t_prev = t0
    for i in range(n_pre + n_iter):
        t = t0 + 0.1 * (i + 1)
        frames.append(jax.device_put(
            jnp.asarray(sim.render_frame(t), dtype=jnp.float32)))
        imus.append(tuple(jax.device_put(x)
                          for x in _imu_window(imu_t, imu_w, imu_a, t_prev, t)))
        wheels.append(tuple(jax.device_put(x)
                            for x in _wheel_window(sim, t_prev, t)))
        t_news.append(jax.device_put(jnp.asarray(t, F64)))
        t_prev = t

    def one_seq(state, ts, img, it, iw, ia, t_new, wt, wm1, wm2):
        return fused_frame(
            state, ts, img, it, iw, ia, t_new, wt, wm1, wm2,
            jnp.asarray(True), gravity, sigmas, 1.5, 8.0, 2.0, wheel_noise,
            model=0, window_size=1.0, cam_dtype=jnp.float32, min_track=4)

    step = jax.jit(jax.vmap(
        one_seq, in_axes=(0, 0, None, None, None, None, None, None, None,
                          None)))

    bstate = jax.tree.map(lambda x: jnp.stack([x] * B), state0)
    bts = jax.tree.map(lambda x: jnp.stack([x] * B), ts0)
    bts = bts.replace(key=jax.vmap(jax.random.PRNGKey)(jnp.arange(B)))

    wall0 = time.perf_counter()
    for i in range(n_pre + n_iter):
        it, iw, ia = imus[i]
        wt, wm1, wm2 = wheels[i]
        bstate, bts, m = step(bstate, bts, frames[i],
                              it, iw, ia, t_news[i], wt, wm1, wm2)
        mh = jax.device_get(m)
        pdiag = jnp.diagonal(bstate.cov, axis1=-2, axis2=-1)
        nan_cov = int(jnp.sum(~jnp.isfinite(pdiag)))
        nan_p = int(jnp.sum(~jnp.isfinite(bstate.p)))
        print(f"frame {i:2d} t={1.0 + 0.1 * (i + 1):.1f} "
              f"tracked={int(mh['tracked'].sum()):5d} "
              f"ltracked={int(mh['line_tracked'].sum()):4d} "
              f"harv={int(mh['harvested'].sum()):4d} "
              f"lharv={int(mh['line_harvested'].sum()):4d} "
              f"acc={int(mh['accepted'].sum()):4d} "
              f"lacc={int(mh['lines_accepted'].sum()):4d} "
              f"wacc={int(mh['wheel_accepted'].sum()):3d} "
              f"nan_cov={nan_cov} nan_p={nan_p} "
              f"({time.perf_counter() - wall0:6.1f}s)", flush=True)


if __name__ == "__main__":
    main()
