"""Fused Pallas gated-Gram kernel vs the XLA composition it replaces.

The kernel (ops/msckf_kernel.py) must reproduce, per feature:
nullspace projection (cam_helper._nullspace), whitened chi2 gating
(msckf_project_and_gate semantics), and the gated Gram accumulation that
measurement_compress would build from the accepted rows.  Run in interpret
mode on CPU; the compiled path is exercised on TPU by the benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops.chi2 import _TABLE as _CHI2_NP
from plviwo_tpu.ops.msckf_kernel import gram_gate_fused
from plviwo_tpu.update import cam_helper

F32 = jnp.float32


def _random_systems(rng, F, M, D, k, frac_valid=0.7, res_scale=1.0):
    Hx = rng.normal(size=(F, M, D)).astype(np.float32)
    Hf = rng.normal(size=(F, M, k)).astype(np.float32)
    r = (res_scale * rng.normal(size=(F, M))).astype(np.float32)
    rowmask = rng.uniform(size=(F, M)) < frac_valid
    # a couple of fully-masked and barely-valid features
    rowmask[0] = False
    rowmask[1] = np.arange(M) < (k + 1)  # below the k+2 row requirement
    A = rng.normal(size=(D, 2 * D)).astype(np.float32)
    cov = (A @ A.T / (2 * D) * 0.05).astype(np.float32)
    return (jnp.asarray(Hx), jnp.asarray(Hf), jnp.asarray(r),
            jnp.asarray(rowmask), jnp.asarray(cov))


def _reference(Hx, Hf, r, rowmask, cov, sigma, chi2_mult, cap):
    """XLA path: project+gate, then masked Gram over accepted features."""
    chi2_table = jnp.asarray(_CHI2_NP).astype(F32)
    s2 = jnp.full(r.shape, sigma**2, dtype=F32)  # per-row -> whitened output
    Hn, rn, rowvalid, ok = cam_helper.msckf_project_and_gate(
        Hx, Hf, r, rowmask, cov, s2, chi2_table, chi2_mult)
    m = (rowvalid & ok[:, None]).astype(F32)
    Hm = Hn * m[..., None]
    rm = rn * m
    G = jnp.einsum("fmd,fme->de", Hm, Hm)
    c = jnp.einsum("fmd,fm->d", Hm, rm)
    return G, c, ok


@pytest.mark.parametrize("k", [3, 4])
def test_kernel_matches_xla_path(k):
    rng = np.random.default_rng(0 if k == 3 else 1)
    F, M, D = 8, 12, 40
    sigma, chi2_mult = 1.3, 5.0
    Hx, Hf, r, rowmask, cov = _random_systems(rng, F, M, D, k)

    G0, c0, ok0 = _reference(Hx, Hf, r, rowmask, cov, sigma, chi2_mult,
                             cap=15.0)

    gate_vec = (jnp.asarray(_CHI2_NP[: M + 1]).astype(F32) * chi2_mult)
    w = jnp.full(r.shape, 1.0 / sigma, dtype=F32)
    G1, c1, ok1, chi = gram_gate_fused(Hx, Hf, r, rowmask, w, cov, gate_vec,
                                       15.0, interpret=True)

    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok0))
    sc = float(jnp.max(jnp.abs(G0))) + 1e-9
    np.testing.assert_allclose(np.asarray(G1), np.asarray(G0),
                               atol=2e-5 * sc, rtol=2e-4)
    sc_c = float(jnp.max(jnp.abs(c0))) + 1e-9
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               atol=2e-5 * sc_c, rtol=2e-4)


def test_kernel_gate_behaviour():
    """Huge residuals must be rejected; consistent ones accepted."""
    rng = np.random.default_rng(3)
    F, M, D, k = 6, 10, 24, 3
    Hx, Hf, r, rowmask, cov = _random_systems(rng, F, M, D, k,
                                              frac_valid=1.0, res_scale=0.3)
    rowmask = jnp.ones((F, M), dtype=bool)
    r = r.at[2].set(200.0)  # blown residual -> raw-residual cap rejects
    gate_vec = jnp.asarray(_CHI2_NP[: M + 1]).astype(F32) * 1e6  # chi2 open
    w = jnp.ones((F, M), dtype=F32)
    G, c, ok, chi = gram_gate_fused(Hx, Hf, r, rowmask, w, cov, gate_vec,
                                    50.0, interpret=True)
    ok = np.asarray(ok)
    assert not ok[2]
    assert ok[[0, 1, 3, 4, 5]].all()
    # Gram PSD and nonzero
    eig = np.linalg.eigvalsh(np.asarray(G, dtype=np.float64))
    assert eig.min() > -1e-3
    assert eig.max() > 0


def test_nullspace_zero_pivot():
    """A masked (zero) row in pivot position must not break the projection:
    the reflected Hf must vanish on the complement rows (the round-2 bug:
    sign(0)=0 gave alpha=0 and leaked feature-Jacobian content)."""
    rng = np.random.default_rng(7)
    M, D, k = 10, 16, 3
    mask = np.ones(M, dtype=bool)
    mask[1] = False  # pivot row 1 masked -> x[1] == 0
    Hf = jnp.asarray(rng.normal(size=(M, k)) * mask[:, None])
    Hx = jnp.asarray(rng.normal(size=(M, D)) * mask[:, None])
    r = jnp.asarray(rng.normal(size=M) * mask)
    Hx2, r2, valid = cam_helper._nullspace(Hf, Hx, r)
    # the complement rows must be orthogonal to col(Hf): route a feature
    # perturbation through Hf and require the projected rows to vanish
    y = jnp.asarray(rng.normal(size=k))
    Hfy2, _, _ = cam_helper._nullspace(Hf, Hf @ y[:, None] @ jnp.ones((1, D)), r)
    leak = jnp.max(jnp.abs(Hfy2 * valid[:, None].astype(Hfy2.dtype)))
    assert float(leak) < 1e-10, float(leak)


def test_fused_step_pallas_matches_xla():
    """fused_step_full with use_pallas must match the XLA path on the graft
    example (small shapes, interpret mode): same accepted counts, same
    post-update state to mixed-precision tolerance."""
    from __graft_entry__ import SIGMA_LINE, WHEEL_NOISE, _example_inputs_full
    from plviwo_tpu.core.step import fused_step_full

    args = _example_inputs_full(n_clones=8, F=6, O=5, imu_n=8, L=3,
                                n_wheel=8)
    (state, imu_t, imu_w, imu_a, t_new, obs_uv, obs_uvn, obs_slot, obs_valid,
     line_uv, line_uvn, line_slot, line_valid, wt, wm1, wm2, wvalid,
     gravity, sigmas, sigma_pix, chi2_mult) = args

    def run(**kw):
        return fused_step_full(
            state, imu_t, imu_w, imu_a, t_new,
            obs_uv, obs_uvn, obs_slot, obs_valid,
            line_uv, line_uvn, line_slot, line_valid,
            wt, wm1, wm2, wvalid,
            gravity, sigmas, sigma_pix, chi2_mult, SIGMA_LINE, WHEEL_NOISE,
            model=0, window_size=1.0, cam_dtype=jnp.float32, **kw)

    s0, m0 = run()
    s1, m1 = run(use_pallas=True, pallas_interpret=True)
    assert int(m0["accepted"]) == int(m1["accepted"]) > 0
    assert int(m0["lines_accepted"]) == int(m1["lines_accepted"]) > 0
    assert int(m0["wheel_accepted"]) == int(m1["wheel_accepted"]) == 1
    dp = float(jnp.max(jnp.abs(s0.p - s1.p)))
    dcov = float(jnp.max(jnp.abs(s0.cov - s1.cov)))
    sc = float(jnp.max(jnp.abs(s0.cov)))
    assert dp < 1e-5, dp
    assert dcov < 1e-4 * sc, (dcov, sc)


def test_vmap_batched_kernel():
    """vmap of gram_gate_fused (the bench/replay batching mode) must equal
    per-sequence calls.  x64 is enabled session-wide in conftest, so this
    also guards the x64 trace-level regressions (i64 fori_loop indices,
    weak-f64 where literals, i64 index-map constants) that broke the Mosaic
    lowering even though they are masked by interpret mode."""
    rng = np.random.default_rng(3)
    B, F, M, D, k = 3, 4, 10, 24, 3
    batches = [_random_systems(rng, F, M, D, k) for _ in range(B)]
    stacked = [jnp.stack([b[i] for b in batches]) for i in range(5)]
    gate_vec = jnp.asarray(_CHI2_NP[: M + 1]).astype(F32)
    w = jnp.full((B, F, M), 2.0, F32)

    out_v = jax.vmap(
        lambda hx, hf, rr, mm, ww, cc: gram_gate_fused(
            hx, hf, rr, mm, ww, cc, gate_vec, 1e9, interpret=True)
    )(stacked[0], stacked[1], stacked[2], stacked[3], w, stacked[4])
    for b, (Hx, Hf, r, rowmask, cov) in enumerate(batches):
        out_1 = gram_gate_fused(Hx, Hf, r, rowmask, w[b], cov, gate_vec,
                                1e9, interpret=True)
        for a, bb in zip(out_v, out_1):
            np.testing.assert_allclose(np.asarray(a[b], np.float64),
                                       np.asarray(bb, np.float64),
                                       rtol=0, atol=1e-5)
