"""Pallas LK kernel vs the XLA shifted-MAC formulation: same math, same
results (ops/lk_kernel.pyramidal_lk_pallas vs ops/klt.pyramidal_lk_conv).
Runs in interpreter mode on CPU; the chip A/B lives in
tools/ab_lk_kernel.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plviwo_tpu.ops import image as image_ops
from plviwo_tpu.ops import klt as klt_ops
from plviwo_tpu.ops.lk_kernel import pyramidal_lk_pallas


def _scene(seed, H=240, W=320, n=64, shift=(2.3, -1.4)):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, size=(H + 8, W + 8)).astype(np.float32)
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d

    base = convolve2d(base, k, mode="same")
    img0 = base[4 : 4 + H, 4 : 4 + W]
    dx, dy = shift
    ix, fx = int(np.floor(dx)), dx - np.floor(dx)
    iy, fy = int(np.floor(dy)), dy - np.floor(dy)
    sub = base[4 + iy : 5 + iy + H, 4 + ix : 5 + ix + W]
    img1 = ((1 - fy) * (1 - fx) * sub[:-1, :-1] + (1 - fy) * fx * sub[:-1, 1:]
            + fy * (1 - fx) * sub[1:, :-1] + fy * fx * sub[1:, 1:])
    uv = np.stack([rng.uniform(30, W - 30, n), rng.uniform(30, H - 30, n)],
                  -1).astype(np.float32)
    return (jnp.asarray(img0.astype(np.float32)),
            jnp.asarray(img1[:H, :W].astype(np.float32)), jnp.asarray(uv))


class TestLkKernelEquivalence:
    def test_matches_conv_formulation(self):
        img0, img1, uv = _scene(0)
        pyr0 = tuple(image_ops.build_pyramid(img0, 3))
        pyr1 = tuple(image_ops.build_pyramid(img1, 3))
        valid = jnp.ones(uv.shape[0], bool)
        uv_c, ok_c = klt_ops.pyramidal_lk_conv(pyr0, pyr1, uv, valid, 3)
        uv_p, ok_p = pyramidal_lk_pallas(pyr0, pyr1, uv, valid, 3,
                                         interpret=True)
        okb = np.asarray(ok_c) & np.asarray(ok_p)
        assert okb.sum() >= uv.shape[0] * 0.8
        d = np.linalg.norm(np.asarray(uv_c - uv_p), axis=1)[okb]
        assert float(np.median(d)) < 1e-3, float(np.median(d))
        assert float(d.max()) < 0.05, float(d.max())
        # both recover the true shift
        flow = np.asarray(uv_p - uv)[np.asarray(ok_p)]
        np.testing.assert_allclose(np.median(flow, axis=0), [-2.3, 1.4],
                                   atol=0.1)

    def test_vmap_over_sequences(self):
        """The bench vmaps fused_frame over B sequences; the kernel must
        batch."""
        scenes = [_scene(s, shift=(1.0 + s, -0.5 * s)) for s in range(3)]
        p0 = jnp.stack([jnp.stack(image_ops.build_pyramid(s[0], 1))[0]
                        for s in scenes])
        p1 = jnp.stack([jnp.stack(image_ops.build_pyramid(s[1], 1))[0]
                        for s in scenes])
        uv = jnp.stack([s[2] for s in scenes])
        valid = jnp.ones(uv.shape[:2], bool)

        def one(i0, i1, u, v):
            return pyramidal_lk_pallas((i0,), (i1,), u, v, 1, drift=5,
                                       interpret=True)

        uv_b, ok_b = jax.vmap(one)(p0, p1, uv, valid)
        for s in range(3):
            flow = np.asarray(uv_b[s] - uv[s])[np.asarray(ok_b[s])]
            assert len(flow) >= 32
            np.testing.assert_allclose(
                np.median(flow, axis=0), [-(1.0 + s), 0.5 * s], atol=0.15)

    def test_nonmultiple_of_128_padding(self):
        img0, img1, uv = _scene(2, n=100)
        pyr0 = tuple(image_ops.build_pyramid(img0, 2))
        pyr1 = tuple(image_ops.build_pyramid(img1, 2))
        valid = jnp.ones(100, bool)
        uv_p, ok_p = pyramidal_lk_pallas(pyr0, pyr1, uv, valid, 2,
                                         interpret=True)
        assert uv_p.shape == (100, 2)
        assert int(ok_p.sum()) >= 70
