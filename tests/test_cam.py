"""Camera model tests: distort/undistort roundtrip, Jacobians vs finite diff."""

import jax
import jax.numpy as jnp
import numpy as np

from plviwo_tpu.ops import cam

K_RADTAN = jnp.array([458.0, 457.0, 367.0, 248.0, -0.28, 0.07, 1e-4, -2e-5], dtype=jnp.float64)
K_EQUI = jnp.array([380.0, 379.0, 370.0, 250.0, -0.01, 0.02, -0.005, 0.001], dtype=jnp.float64)


def _grid_zn(n=16, lim=0.45):
    xs = np.linspace(-lim, lim, n)
    g = np.stack(np.meshgrid(xs, xs), axis=-1).reshape(-1, 2)
    return jnp.asarray(g)


class TestRadtan:
    def test_roundtrip(self):
        zn = _grid_zn()
        uv = cam.distort_radtan(zn, K_RADTAN)
        zn2 = cam.undistort_radtan(uv, K_RADTAN)
        np.testing.assert_allclose(zn2, zn, atol=1e-10)

    def test_pinhole_center(self):
        uv = cam.distort_radtan(jnp.zeros(2, dtype=jnp.float64), K_RADTAN)
        np.testing.assert_allclose(uv, [367.0, 248.0], atol=1e-12)

    def test_jacobian_fd(self):
        zn = jnp.array([[0.12, -0.2], [0.3, 0.1]], dtype=jnp.float64)
        Jz, Jk = cam.distort_jacobian(zn, K_RADTAN, cam.RADTAN)
        eps = 1e-7
        for i in range(2):
            dz = jnp.zeros(2, dtype=jnp.float64).at[i].set(eps)
            fd = (cam.distort_radtan(zn + dz, K_RADTAN) - cam.distort_radtan(zn - dz, K_RADTAN)) / (2 * eps)
            np.testing.assert_allclose(Jz[..., i], fd, rtol=1e-6, atol=1e-6)
        for i in range(8):
            dk = jnp.zeros(8, dtype=jnp.float64).at[i].set(eps)
            fd = (cam.distort_radtan(zn, K_RADTAN + dk) - cam.distort_radtan(zn, K_RADTAN - dk)) / (2 * eps)
            np.testing.assert_allclose(Jk[..., i], fd, rtol=1e-6, atol=1e-6)


class TestEqui:
    def test_roundtrip(self):
        zn = _grid_zn()
        uv = cam.distort_equi(zn, K_EQUI)
        zn2 = cam.undistort_equi(uv, K_EQUI)
        np.testing.assert_allclose(zn2, zn, atol=1e-10)

    def test_jacobian_fd(self):
        zn = jnp.array([[0.12, -0.2]], dtype=jnp.float64)
        Jz, _ = cam.distort_jacobian(zn, K_EQUI, cam.EQUI)
        eps = 1e-7
        for i in range(2):
            dz = jnp.zeros(2, dtype=jnp.float64).at[i].set(eps)
            fd = (cam.distort_equi(zn + dz, K_EQUI) - cam.distort_equi(zn - dz, K_EQUI)) / (2 * eps)
            np.testing.assert_allclose(Jz[..., i], fd, rtol=1e-6, atol=1e-6)


def test_undistort_line():
    seg = jnp.array([100.0, 120.0, 400.0, 300.0], dtype=jnp.float64)
    out = cam.undistort_line(seg, K_RADTAN, cam.RADTAN)
    assert out.shape == (4,)
    uv1 = cam.distort_radtan(out[:2], K_RADTAN)
    np.testing.assert_allclose(uv1, seg[:2], atol=1e-8)


def test_project():
    p_C = jnp.array([[0.5, -0.3, 2.0]], dtype=jnp.float64)
    uv = cam.project(p_C, K_RADTAN, cam.RADTAN)
    zn = cam.undistort_radtan(uv, K_RADTAN)
    np.testing.assert_allclose(zn[0], p_C[0, :2] / p_C[0, 2], atol=1e-10)


def test_chi2_table():
    from plviwo_tpu.ops.chi2 import chi2_quantile_095
    # golden values (scipy.stats.chi2.ppf(0.95, dof))
    np.testing.assert_allclose(float(chi2_quantile_095(1)), 3.8414588, rtol=1e-6)
    np.testing.assert_allclose(float(chi2_quantile_095(10)), 18.3070381, rtol=1e-6)
    vals = chi2_quantile_095(jnp.array([2, 5, 100]))
    np.testing.assert_allclose(vals, [5.9914645, 11.0704977, 124.3421134], rtol=1e-6)
