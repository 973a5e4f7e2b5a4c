"""Image-processing substrate for the visual front-end (L0/L1).

Replaces the OpenCV primitives of the reference tracker
(`ov_core/src/track/TrackKLT.cpp:48-76`: histogram equalization +
`buildOpticalFlowPyramid`) with XLA-native batched ops: separable Gaussian
blur + decimation for the pyramid (convolutions ride the MXU), Scharr
gradients, and a fixed-bin histogram equalization.

Images are (H, W) float32 in [0, 1].  All functions jit/vmap cleanly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

F32 = jnp.float32


def _sep_conv(img, kx, ky):
    """Separable 2-D convolution with 'same' padding via depthwise conv."""
    x = img[None, None, :, :]  # NCHW
    kx = kx.reshape(1, 1, 1, -1).astype(img.dtype)
    ky = ky.reshape(1, 1, -1, 1).astype(img.dtype)
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME")
    return x[0, 0]


GAUSS5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def gauss_blur(img):
    return _sep_conv(img, GAUSS5, GAUSS5)


def pyr_down(img):
    """Blur + decimate by 2 (cv::pyrDown equivalent)."""
    return gauss_blur(img)[::2, ::2]


def build_pyramid(img, levels: int):
    """List of `levels` images, level 0 = input."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


SCHARR_D = jnp.array([-1.0, 0.0, 1.0]) / 2.0
SCHARR_S = jnp.array([3.0, 10.0, 3.0]) / 16.0


def gradients(img):
    """(gx, gy) Scharr-style gradients."""
    gx = _sep_conv(img, SCHARR_D, SCHARR_S)
    gy = _sep_conv(img, SCHARR_S, SCHARR_D)
    return gx, gy


@partial(jax.jit, static_argnames=("bins",))
def hist_equalize(img, bins: int = 256):
    """Global histogram equalization (the reference uses cv::equalizeHist /
    CLAHE; a global equalize is sufficient for tracking normalization)."""
    flat = jnp.clip(img.reshape(-1), 0.0, 1.0)
    hist = jnp.histogram(flat, bins=bins, range=(0.0, 1.0))[0]
    cdf = jnp.cumsum(hist).astype(F32)
    cdf = cdf / cdf[-1]
    idx = jnp.clip((flat * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    return cdf[idx].reshape(img.shape)


@partial(jax.jit, static_argnames=("knots",))
def hist_equalize_quantile(img, knots: int = 17):
    """Gather-free histogram equalization: piecewise-linear CDF through
    `knots` quantiles, applied as shifted clamp-accumulates.

    `hist_equalize` costs a 256-bin scatter-add + a full-image LUT gather —
    both scalar-unit paths on TPU (measured 28 ms/frame at 640x480, the
    single largest cost of the images-in step).  The equalized output only
    normalizes contrast for tracking, so a 16-segment linear CDF is
    functionally equivalent:  out(p) = cdf(p) ~= (1/(K-1)) * sum_k
    clamp01((p - q_k)/(q_{k+1} - q_k)) — one sort for the quantiles, then
    pure VPU arithmetic on the image."""
    flat = img.reshape(-1)
    qs = jnp.quantile(flat, jnp.linspace(0.0, 1.0, knots))
    # monotonicity guard for flat regions (equal quantiles)
    denom = jnp.maximum(qs[1:] - qs[:-1], 1e-6)
    out = jnp.zeros_like(img)
    for k in range(knots - 1):
        out = out + jnp.clip((img - qs[k]) / denom[k], 0.0, 1.0)
    return out * (1.0 / (knots - 1))


def shi_tomasi_score(img, window: int = 3):
    """Min-eigenvalue corner response (the KLT detector's native score).

    The reference detects with grid-bucketed FAST (Grider_GRID); FAST's
    circle-of-16 branch pattern is hostile to vector units, while the
    Shi-Tomasi structure tensor is three convolutions + an eigenvalue formula
    — the TPU-idiomatic equivalent with the same role (corner strength for
    grid top-off detection).
    """
    gx, gy = gradients(img)
    k = jnp.ones(window) / window
    gxx = _sep_conv(gx * gx, k, k)
    gyy = _sep_conv(gy * gy, k, k)
    gxy = _sep_conv(gx * gy, k, k)
    tr = gxx + gyy
    det = gxx * gyy - gxy * gxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc  # lambda_min


def bilinear_sample(img, xy):
    """Bilinear sampling at subpixel coords xy (...,2) = (x, y) -> (...,).

    Out-of-bounds clamps to the border (callers mask separately).
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )
