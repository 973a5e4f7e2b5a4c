"""Small-matrix linear algebra for the TPU f64 path (L0).

XLA on TPU implements Cholesky/QR/eigh/triangular_solve for f64 (emulated)
but NOT the LU custom-calls behind `jnp.linalg.solve` / `inv`.  The filter
core therefore uses:
  - closed-form (Cramer) batched 3x3 solves for triangulation,
  - Cholesky solves for PSD systems,
  - QR + triangular_solve for small general inverses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve3x3(A, b):
    """Batched Cramer's-rule solve for (...,3,3) @ x = (...,3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    # inverse = adj / det; adj = cofactor^T, cofactor rows are (c00,c01,c02)...
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) / det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) / det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def solve_psd(S, b):
    """Cholesky solve for symmetric PSD S (...,n,n), b (...,n) or (...,n,k)."""
    L = jnp.linalg.cholesky(S)
    squeeze = b.ndim == S.ndim - 1
    if squeeze:
        b = b[..., None]
    y = jax.lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if squeeze else x


def inv_small(A):
    """General small-matrix inverse via QR + triangular solve (no LU)."""
    n = A.shape[-1]
    Q, R = jnp.linalg.qr(A)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Rinv = jax.lax.linalg.triangular_solve(R, eye, left_side=True, lower=False)
    return Rinv @ jnp.swapaxes(Q, -1, -2)
