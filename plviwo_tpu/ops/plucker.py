"""Plücker line algebra (L0).

Substrate for the line subsystem (reference: `LineHelper` Plücker transforms
G->I->C LineHelper.cpp:846-857, line-projection matrix :862-864, orthonormal
4-param conversions :684-731).  Conventions used throughout this framework
(cleaner than the reference's mixed head/tail ordering):

    line L = (n, v): v = direction (unit-ish), n = p x v  (moment), p any
    point on the line.  Distance of the line from origin = |n|/|v|.

All ops are batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie


def transform(n_G, v_G, R_GtoC, p_CinG):
    """Transform a Plücker line from world to a frame at (R_GtoC, p_CinG).

    n_C = R_GtoC (n_G - p_CinG x v_G);  v_C = R_GtoC v_G.
    """
    n_local = n_G - jnp.cross(p_CinG, v_G)
    n_C = jnp.einsum("...ij,...j->...i", R_GtoC, n_local)
    v_C = jnp.einsum("...ij,...j->...i", R_GtoC, v_G)
    return n_C, v_C


def line_projection_matrix(k):
    """K_L (3,3): maps the camera-frame moment n_C to the homogeneous image
    line in *pixel* coordinates (reference LineHelper.cpp:862-864).

    k = [fx fy cx cy ...].
    """
    fx, fy, cx, cy = k[..., 0], k[..., 1], k[..., 2], k[..., 3]
    z = jnp.zeros_like(fx)
    return jnp.stack(
        [
            jnp.stack([fy, z, z], -1),
            jnp.stack([z, fx, z], -1),
            jnp.stack([-fy * cx, -fx * cy, fx * fy], -1),
        ],
        -2,
    )


def project(n_C, k):
    """Project the camera-frame line to pixel homogeneous line l (...,3)."""
    KL = line_projection_matrix(k)
    return jnp.einsum("...ij,...j->...i", KL, n_C)


def point_line_distance(uv, l):
    """Signed distance of pixel point uv (...,2) from homogeneous line l (...,3)."""
    denom = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2)
    denom = jnp.where(denom < 1e-12, 1.0, denom)
    return (l[..., 0] * uv[..., 0] + l[..., 1] * uv[..., 1] + l[..., 2]) / denom


def to_orthonormal(n, v):
    """Plücker (n, v) -> orthonormal (U (3,3), w (2,)) representation.

    U = [n/|n|, v/|v|, n x v/|n x v|];  w = (|n|, |v|)/sqrt(|n|^2+|v|^2).
    """
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    u1 = n / jnp.maximum(nn, 1e-12)
    u2 = v / jnp.maximum(nv, 1e-12)
    u3 = jnp.cross(u1, u2)
    u3 = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True), 1e-12)
    U = jnp.stack([u1, u2, u3], axis=-1)
    scale = jnp.sqrt(nn**2 + nv**2)
    w = jnp.concatenate([nn, nv], axis=-1) / jnp.maximum(scale, 1e-12)
    return U, w


def from_orthonormal(U, w, scale=1.0):
    """Inverse of to_orthonormal up to overall scale (lines are projective)."""
    n = scale * w[..., 0:1] * U[..., :, 0]
    v = scale * w[..., 1:2] * U[..., :, 1]
    return n, v


def apply_orthonormal_delta(n, v, d4):
    """Apply a 4-dof orthonormal-representation update d4 = [dtheta(3), dphi].

    U' = U exp_so3(dtheta); w' = rot(dphi) w.  The overall scale |(n, v)| is
    preserved (it is unobservable).
    """
    U, w = to_orthonormal(n, v)
    mag = jnp.sqrt(
        jnp.sum(n * n, axis=-1, keepdims=True) + jnp.sum(v * v, axis=-1, keepdims=True)
    )
    U2 = U @ lie.exp_so3(d4[..., 0:3])
    c, s = jnp.cos(d4[..., 3:4]), jnp.sin(d4[..., 3:4])
    w1 = c * w[..., 0:1] - s * w[..., 1:2]
    w2 = s * w[..., 0:1] + c * w[..., 1:2]
    n2 = mag * w1 * U2[..., :, 0]
    v2 = mag * w2 * U2[..., :, 1]
    return n2, v2


def closest_point_to_origin(n, v):
    """Point on the line closest to the origin: p = v x n / |v|^2."""
    v2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return jnp.cross(v, n) / jnp.maximum(v2, 1e-12)
