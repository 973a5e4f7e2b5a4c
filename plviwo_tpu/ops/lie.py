"""SO(3)/SE(3) and JPL-quaternion operations (L0 substrate).

Behavioral parity with the reference's `open_vins/ov_core/src/utils/quat_ops.h`
(JPL convention: q = [x y z w], scalar last, R(q1 (x) q2) = R(q1) R(q2), and
`quat_2_Rot(q_GtoI) = R_GtoI`), re-derived from the JPL/Trawny definitions and
written as batched, jit-friendly jnp functions: every op accepts arbitrary
leading batch dimensions and is branch-free (safe small-angle limits via
`jnp.where` guards so gradients never see NaN).

The filter core calls these in float64; nothing here assumes a dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def skew(v):
    """Skew-symmetric matrix of v (...,3) -> (...,3,3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(m):
    """Inverse of skew: (...,3,3) -> (...,3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def quat_norm(q):
    """Normalize quaternion, enforcing w >= 0 (JPL sign convention)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_identity(dtype=jnp.float64):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_multiply(q, p):
    """JPL quaternion product q (x) p with R(q (x) p) = R(q) R(p).

    q, p: (...,4) [x y z w].
    """
    qv, qw = q[..., :3], q[..., 3:4]
    pv, pw = p[..., :3], p[..., 3:4]
    # JPL: (q (x) p)_v = q_w p_v + p_w q_v - q_v x p_v ; scalar = q_w p_w - q_v . p_v
    v = qw * pv + pw * qv - jnp.cross(qv, pv)
    w = qw * pw - jnp.sum(qv * pv, axis=-1, keepdims=True)
    return quat_norm(jnp.concatenate([v, w], axis=-1))


def quat_inv(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_2_rot(q):
    """JPL quaternion (...,4) -> rotation matrix (...,3,3).

    R = (2w^2 - 1) I - 2 w [qv]_x + 2 qv qv^T   (Trawny eq. 78).
    For q = q_GtoI this returns R_GtoI.
    """
    qv = q[..., :3]
    w = q[..., 3]
    eye = jnp.eye(3, dtype=q.dtype)
    eye = jnp.broadcast_to(eye, q.shape[:-1] + (3, 3))
    outer = qv[..., :, None] * qv[..., None, :]
    return (
        (2.0 * w**2 - 1.0)[..., None, None] * eye
        - 2.0 * w[..., None, None] * skew(qv)
        + 2.0 * outer
    )


def rot_2_quat(R):
    """Rotation matrix (...,3,3) -> JPL quaternion (...,4), branch-free Shepperd."""
    # Four candidate constructions, each stable in a different region.
    t = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]

    # candidate from trace
    sw = jnp.sqrt(jnp.maximum(1.0 + t, _EPS))
    qw_w = 0.5 * sw
    inv = 0.5 / sw
    cw = jnp.stack(
        [
            (R[..., 1, 2] - R[..., 2, 1]) * inv,
            (R[..., 2, 0] - R[..., 0, 2]) * inv,
            (R[..., 0, 1] - R[..., 1, 0]) * inv,
            qw_w,
        ],
        axis=-1,
    )

    def axis_candidate(i, j, k):
        s = jnp.sqrt(jnp.maximum(1.0 + R[..., i, i] - R[..., j, j] - R[..., k, k], _EPS))
        qi = 0.5 * s
        invs = 0.5 / s
        comp = [None, None, None, None]
        comp[i] = qi
        comp[j] = (R[..., i, j] + R[..., j, i]) * invs
        comp[k] = (R[..., i, k] + R[..., k, i]) * invs
        comp[3] = (R[..., j, k] - R[..., k, j]) * invs
        return jnp.stack(comp, axis=-1)

    c0 = axis_candidate(0, 1, 2)
    c1 = axis_candidate(1, 2, 0)
    c2 = axis_candidate(2, 0, 1)

    # pick the most stable candidate
    scores = jnp.stack([t, r00, r11, r22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cw, c0, c1, c2], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_norm(q)


def omega(w):
    """Omega(w) (...,3) -> (...,4,4) such that q_dot = 0.5 Omega(w) q (JPL)."""
    sk = skew(w)
    top = jnp.concatenate([-sk, w[..., :, None]], axis=-1)  # (...,3,4)
    bot = jnp.concatenate([-w[..., None, :], jnp.zeros_like(w[..., :1, None])], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _theta2_safe(w):
    """(th2, th_safe, small): squared angle (differentiable everywhere), a
    clamped-safe angle for use in trig denominators, and the small-angle mask.

    norm(w) has a NaN gradient at w = 0; everything downstream must branch on
    th2 = sum(w^2) (a polynomial) and only evaluate trig at th_safe, which is
    clamped away from zero so both `jnp.where` branches stay NaN-free under
    autodiff (the spline simulator jacfwd's through these ops).
    """
    th2 = jnp.sum(w * w, axis=-1)
    small = th2 < 1e-14
    th_safe = jnp.sqrt(jnp.where(small, 1.0, th2))
    return th2, th_safe, small


def _cancel_cut(dtype):
    """Taylor-branch cutoff on th^2 for coefficients that form a catastrophic
    cancellation in their closed form ((th - sin th)/th^3 and relatives).

    In f32 the closed forms lose most of their bits well beyond the tiny
    NaN-safety cutoff (1 - cos th flushes near ulp(1) for th ~ 1e-4), so the
    Taylor branch must extend to th ~ 0.3 where a 3-term series is still
    accurate to ~1e-8 relative.  In f64 a th ~ 1e-3 cutoff keeps both branches
    below 1e-9 relative error."""
    return 0.09 if jnp.finfo(dtype).eps > 1e-10 else 1e-6


def exp_so3(w):
    """so(3) exponential: (...,3) -> (...,3,3), branch-free small-angle safe.

    The Taylor branches extend to `_cancel_cut` (NOT just the th ~ 1e-7
    NaN-safety clamp): second-order jacfwd of sin(th)/th-class ratios emits
    NaN in a band just above a narrow cutoff (measured th in [1.1e-7, 4.7e-7]
    at f64 — the round-3 images-in bench NaN'd through exactly this, via the
    B-spline simulator's jacfwd^2 acceleration).  A 3-term polynomial branch
    is exact under autodiff and accurate to ~1e-15 (f64, th < 1e-3) /
    ~1e-7 (f32, th < 0.3) relative."""
    th2, th, small = _theta2_safe(w)
    smallc = th2 < _cancel_cut(w.dtype)
    a = jnp.where(smallc, 1.0 - th2 / 6.0 + th2 * th2 / 120.0,
                  jnp.sin(th) / th)
    s2 = jnp.sin(th / 2.0)
    b = jnp.where(smallc, 0.5 - th2 / 24.0 + th2 * th2 / 720.0,
                  2.0 * s2 * s2 / (th * th))
    sk = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), sk.shape)
    return eye + a[..., None, None] * sk + b[..., None, None] * (sk @ sk)


def log_so3(R):
    """SO(3) matrix log: (...,3,3) -> (...,3), standard active convention
    (log_so3(exp_so3(w)) == w). Computed via the JPL quaternion for stability
    near theta = pi; the JPL map quat_2_rot is the frame (inverse) rotation, so
    the quaternion log carries a sign flip that we undo here.
    """
    q = rot_2_quat(R)
    qv = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    n2 = jnp.sum(qv * qv, axis=-1)
    small = n2 < 1e-18
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    th = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), th / n)
    return -qv * scale[..., None]


def jl_so3(w):
    """Left Jacobian of SO(3)."""
    th2, th, small = _theta2_safe(w)
    sk = skew(w)
    s2 = jnp.sin(th / 2.0)
    # wide Taylor branch: see exp_so3 (second-order autodiff NaN band just
    # above a narrow cutoff)
    smalla = th2 < _cancel_cut(w.dtype)
    a = jnp.where(smalla, 0.5 - th2 / 24.0 + th2 * th2 / 720.0,
                  2.0 * s2 * s2 / (th * th))
    smallb = th2 < _cancel_cut(w.dtype)
    b = jnp.where(
        smallb, 1.0 / 6.0 - th2 / 120.0 + th2 * th2 / 5040.0,
        (th - jnp.sin(th)) / (th * th * th),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), sk.shape)
    return eye + a[..., None, None] * sk + b[..., None, None] * (sk @ sk)


def jr_so3(w):
    """Right Jacobian of SO(3): Jr(w) = Jl(-w)."""
    return jl_so3(-w)


def gamma2_so3(w):
    """Second-order SO(3) integral Gamma2(u) = int_0^1 int_0^s exp(u^ t) dt ds
    = 1/2 I + ((th - sin th)/th^3) u^ + ((th^2/2 + cos th - 1)/th^4) u^^2.

    With u = omega*dt:  int_0^dt int_0^s exp(skew(omega) tau) dtau ds
    = dt^2 Gamma2(u) — the closed-form double integral CpiV2-style exact
    preintegration needs (reference: ov_core CpiV2's analytic position
    integrals, cpi/CpiV2.cpp)."""
    th2, th, small = _theta2_safe(w)
    sk = skew(w)
    smallc = th2 < _cancel_cut(w.dtype)
    a = jnp.where(smallc, 1.0 / 6.0 - th2 / 120.0 + th2 * th2 / 5040.0,
                  (th - jnp.sin(th)) / (th * th * th))
    s2 = jnp.sin(th / 2.0)
    b = jnp.where(smallc, 1.0 / 24.0 - th2 / 720.0 + th2 * th2 / 40320.0,
                  (th * th / 2.0 - 2.0 * s2 * s2) / (th2 * th2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), sk.shape)
    return 0.5 * eye + a[..., None, None] * sk + b[..., None, None] * (sk @ sk)


def jl_so3_inv(w):
    """Inverse left Jacobian of SO(3)."""
    th2, th, small = _theta2_safe(w)
    sk = skew(w)
    half = th / 2.0
    cot = half / jnp.tan(half)
    smallb = th2 < _cancel_cut(w.dtype)
    b = jnp.where(
        smallb,
        1.0 / 12.0 + th2 / 720.0 + th2 * th2 / 30240.0,
        (1.0 - cot) / (th * th),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), sk.shape)
    return eye - 0.5 * sk + b[..., None, None] * (sk @ sk)


def jr_so3_inv(w):
    return jl_so3_inv(-w)


def exp_se3(xi):
    """se(3) exp: xi = [omega, rho] (...,6) -> (...,4,4)."""
    w, rho = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    p = (jl_so3(w) @ rho[..., :, None])[..., 0]
    top = jnp.concatenate([R, p[..., :, None]], axis=-1)
    bshape = xi.shape[:-1] + (1, 4)
    bot = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), bshape)
    return jnp.concatenate([top, bot], axis=-2)


def log_se3(T):
    """SE(3) log: (...,4,4) -> (...,6) [omega, rho]."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    w = log_so3(R)
    rho = (jl_so3_inv(w) @ p[..., :, None])[..., 0]
    return jnp.concatenate([w, rho], axis=-1)


def hat_se3(xi):
    """se(3) hat: (...,6) -> (...,4,4)."""
    w, rho = xi[..., :3], xi[..., 3:]
    top = jnp.concatenate([skew(w), rho[..., :, None]], axis=-1)
    bot = jnp.zeros(xi.shape[:-1] + (1, 4), dtype=xi.dtype)
    return jnp.concatenate([top, bot], axis=-2)


def inv_se3(T):
    """SE(3) inverse (...,4,4)."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    pi = -(Rt @ p[..., :, None])
    top = jnp.concatenate([Rt, pi], axis=-1)
    bshape = T.shape[:-2] + (1, 4)
    bot = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), bshape)
    return jnp.concatenate([top, bot], axis=-2)


def rot_x(t):
    """Active rotation about x by t (matches reference quat_ops rot_x)."""
    t = jnp.asarray(t)
    c, s = jnp.cos(t), jnp.sin(t)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rot_y(t):
    """Active rotation about y by t."""
    t = jnp.asarray(t)
    c, s = jnp.cos(t), jnp.sin(t)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rot_z(t):
    """Active rotation about z by t."""
    t = jnp.asarray(t)
    c, s = jnp.cos(t), jnp.sin(t)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def rot_2_rpy(R):
    """Rotation (...,3,3) -> roll/pitch/yaw with R = Rz(y) Ry(p) Rx(r) acting as
    in the reference convention (rot2rpy: R = rot_z(yaw)*rot_y(pitch)*rot_x(roll))."""
    pitch = jnp.arctan2(-R[..., 2, 0], jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2))
    roll = jnp.arctan2(R[..., 2, 1] / jnp.cos(pitch), R[..., 2, 2] / jnp.cos(pitch))
    yaw = jnp.arctan2(R[..., 1, 0] / jnp.cos(pitch), R[..., 0, 0] / jnp.cos(pitch))
    return jnp.stack([roll, pitch, yaw], axis=-1)
