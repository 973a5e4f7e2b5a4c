"""Point-line-coupled (PLC) rows of the line update.

Reference: the `use_PLC` block of LineHelper::get_line_feature_jacobian_full
(LineHelper.cpp:879-890) — one extra residual row per attached point: the
distance of the point's *measured* pixel from the projected line.  The
reference ships the flag disabled (UpdaterCamera PLC=false); here it is
CameraOptions.use_plc, default False, and these tests validate the rows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from plviwo_tpu.ops import lie, plucker
from plviwo_tpu.update import lines as line_up

CAM_K = jnp.asarray([400.0, 400.0, 320.0, 240.0, 0, 0, 0, 0])
QI = jnp.asarray([0.0, 0.0, 0.0, 1.0])
Z3 = jnp.zeros(3)


def _project(p_G, q_clone, p_clone):
    """Pixel projection of a world point through the identity camera."""
    R = lie.quat_2_rot(q_clone)
    pc = R @ (p_G - p_clone)
    k = np.asarray(CAM_K)
    return np.asarray([k[0] * pc[0] / pc[2] + k[2], k[1] * pc[1] / pc[2] + k[3]])


def _scene(n_obs=3):
    """A world line observed from n_obs poses; returns padded batch arrays."""
    p0 = np.array([1.0, 0.0, 2.0])
    v = np.array([0.0, 1.0, 0.0])
    n = np.cross(p0, v)
    rng = np.random.default_rng(0)

    O = n_obs
    seg_uv = np.zeros((O, 4))
    plc_uv = np.zeros((O, 2, 2))
    obs_q = np.tile([0.0, 0, 0, 1], (O, 1))
    obs_p = np.zeros((O, 3))
    for j in range(O):
        # small baseline so every view sees the line
        obs_p[j] = [0.15 * j, 0.1 * j, -0.2 * j]
        th = 0.05 * j
        obs_q[j] = [0, np.sin(th / 2), 0, np.cos(th / 2)]
        q = jnp.asarray(obs_q[j])
        pe1 = _project(p0 - 0.5 * v, q, jnp.asarray(obs_p[j]))
        pe2 = _project(p0 + 0.5 * v, q, jnp.asarray(obs_p[j]))
        seg_uv[j] = np.concatenate([pe1, pe2])
        plc_uv[j, 0] = _project(p0 + 0.2 * v, q, jnp.asarray(obs_p[j]))
        plc_uv[j, 1] = _project(p0 - 0.3 * v, q, jnp.asarray(obs_p[j]))
    return (jnp.asarray(n), jnp.asarray(v), jnp.asarray(seg_uv),
            jnp.asarray(plc_uv), jnp.asarray(obs_q), jnp.asarray(obs_p))


def test_plc_residual_zero_on_line():
    n, v, seg_uv, plc_uv, obs_q, obs_p = _scene()
    r = jax.vmap(
        lambda q, p, s, pu: line_up._line_residual_plc(
            n, v, q, p, QI, Z3, CAM_K, s, pu)
    )(obs_q, obs_p, seg_uv, plc_uv)
    assert r.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)
    # an off-line point must produce a nonzero PLC row (the image line is
    # near-vertical, so perturb u — perpendicular to the line)
    plc_off = plc_uv.at[:, 1, 0].add(3.0)
    r2 = jax.vmap(
        lambda q, p, s, pu: line_up._line_residual_plc(
            n, v, q, p, QI, Z3, CAM_K, s, pu)
    )(obs_q, obs_p, seg_uv, plc_off)
    assert float(jnp.min(jnp.abs(r2[:, 3]))) > 0.5


def test_plc_system_matches_finite_differences():
    """FD-check the pose and line Jacobian blocks of the PLC rows through an
    independent numeric perturbation of the same residual chain."""
    n, v, seg_uv, plc_uv, obs_q, obs_p = _scene(n_obs=2)
    O = 2
    C = 4  # clone slots
    D = 15 + 6 * C
    clone_q = jnp.tile(QI, (C, 1)).at[0:O].set(obs_q)
    clone_p = jnp.zeros((C, 3)).at[0:O].set(obs_p)
    obs_slot = jnp.arange(O, dtype=jnp.int32)
    obs_valid = jnp.ones(O, dtype=bool)
    plc_valid = jnp.ones((O, 2), dtype=bool)

    Hx, Hl, r, mask = line_up.line_systems_batch_plc(
        n[None], v[None], seg_uv[None], plc_uv[None], plc_valid[None],
        obs_slot[None], obs_valid[None],
        clone_q, clone_p, clone_q, clone_p, QI, Z3, CAM_K,
        C, 15, D,
    )
    Hx, Hl, r, mask = Hx[0], Hl[0], r[0], mask[0]
    R = 4  # rows per obs (2 endpoints + 2 PLC)
    assert Hx.shape == (R * O, D) and Hl.shape == (R * O, 4)
    assert bool(jnp.all(mask))

    eps = 1e-6

    def res_all(dx_pose, d4):
        """Residual stack after perturbing clone 0's pose and the line."""
        dq = lie.quat_norm(jnp.concatenate([0.5 * dx_pose[0:3], jnp.ones(1)]))
        q0 = lie.quat_multiply(dq, clone_q[0])
        p0 = clone_p[0] + dx_pose[3:6]
        qs = clone_q.at[0].set(q0)
        ps = clone_p.at[0].set(p0)
        n2, v2 = plucker.apply_orthonormal_delta(n, v, d4)
        return jax.vmap(
            lambda q, p, s, pu: line_up._line_residual_plc(
                n2, v2, q, p, QI, Z3, CAM_K, s, pu)
        )(qs[obs_slot], ps[obs_slot], seg_uv, plc_uv).reshape(-1)

    # pose block of clone 0 occupies Hx[:, 15:21]
    for k in range(6):
        dx = jnp.zeros(6).at[k].set(eps)
        fd = (res_all(dx, jnp.zeros(4)) - res_all(-dx, jnp.zeros(4))) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(Hx[:, 15 + k]), np.asarray(fd), atol=1e-4,
            err_msg=f"pose dof {k}")
    for k in range(4):
        d4 = jnp.zeros(4).at[k].set(eps)
        fd = (res_all(jnp.zeros(6), d4) - res_all(jnp.zeros(6), -d4)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(Hl[:, k]), np.asarray(fd), atol=1e-4,
            err_msg=f"line dof {k}")


def test_plc_reduces_to_endpoint_system():
    """P=0 PLC path must equal the endpoint-only system exactly."""
    n, v, seg_uv, _, obs_q, obs_p = _scene(n_obs=3)
    O, C = 3, 4
    D = 15 + 6 * C
    clone_q = jnp.tile(QI, (C, 1)).at[0:O].set(obs_q)
    clone_p = jnp.zeros((C, 3)).at[0:O].set(obs_p)
    obs_slot = jnp.arange(O, dtype=jnp.int32)[None]
    obs_valid = jnp.ones((1, O), dtype=bool)

    ref = line_up.line_systems_batch(
        n[None], v[None], seg_uv[None], obs_slot, obs_valid,
        clone_q, clone_p, clone_q, clone_p, QI, Z3, CAM_K, C, 15, D)
    plc = line_up.line_systems_batch_plc(
        n[None], v[None], seg_uv[None],
        jnp.zeros((1, O, 0, 2)), jnp.zeros((1, O, 0), dtype=bool),
        obs_slot, obs_valid,
        clone_q, clone_p, clone_q, clone_p, QI, Z3, CAM_K, C, 15, D)
    for a, b in zip(ref, plc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plc_adds_information():
    """PLC rows add measurement information (noise averaging along the
    segment): the whitened information trace must strictly grow."""
    n, v, seg_uv, plc_uv, obs_q, obs_p = _scene(n_obs=3)
    O, C = 3, 4
    D = 15 + 6 * C
    clone_q = jnp.tile(QI, (C, 1)).at[0:O].set(obs_q)
    clone_p = jnp.zeros((C, 3)).at[0:O].set(obs_p)
    obs_slot = jnp.arange(O, dtype=jnp.int32)[None]
    obs_valid = jnp.ones((1, O), dtype=bool)
    plc_valid = jnp.ones((1, O, 2), dtype=bool)

    def info(plc_uv_, plc_valid_):
        Hx, Hl, r, mask = line_up.line_systems_batch_plc(
            n[None], v[None], seg_uv[None], plc_uv_, plc_valid_,
            obs_slot, obs_valid,
            clone_q, clone_p, clone_q, clone_p, QI, Z3, CAM_K, C, 15, D)
        Hm = Hx[0] * mask[0][:, None]
        return float(jnp.trace(Hm.T @ Hm))

    base = info(jnp.zeros((1, O, 0, 2)), jnp.zeros((1, O, 0), dtype=bool))
    with_plc = info(plc_uv[None], plc_valid)
    assert with_plc > base * 1.2, (base, with_plc)
