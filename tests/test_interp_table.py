"""Interpolated-pose table + table-based camera systems.

Validates the round-2 wiring of order-n polynomial interpolation into the
live measurement path (reference: State::get_interpolated_jacobian,
State.cpp:833-973) and the camera calibration columns
(CamHelper.cpp:77-102,139-167): knot exactness, order-3 vs linear accuracy,
and finite-difference checks of every Jacobian block including dt/ext/int.
"""

import jax
import jax.numpy as jnp
import numpy as np

from plviwo_tpu.core.interp import (
    build_interp_table,
    interpolate_pose_linear,
    polynomial_pose,
)
from plviwo_tpu.ops import cam as cam_ops
from plviwo_tpu.ops import lie
from plviwo_tpu.update import cam_helper

F64 = jnp.float64


def _smooth_traj(ts):
    """Analytic smooth SE(3) trajectory: sinusoidal rotation + position."""
    qs, ps = [], []
    for t in ts:
        th = np.array([0.3 * np.sin(t), 0.2 * np.cos(1.3 * t), 0.4 * t])
        R = np.asarray(lie.exp_so3(jnp.asarray(th)))
        qs.append(np.asarray(lie.rot_2_quat(jnp.asarray(R))))
        ps.append(np.array([np.sin(t), 2 * np.cos(0.7 * t), 0.5 * t]))
    return np.asarray(qs), np.asarray(ps)


def _make_clones(n_clones=8, dt=0.1):
    ts = np.arange(n_clones) * dt
    qs, ps = _smooth_traj(ts)
    return ts, jnp.asarray(qs), jnp.asarray(ps)


def _table(clone_q, clone_p, sup_slot, sup_dt, dt_eval, K, C):
    return build_interp_table(
        clone_q, clone_p, clone_q, clone_p,
        jnp.asarray(sup_slot, dtype=jnp.int32), jnp.asarray(sup_dt),
        jnp.asarray(dt_eval), K=K, n_clones=C)


def test_knot_exactness_k2_and_k4():
    ts, cq, cp = _make_clones()
    for K in (2, 4):
        sup_slot = np.tile(np.arange(K, dtype=np.int32), (K, 1))
        sup_dt = np.tile(ts[:K] - ts[0], (K, 1))
        dt_eval = ts[:K] - ts[0]  # evaluate at each knot
        tq, tp, tqf, tpf, tJ, tJt = _table(cq, cp, sup_slot, sup_dt, dt_eval, K, 8)
        for i in range(K):
            np.testing.assert_allclose(np.asarray(tp[i]), np.asarray(cp[i]), atol=1e-10)
            assert abs(float(np.dot(np.asarray(tq[i]), np.asarray(cq[i])))) > 1 - 1e-10


def test_order3_beats_linear_between_clones():
    """On a smooth trajectory, cubic interpolation error << linear error."""
    dt = 0.25
    ts, cq, cp = _make_clones(n_clones=8, dt=dt)
    t_eval = ts[1] + 0.5 * dt  # midway between clones 1 and 2
    q_gt, p_gt = _smooth_traj(np.array([t_eval]))

    # linear (K=2) over clones 1,2
    sup2 = np.array([[1, 2]], dtype=np.int32)
    d2 = np.array([[0.0, dt]])
    tq2, tp2, *_ = _table(cq, cp, sup2, d2, np.array([0.5 * dt]), 2, 8)
    # cubic (K=4) over clones 0..3
    sup4 = np.array([[0, 1, 2, 3]], dtype=np.int32)
    d4 = np.array([ts[:4] - ts[0]])
    tq4, tp4, *_ = _table(cq, cp, sup4, d4, np.array([t_eval - ts[0]]), 4, 8)

    e2 = np.linalg.norm(np.asarray(tp2[0]) - p_gt[0])
    e4 = np.linalg.norm(np.asarray(tp4[0]) - p_gt[0])
    assert e4 < 0.35 * e2, f"cubic {e4:.2e} vs linear {e2:.2e}"

    R_gt = np.asarray(lie.quat_2_rot(jnp.asarray(q_gt[0])))
    a2 = np.linalg.norm(np.asarray(lie.log_so3(
        lie.quat_2_rot(tq2[0]) @ R_gt.T)))
    a4 = np.linalg.norm(np.asarray(lie.log_so3(
        lie.quat_2_rot(tq4[0]) @ R_gt.T)))
    assert a4 < 0.35 * a2, f"cubic rot {a4:.2e} vs linear rot {a2:.2e}"


def test_k2_matches_linear_interp():
    ts, cq, cp = _make_clones()
    lam = 0.37
    dt = ts[1] - ts[0]
    sup = np.array([[2, 3]], dtype=np.int32)
    d = np.array([[0.0, dt]])
    tq, tp, *_ = _table(cq, cp, sup, d, np.array([lam * dt]), 2, 8)
    R_ref, p_ref = interpolate_pose_linear(cq[2], cp[2], cq[3], cp[3], lam)
    np.testing.assert_allclose(np.asarray(tp[0]), np.asarray(p_ref), atol=1e-12)
    np.testing.assert_allclose(
        np.abs(np.dot(np.asarray(tq[0]), np.asarray(lie.rot_2_quat(R_ref)))),
        1.0, atol=1e-12)


def test_interp_jacobian_fd():
    """tJ and tJt match finite differences of the interpolated pose."""
    ts, cq, cp = _make_clones(n_clones=6, dt=0.2)
    K, C = 4, 6
    sup = np.array([[1, 2, 3, 4]], dtype=np.int32)
    d = np.array([ts[1:5] - ts[1]])
    dte = np.array([0.33])
    tq, tp, tqf, tpf, tJ, tJt = _table(cq, cp, sup, d, dte, K, C)

    eps = 1e-6
    # perturb clone 2 (support index 1): rotation axis 1 and position axis 0
    for col, build in (
        (6 * 2 + 1, "rot"),
        (6 * 2 + 3 + 0, "pos"),
    ):
        cq2, cp2 = np.asarray(cq).copy(), np.asarray(cp).copy()
        if build == "rot":
            dth = np.zeros(3); dth[1] = eps
            dq = np.asarray(lie.quat_norm(jnp.asarray(
                np.concatenate([0.5 * dth, [1.0]]))))
            cq2[2] = np.asarray(lie.quat_multiply(jnp.asarray(dq), cq[2]))
        else:
            cp2[2, 0] += eps
        tq_p, tp_p, *_ = _table(jnp.asarray(cq2), jnp.asarray(cp2), sup, d, dte, K, C)
        # increment in the JPL left-mult convention: psi = log(R0 R_pert^T)
        dth_out = np.asarray(lie.log_so3(
            lie.quat_2_rot(tq[0]) @ lie.quat_2_rot(tq_p[0]).T)) / eps
        dp_out = (np.asarray(tp_p[0]) - np.asarray(tp[0])) / eps
        np.testing.assert_allclose(dth_out, np.asarray(tJ[0, 0:3, col]), atol=2e-5)
        np.testing.assert_allclose(dp_out, np.asarray(tJ[0, 3:6, col]), atol=2e-5)

    # time column
    tq_t, tp_t, *_ = _table(cq, cp, sup, d, dte + eps, K, C)
    dth_t = np.asarray(lie.log_so3(
        lie.quat_2_rot(tq[0]) @ lie.quat_2_rot(tq_t[0]).T)) / eps
    dp_t = (np.asarray(tp_t[0]) - np.asarray(tp[0])) / eps
    np.testing.assert_allclose(dth_t, np.asarray(tJt[0, 0:3]), atol=2e-5)
    np.testing.assert_allclose(dp_t, np.asarray(tJt[0, 3:6]), atol=2e-5)


def test_point_system_calib_columns_fd():
    """dt/ext/int calibration columns match finite differences of the full
    measurement function (pose interpolation included for dt)."""
    ts, cq, cp = _make_clones(n_clones=6, dt=0.2)
    K, C, D_clone = 4, 6, 36
    lo_dt, lo_ext, lo_int = D_clone + 6, D_clone + 7, D_clone + 13
    D = D_clone + 6 + 15  # clones + imu-ish pad + cam calib block

    cam_q = jnp.asarray(lie.rot_2_quat(jnp.asarray(lie.exp_so3(
        jnp.asarray([0.02, -0.01, 0.03])))))
    cam_p = jnp.asarray([0.1, -0.05, 0.02])
    cam_k = jnp.asarray([450.0, 455.0, 370.0, 240.0, 0.01, -0.005, 0.001, 0.0005])

    p_f = jnp.asarray([[1.5, 0.4, 6.0]])
    sup = np.array([[1, 2, 3, 4]], dtype=np.int32)
    d = np.array([ts[1:5] - ts[1]])
    dte0 = 0.33

    def predict(clone_q, clone_p, cam_q_, cam_p_, cam_k_, dte):
        tq, tp, *_ = _table(clone_q, clone_p, sup, d, np.array([dte]), K, C)
        R_t = lie.quat_2_rot(tq[0])
        R_ItoC = lie.quat_2_rot(cam_q_)
        p_C = R_ItoC @ (R_t @ (p_f[0] - tp[0])) + cam_p_
        zn = p_C[:2] / p_C[2]
        return np.asarray(cam_ops.distort_radtan(zn, cam_k_))

    tq, tp, tqf, tpf, tJ, tJt = _table(cq, cp, sup, d, np.array([dte0]), K, C)
    obs_uv = jnp.asarray([[[400.0, 300.0]]])
    obs_tidx = jnp.zeros((1, 1), dtype=jnp.int32)
    obs_valid = jnp.ones((1, 1), dtype=bool)
    obs_cam0 = jnp.ones((1, 1), dtype=bool)
    Hx, Hf, r, rowmask = cam_helper.point_systems_table_batch(
        p_f, obs_uv, obs_tidx, obs_valid, obs_cam0,
        tq, tp, tqf, tpf, tJ, tJt,
        jnp.tile(cam_q, (1, 1, 1)), jnp.tile(cam_p, (1, 1, 1)),
        jnp.tile(cam_k, (1, 1, 1)),
        0, 0, D, lo_dt, lo_ext, lo_int)
    Hx = np.asarray(Hx[0])  # (2, D); note residual r = uv - h, so dh = -Hx...
    # convention: Hx is dh/dx (H = +dh/dx); FD of predict gives dh directly
    z0 = predict(cq, cp, cam_q, cam_p, cam_k, dte0)
    eps = 1e-6

    # dt column
    z1 = predict(cq, cp, cam_q, cam_p, cam_k, dte0 + eps)
    np.testing.assert_allclose((z1 - z0) / eps, Hx[:, lo_dt], rtol=2e-4, atol=2e-4)

    # extrinsic rotation axis 2
    dth = np.zeros(3); dth[2] = eps
    dq = lie.quat_norm(jnp.asarray(np.concatenate([0.5 * dth, [1.0]])))
    z2 = predict(cq, cp, lie.quat_multiply(dq, cam_q), cam_p, cam_k, dte0)
    np.testing.assert_allclose((z2 - z0) / eps, Hx[:, lo_ext + 2], rtol=2e-4, atol=2e-4)

    # extrinsic position axis 1
    z3 = predict(cq, cp, cam_q, cam_p + jnp.asarray([0, eps, 0.0]), cam_k, dte0)
    np.testing.assert_allclose((z3 - z0) / eps, Hx[:, lo_ext + 3 + 1], rtol=2e-4, atol=2e-4)

    # intrinsics: fx and d0
    for ki, col in ((0, lo_int + 0), (4, lo_int + 4)):
        dk = np.zeros(8); dk[ki] = eps
        z4 = predict(cq, cp, cam_q, cam_p, cam_k + jnp.asarray(dk), dte0)
        np.testing.assert_allclose((z4 - z0) / eps, Hx[:, col], rtol=2e-4, atol=2e-4)

    # clone column: rotation of support clone 2 (state col 6*2+0..3)
    dth = np.zeros(3); dth[0] = eps
    dq = lie.quat_norm(jnp.asarray(np.concatenate([0.5 * dth, [1.0]])))
    cq2 = np.asarray(cq).copy()
    cq2[2] = np.asarray(lie.quat_multiply(dq, cq[2]))
    z5 = predict(jnp.asarray(cq2), cp, cam_q, cam_p, cam_k, dte0)
    np.testing.assert_allclose((z5 - z0) / eps, Hx[:, 6 * 2 + 0], rtol=2e-4, atol=2e-4)

    # feature Jacobian
    z6 = predict(cq, cp, cam_q, cam_p, cam_k, dte0)  # base again
    pf2 = p_f + jnp.asarray([[eps, 0, 0]])
    tq_, tp_ = tq, tp
    R_t = lie.quat_2_rot(tq_[0]); R_ItoC = lie.quat_2_rot(cam_q)
    p_C = R_ItoC @ (R_t @ (pf2[0] - tp_[0])) + cam_p
    z7 = np.asarray(cam_ops.distort_radtan(p_C[:2] / p_C[2], cam_k))
    np.testing.assert_allclose((z7 - z6) / eps, np.asarray(Hf[0])[:, 0],
                               rtol=2e-4, atol=2e-4)
