"""CPI tests: preintegral must reproduce the propagator's prediction and the
bias Jacobians must match finite differences."""

import jax.numpy as jnp
import numpy as np

from plviwo_tpu.core import propagator
from plviwo_tpu.core.cpi import correct_for_bias, cpi_v1, predict_from_cpi
from plviwo_tpu.core.layout import StateLayout
from plviwo_tpu.core.state import make_state
from plviwo_tpu.ops import lie
from plviwo_tpu.sim.simulator import SimConfig, Simulator

GRAVITY = jnp.asarray([0.0, 0.0, 9.81])


def _setup(duration=2.0):
    sim = Simulator(SimConfig(duration=duration, seed=6, sigma_w=0.0,
                              sigma_a=0.0, sigma_wb=0.0, sigma_ab=0.0))
    t, w, a = sim.imu_stream()
    return sim, jnp.asarray(t), jnp.asarray(w), jnp.asarray(a)


def test_cpi_matches_direct_propagation():
    sim, t, w, a = _setup()
    n = 101  # 0.5 s window
    cpi = cpi_v1(t[:n], w[:n], a[:n], jnp.zeros(3), jnp.zeros(3))
    q0, p0 = sim.gt_pose(float(t[0]))
    kin0 = sim.gt_kin(float(t[0]))
    v0 = jnp.asarray(kin0["v_IinG"])
    last = {k: v[-1] for k, v in cpi.items()}
    R_tau, p_tau, v_tau = predict_from_cpi(q0, jnp.asarray(kin0["p_IinG"]),
                                           v0, last, GRAVITY)
    kin1 = sim.gt_kin(float(t[n - 1]))
    np.testing.assert_allclose(p_tau, np.asarray(kin1["p_IinG"]), atol=2e-3)
    np.testing.assert_allclose(v_tau, np.asarray(kin1["v_IinG"]), atol=5e-3)
    dR = np.asarray(R_tau) @ np.asarray(kin1["R_GtoI"]).T
    assert np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray(dR)))) < 2e-3


def test_bias_jacobians_fd():
    _, t, w, a = _setup()
    n = 41
    bg0 = jnp.asarray([0.01, -0.02, 0.005])
    ba0 = jnp.asarray([0.05, 0.02, -0.03])
    base = cpi_v1(t[:n], w[:n], a[:n], bg0, ba0)
    eps = 1e-6
    for idx, name in ((0, "bg"), (1, "ba")):
        for axis in range(3):
            d = jnp.zeros(3).at[axis].set(eps)
            if name == "bg":
                pert = cpi_v1(t[:n], w[:n], a[:n], bg0 + d, ba0)
            else:
                pert = cpi_v1(t[:n], w[:n], a[:n], bg0, ba0 + d)
            # the correction Jacobians predict the *negative* bias-delta
            # effect: integrating with bias b+d equals correcting the base
            # integral with dbias = -d... verify alpha/beta columns
            Rc, alc, bec = correct_for_bias(
                {k: v[-1] for k, v in base.items()},
                (-d if name == "bg" else jnp.zeros(3)),
                (-d if name == "ba" else jnp.zeros(3)))
            np.testing.assert_allclose(
                alc, pert["alpha"][-1], atol=5e-6,
                err_msg=f"J alpha wrt {name}[{axis}]")
            np.testing.assert_allclose(
                bec, pert["beta"][-1], atol=5e-6,
                err_msg=f"H beta wrt {name}[{axis}]")
            dRc = np.asarray(Rc) @ np.asarray(pert["R_k2tau"][-1]).T
            assert np.linalg.norm(
                np.asarray(lie.log_so3(jnp.asarray(dRc)))) < 5e-6, \
                f"J_q wrt {name}[{axis}]"


def test_padding_noop():
    _, t, w, a = _setup()
    n = 21
    c1 = cpi_v1(t[:n], w[:n], a[:n], jnp.zeros(3), jnp.zeros(3))
    tp = jnp.concatenate([t[:n], jnp.full(8, t[n - 1])])
    wp = jnp.concatenate([w[:n], jnp.tile(w[n - 1], (8, 1))])
    ap = jnp.concatenate([a[:n], jnp.tile(a[n - 1], (8, 1))])
    c2 = cpi_v1(tp, wp, ap, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(c1["alpha"][-1], c2["alpha"][-1], atol=1e-14)
    np.testing.assert_allclose(c1["R_k2tau"][-1], c2["R_k2tau"][-1], atol=1e-14)


def test_cpi_v2_matches_direct_propagation():
    from plviwo_tpu.core.cpi import cpi_v2

    sim, t, w, a = _setup()
    n = 101
    cpi = cpi_v2(t[:n], w[:n], a[:n], jnp.zeros(3), jnp.zeros(3))
    q0, p0 = sim.gt_pose(float(t[0]))
    kin0 = sim.gt_kin(float(t[0]))
    v0 = jnp.asarray(kin0["v_IinG"])
    last = {k: v[-1] for k, v in cpi.items()}
    R_tau, p_tau, v_tau = predict_from_cpi(q0, jnp.asarray(kin0["p_IinG"]),
                                           v0, last, GRAVITY)
    kin1 = sim.gt_kin(float(t[n - 1]))
    np.testing.assert_allclose(p_tau, np.asarray(kin1["p_IinG"]), atol=2e-3)
    np.testing.assert_allclose(v_tau, np.asarray(kin1["v_IinG"]), atol=5e-3)
    dR = np.asarray(R_tau) @ np.asarray(kin1["R_GtoI"]).T
    assert np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray(dR)))) < 2e-3


def test_cpi_v2_beats_v1_at_coarse_rate():
    """The closed-form step integrals must beat the midpoint rule when the
    IMU window is decimated (the reason CpiV2 exists)."""
    from plviwo_tpu.core.cpi import cpi_v2

    sim, t, w, a = _setup()
    n = 401  # 2 s window
    stride = 20  # 10 Hz effective rate
    tc, wc, ac = t[:n:stride], w[:n:stride], a[:n:stride]
    kin0 = sim.gt_kin(float(t[0]))
    q0, _ = sim.gt_pose(float(t[0]))
    v0 = jnp.asarray(kin0["v_IinG"])
    kin1 = sim.gt_kin(float(tc[-1]))

    errs = {}
    for name, fn in (("v1", cpi_v1), ("v2", cpi_v2)):
        cpi = fn(tc, wc, ac, jnp.zeros(3), jnp.zeros(3))
        last = {k: v[-1] for k, v in cpi.items()}
        _, p_tau, v_tau = predict_from_cpi(
            q0, jnp.asarray(kin0["p_IinG"]), v0, last, GRAVITY)
        errs[name] = float(np.linalg.norm(p_tau - np.asarray(kin1["p_IinG"])))
    assert errs["v2"] < errs["v1"], errs


def test_cpi_v2_bias_jacobians_fd():
    from plviwo_tpu.core.cpi import cpi_v2

    _, t, w, a = _setup()
    n = 41
    bg0 = jnp.asarray([0.01, -0.02, 0.005])
    ba0 = jnp.asarray([0.05, 0.02, -0.03])
    base = cpi_v2(t[:n], w[:n], a[:n], bg0, ba0)
    eps = 1e-6
    for name in ("bg", "ba"):
        for axis in range(3):
            d = jnp.zeros(3).at[axis].set(eps)
            if name == "bg":
                pert = cpi_v2(t[:n], w[:n], a[:n], bg0 + d, ba0)
            else:
                pert = cpi_v2(t[:n], w[:n], a[:n], bg0, ba0 + d)
            Rc, alc, bec = correct_for_bias(
                {k: v[-1] for k, v in base.items()},
                (-d if name == "bg" else jnp.zeros(3)),
                (-d if name == "ba" else jnp.zeros(3)))
            np.testing.assert_allclose(
                alc, pert["alpha"][-1], atol=5e-6,
                err_msg=f"J alpha wrt {name}[{axis}]")
            np.testing.assert_allclose(
                bec, pert["beta"][-1], atol=5e-6,
                err_msg=f"H beta wrt {name}[{axis}]")
            dRc = np.asarray(Rc) @ np.asarray(pert["R_k2tau"][-1]).T
            assert np.linalg.norm(
                np.asarray(lie.log_so3(jnp.asarray(dRc)))) < 5e-6, \
                f"J_q wrt {name}[{axis}]"
