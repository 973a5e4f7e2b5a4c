"""GNSS updater (L3).

Rebuild of `PL-VIWO/src/update/gps/UpdaterGPS.*` + `MathGPS.h` (SURVEY.md
2.4): geodetic->ENU conversion, keyframe accumulation before initialization,
4-DoF world->ENU alignment (Horn quaternion eigen-solve restricted to yaw),
whole-state rotation into ENU, and per-fix 3-DoF position updates with a
2-D fallback when the 3-D residual is chi2-rejected.

Initialization follows the reference's full flow (UpdaterGPS.cpp:338-516):
Horn 4-DoF initial guess -> stacked delayed-initialization linear system over
all covered fixes (`ekf.delayed_init` = StateHelper::initialize's QR split:
the transform enters the state with its estimated covariance + cross
covariance, and the surplus rows update the existing states) -> whole-state
rotation into ENU with the covariance transform carrying the trans_WtoE
columns as common-mode terms -> marginalization of the transform.  One
documented divergence: the reference drops SLAM landmarks at the transform
(its marginalize_slam call); here they are rotated with their own
common-mode columns and kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..core import ekf
from ..core.interp import interpolate_pose_linear

F64 = jnp.float64

_A = 6378137.0  # WGS84
_F = 1.0 / 298.257223563
_E2 = _F * (2 - _F)


def geodetic_to_ecef(lat, lon, alt):
    lat, lon = np.radians(lat), np.radians(lon)
    N = _A / np.sqrt(1 - _E2 * np.sin(lat) ** 2)
    x = (N + alt) * np.cos(lat) * np.cos(lon)
    y = (N + alt) * np.cos(lat) * np.sin(lon)
    z = (N * (1 - _E2) + alt) * np.sin(lat)
    return np.array([x, y, z])


def geodetic_to_enu(lat, lon, alt, datum):
    """WGS84 geodetic -> local ENU about `datum` = (lat0, lon0, alt0).

    (Reference: MathGPS::GeodeticToEnu, MathGPS.h:54-127.)
    """
    lat0, lon0, alt0 = datum
    p = geodetic_to_ecef(lat, lon, alt)
    p0 = geodetic_to_ecef(lat0, lon0, alt0)
    lat0r, lon0r = np.radians(lat0), np.radians(lon0)
    sl, cl = np.sin(lat0r), np.cos(lat0r)
    so, co = np.sin(lon0r), np.cos(lon0r)
    R = np.array([
        [-so, co, 0.0],
        [-sl * co, -sl * so, cl],
        [cl * co, cl * so, sl],
    ])
    return R @ (p - p0)


def horn_4dof(p_W, p_E):
    """Best-fit yaw rotation + translation: p_E ~= R_z(yaw) p_W + t.

    (Reference: get_initial_guess Horn eigen-solve restricted to z-rotation,
    UpdaterGPS.cpp:272-335.)  Closed form: yaw maximizes
    sum cos(yaw)(x_w x_e + y_w y_e) + sin(yaw)(x_w y_e - y_w x_e).
    """
    p_W = np.asarray(p_W)
    p_E = np.asarray(p_E)
    cW = p_W.mean(0)
    cE = p_E.mean(0)
    dW = p_W - cW
    dE = p_E - cE
    a = float(np.sum(dW[:, 0] * dE[:, 0] + dW[:, 1] * dE[:, 1]))
    b = float(np.sum(dW[:, 0] * dE[:, 1] - dW[:, 1] * dE[:, 0]))
    yaw = np.arctan2(b, a)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    t = cE - R @ cW
    resid = p_E - (p_W @ R.T + t)
    rms = float(np.sqrt(np.mean(np.sum(resid**2, axis=1))))
    return R, t, yaw, rms


def ransac_4dof(p_W, p_E, thresh, n_hyp: int = 128, seed: int = 0):
    """Robust 4-DoF initial guess: 2-point yaw+translation hypotheses,
    consensus by alignment residual, Horn refit on the inlier set.

    (Reference: MathGPS::Ransac_4Dof, MathGPS.h:129, used by
    UpdaterGPS::get_initial_guess — round-2 had Horn-only, leaving the init
    unguarded against GNSS outliers under the KAIST chi2_mult=9999 config.)

    Returns (R, t, yaw, rms_inliers, inlier_mask).
    """
    p_W = np.asarray(p_W, dtype=float)
    p_E = np.asarray(p_E, dtype=float)
    n = len(p_W)
    if n < 4:
        R, t, yaw, rms = horn_4dof(p_W, p_E)
        return R, t, yaw, rms, np.ones(n, dtype=bool)
    rng = np.random.default_rng(seed)
    best_inl = np.ones(n, dtype=bool)
    best_cnt = -1
    for _ in range(n_hyp):
        i, j = rng.choice(n, 2, replace=False)
        dW = p_W[j] - p_W[i]
        dE = p_E[j] - p_E[i]
        if np.hypot(*dW[:2]) < 0.5:  # degenerate horizontal baseline
            continue
        yaw = np.arctan2(dE[1], dE[0]) - np.arctan2(dW[1], dW[0])
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        t = 0.5 * ((p_E[i] - R @ p_W[i]) + (p_E[j] - R @ p_W[j]))
        resid = np.linalg.norm(p_E - (p_W @ R.T + t), axis=1)
        inl = resid < thresh
        if inl.sum() > best_cnt:
            best_cnt = int(inl.sum())
            best_inl = inl
    if best_cnt < max(3, n // 3):
        # no consensus: fall back to Horn over everything (caller's rms
        # gate rejects if the cloud is inconsistent)
        R, t, yaw, rms = horn_4dof(p_W, p_E)
        return R, t, yaw, rms, np.ones(n, dtype=bool)
    R, t, yaw, rms = horn_4dof(p_W[best_inl], p_E[best_inl])
    return R, t, yaw, rms, best_inl


def transform_state_to_enu(state, R_WtoE, p_WinE):
    """Rotate the whole filter state (means + covariance) from W to ENU.

    (Reference: transform_state_to_ENU, UpdaterGPS.cpp:457-516.)  The
    covariance transform for a yaw rotation R: every orientation error block
    is invariant in its own frame except global-frame quantities (p, v,
    clone p, slam p, and the theta error which is expressed locally ->
    rotated by R for position-like states only; JPL attitude error is local,
    so q_GtoI -> q_GtoI (x) q(R^T) leaves its error untouched).
    """
    R = jnp.asarray(R_WtoE, dtype=F64)
    t = jnp.asarray(p_WinE, dtype=F64)
    q_rot = lie.rot_2_quat(R.T)  # frame map: R_EtoG^T ... compose below

    def rot_q(q):
        # R_GtoI -> R_EtoI = R_GtoI R_WtoE^T => q_new = q (x) q(R_WtoE^T)
        return lie.quat_multiply(q, q_rot)

    def rot_p(p):
        return (R @ p[..., :, None])[..., 0] + t

    def rot_v(v):
        return (R @ v[..., :, None])[..., 0]

    new = state.replace(
        q=rot_q(state.q), q_fej=rot_q(state.q_fej),
        p=rot_p(state.p), p_fej=rot_p(state.p_fej),
        v=rot_v(state.v), v_fej=rot_v(state.v_fej),
        clone_q=rot_q(state.clone_q), clone_q_fej=rot_q(state.clone_q_fej),
        clone_p=rot_p(state.clone_p), clone_p_fej=rot_p(state.clone_p_fej),
        slam_p=rot_v(state.slam_p) + jnp.where(state.slam_valid[:, None], t, 0.0),
        slam_p_fej=rot_v(state.slam_p_fej) + jnp.where(state.slam_valid[:, None], t, 0.0),
    )
    # covariance: J P J^T with J block-diagonal: R on position/velocity/slam
    # blocks, I on attitude/bias/calib blocks
    lo = state.layout
    D = lo.dim
    J = jnp.eye(D, dtype=F64)
    J = J.at[lo.IMU_P : lo.IMU_P + 3, lo.IMU_P : lo.IMU_P + 3].set(R)
    J = J.at[lo.IMU_V : lo.IMU_V + 3, lo.IMU_V : lo.IMU_V + 3].set(R)
    # JPL attitude error theta is in the *global* frame pre-multiplied...
    # for q' = q (x) q_rot: R' = R(q) R_WtoE^T; error (I - [th])R(q)R^T stays
    # left-multiplicative on R(q) => theta unchanged. Positions rotate.
    for i in range(lo.n_clones):
        s = lo.clone(i) + 3
        J = J.at[s : s + 3, s : s + 3].set(R)
    for i in range(lo.max_slam):
        s = lo.slam(i)
        J = J.at[s : s + 3, s : s + 3].set(R)
    cov = J @ state.cov @ J.T
    return new.replace(cov=0.5 * (cov + cov.T))


def transform_state_to_enu_marg_trans(state):
    """Rotate the whole state by its estimated `trans_WtoE` and marginalize
    the transform (reference: transform_state_to_ENU, UpdaterGPS.cpp:457-516).

    The covariance transform is x_E = f(x_W, n) with n = [dpsi, dt] the
    transform's error: J carries R_z(psi) on the position/velocity/landmark
    blocks, identity on attitude/bias/calib blocks, and the trans_WtoE
    COLUMNS as common-mode terms (a yaw/translation error shifts every
    global quantity coherently).  The transform's own rows are then dropped
    (marginalized) and its mean reset to identity.
    """
    lo = state.layout
    yaw = state.wtoe_th
    t = state.wtoe_p
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    R = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype=F64)
    q_rot = lie.rot_2_quat(R.T)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype=F64)

    def rot_q(q):
        return lie.quat_multiply(q, q_rot)

    def rot_p(p):
        return (R @ p[..., :, None])[..., 0] + t

    def rot_v(v):
        return (R @ v[..., :, None])[..., 0]

    new = state.replace(
        q=rot_q(state.q), q_fej=rot_q(state.q_fej),
        p=rot_p(state.p), p_fej=rot_p(state.p_fej),
        v=rot_v(state.v), v_fej=rot_v(state.v_fej),
        clone_q=rot_q(state.clone_q), clone_q_fej=rot_q(state.clone_q_fej),
        clone_p=rot_p(state.clone_p), clone_p_fej=rot_p(state.clone_p_fej),
        slam_p=jnp.where(state.slam_valid[:, None], rot_p(state.slam_p),
                         state.slam_p),
        slam_p_fej=jnp.where(state.slam_valid[:, None],
                             rot_p(state.slam_p_fej), state.slam_p_fej),
    )

    D = lo.dim
    w = lo.wtoe_off
    J = jnp.eye(D, dtype=F64)

    def set_pos_rows(J, s, p_E, with_t=True):
        """Rows of a rotated position: R on its own block + trans columns."""
        J = J.at[s : s + 3, s : s + 3].set(R)
        J = J.at[s : s + 3, w].set(jnp.cross(ez, p_E - t))
        if with_t:
            J = J.at[s : s + 3, w + 1 : w + 4].set(jnp.eye(3, dtype=F64))
        return J

    def set_th_rows(J, s, q_new):
        # JPL local attitude error is frame-invariant under the right-multiplied
        # yaw; the transform's dpsi enters along the body-frame z axis
        J = J.at[s : s + 3, w].set(lie.quat_2_rot(q_new) @ ez)
        return J

    J = set_th_rows(J, lo.IMU_TH, new.q)
    J = set_pos_rows(J, lo.IMU_P, new.p)
    J = J.at[lo.IMU_V : lo.IMU_V + 3, lo.IMU_V : lo.IMU_V + 3].set(R)
    J = J.at[lo.IMU_V : lo.IMU_V + 3, w].set(jnp.cross(ez, new.v))
    for i in range(lo.n_clones):
        sc = lo.clone(i)
        J = set_th_rows(J, sc, new.clone_q[i])
        J = set_pos_rows(J, sc + 3, new.clone_p[i])
    valid6 = jnp.repeat(state.clone_valid, 6).astype(F64)
    J = J.at[lo.clone_off : lo.clone_off + 6 * lo.n_clones, w : w + 4].multiply(
        valid6[:, None])
    for i in range(lo.max_slam):
        ss = lo.slam(i)
        J = set_pos_rows(J, ss, new.slam_p[i])
    if lo.max_slam > 0:
        valid3 = jnp.repeat(state.slam_valid, 3).astype(F64)
        J = J.at[lo.slam_off : lo.slam_off + 3 * lo.max_slam, w : w + 4].multiply(
            valid3[:, None])
    # drop the transform's own rows (marginalize after the transform)
    J = J.at[w : w + 4, :].set(0.0)
    cov = J @ state.cov @ J.T
    cov = 0.5 * (cov + cov.T)
    return new.replace(
        wtoe_th=jnp.asarray(0.0, dtype=F64), wtoe_p=jnp.zeros(3, dtype=F64),
        cov=cov,
    )


@jax.jit
def gps_linear_system(
    clone_q, clone_p, clone_q_fej, clone_p_fej,
    slot0, slot1, lam, gps_ext_p, meas_E,
):
    """3-row position system for one fix at an interpolated pose.

    Returns (H6 (3, 12) wrt [clone0(6), clone1(6)], res (3,)).  Jacobians via
    jacfwd at FEJ.
    """
    def h(dx0, dx1, q0, p0, q1, p1):
        dq0 = lie.quat_norm(jnp.concatenate([0.5 * dx0[0:3], jnp.ones(1, dtype=F64)]))
        dq1 = lie.quat_norm(jnp.concatenate([0.5 * dx1[0:3], jnp.ones(1, dtype=F64)]))
        R_t, p_t = interpolate_pose_linear(
            lie.quat_multiply(dq0, q0), p0 + dx0[3:6],
            lie.quat_multiply(dq1, q1), p1 + dx1[3:6], lam,
        )
        return p_t + R_t.T @ gps_ext_p

    z6 = jnp.zeros(6, dtype=F64)
    q0, p0 = clone_q[slot0], clone_p[slot0]
    q1, p1 = clone_q[slot1], clone_p[slot1]
    q0f, p0f = clone_q_fej[slot0], clone_p_fej[slot0]
    q1f, p1f = clone_q_fej[slot1], clone_p_fej[slot1]
    pred = h(z6, z6, q0, p0, q1, p1)
    res = meas_E - pred
    J0 = jax.jacfwd(h, argnums=0)(z6, z6, q0f, p0f, q1f, p1f)  # (3,6)
    J1 = jax.jacfwd(h, argnums=1)(z6, z6, q0f, p0f, q1f, p1f)
    return jnp.concatenate([J0, J1], axis=1), res


class GpsUpdater:
    """Host orchestration for GNSS fusion (buffer, datum, init, updates)."""

    def __init__(self, opts, layout, chi2_table):
        self.op = opts
        self.layout = layout
        self.chi2_table = chi2_table
        self.datum = None
        self.initialized = False
        self.pending = []  # (t, p_ENU) fixes before init
        self.stats = {"accept": 0, "reject": 0, "fallback2d": 0}
        self.align = None  # (R_WtoE, p_WinE, yaw, rms)

    def feed_geodetic(self, t, lat, lon, alt):
        if self.datum is None:
            self.datum = (lat, lon, alt)
        p = geodetic_to_enu(lat, lon, alt, self.datum)
        return self.feed_enu(t, p)

    def feed_enu(self, t, p_enu):
        self.pending.append((float(t), np.asarray(p_enu, dtype=np.float64)))
        return True

    # ------------------------------------------------------------------
    def try_process(self, system):
        """Called after each clone: attempt init, then apply pending fixes."""
        st = system.state
        valid = np.asarray(st.clone_valid)
        times = np.asarray(st.clone_t)
        if not valid.any():
            return
        t_lo = float(times[valid].min())
        t_hi = float(times[valid].max())

        if not self.initialized:
            self._try_initialize(system, t_lo, t_hi)
            if not self.initialized:
                # keep only reasonably recent fixes
                self.pending = [(t, p) for t, p in self.pending if t > t_lo - 30.0]
                return

        # apply fixes whose time is covered by the clone window
        rest = []
        for t, p in self.pending:
            if t > t_hi:
                rest.append((t, p))
                continue
            if t < t_lo:
                continue
            self._update_one(system, t, p)
        self.pending = rest

    # ------------------------------------------------------------------
    def _interp_traj(self, system, t):
        """Interpolated estimated position of the GPS antenna at time t."""
        st = system.state
        valid = np.asarray(st.clone_valid)
        times = np.asarray(st.clone_t)
        vt = times[valid]
        slots = np.nonzero(valid)[0]
        order = np.argsort(vt)
        vt = vt[order]
        slots = slots[order]
        i = int(np.searchsorted(vt, t, side="right") - 1)
        if i < 0 or (i >= len(vt) - 1 and vt[-1] < t):
            return None
        if vt[i] == t or i == len(vt) - 1:
            s0 = s1 = int(slots[i])
            lam = 0.0
        else:
            s0, s1 = int(slots[i]), int(slots[i + 1])
            lam = (t - vt[i]) / (vt[i + 1] - vt[i])
        return s0, s1, lam

    def _try_initialize(self, system, t_lo, t_hi):
        covered = [(t, p) for t, p in self.pending if t_lo <= t <= t_hi]
        if len(covered) < 3:
            return
        # distance traveled over the clone window history
        traj = system.traj
        if len(traj) < 2:
            return
        ps = np.asarray([p for _, _, p in traj])
        dist = float(np.sum(np.linalg.norm(np.diff(ps, axis=0), axis=1)))
        if dist < self.op.init_distance:
            return
        # build correspondences at fix times (covered is filtered in lockstep
        # so covered[k] <-> p_W[k] <-> itps[k] stay aligned)
        p_W, p_E, itps, kept = [], [], [], []
        st = system.state
        ext = np.asarray(st.gps_p[0]) if self.layout.n_gps > 0 else np.zeros(3)
        for t, p in covered:
            itp = self._interp_traj(system, t)
            if itp is None:
                continue
            s0, s1, lam = itp
            R_t, p_t = interpolate_pose_linear(
                st.clone_q[s0], st.clone_p[s0], st.clone_q[s1], st.clone_p[s1],
                lam,
            )
            p_W.append(np.asarray(p_t) + np.asarray(R_t).T @ ext)
            p_E.append(p)
            itps.append(itp)
            kept.append((t, p))
        covered = kept
        if len(p_W) < 3:
            return
        # robust initial guess: RANSAC over fix pairs, Horn refit on the
        # consensus set (MathGPS::Ransac_4Dof); outlier fixes are excluded
        # from the delayed-init linear system below
        R, t_al, yaw, rms, inl = ransac_4dof(
            np.asarray(p_W), np.asarray(p_E), thresh=3.0 * self.op.noise)
        if rms > 10.0 * self.op.noise or inl.sum() < 3:
            # decimate like the reference's failed-init path
            self.pending = self.pending[::2]
            return
        if inl.sum() < 0.5 * len(p_W):
            # weak consensus: wait for more fixes rather than commit a
            # possibly-wrong frame alignment
            return
        covered = [c for c, m in zip(covered, inl) if m]
        p_W = [p for p, m in zip(p_W, inl) if m]
        p_E = [p for p, m in zip(p_E, inl) if m]
        itps = [p for p, m in zip(itps, inl) if m]

        # --- delayed initialization of the 4-DoF transform (reference:
        # construct_init_linsys + StateHelper::initialize,
        # UpdaterGPS.cpp:338-455).  Model per fix:
        #   p_E = R_z(psi_hat + dpsi)(p_W + dp_W(dx)) + t_hat + dt + n
        # => r_i = p_E_i - (R_hat p_W_i + t_hat)
        #        = [ez x (R_hat p_W_i) | I3] [dpsi; dt] + R_hat dp_W_i + n ---
        lo = self.layout
        if lo.n_gps == 0:
            return  # no wtoe block allocated; cannot estimate the transform
        n_fix = len(p_W)
        ez = np.array([0.0, 0.0, 1.0])
        Hx = np.zeros((3 * n_fix, lo.dim))
        Hn = np.zeros((3 * n_fix, 4))
        r = np.zeros(3 * n_fix)
        ext_j = st.gps_p[0]
        for k, ((t, p_e), pw, (s0, s1, lam)) in enumerate(
                zip(covered, p_W, itps)):
            H12, _ = gps_linear_system(
                st.clone_q, st.clone_p, st.clone_q_fej, st.clone_p_fej,
                jnp.asarray(s0), jnp.asarray(s1), jnp.asarray(lam),
                ext_j, jnp.asarray(pw),
            )
            rows = slice(3 * k, 3 * k + 3)
            Hx[rows, lo.clone(s0) : lo.clone(s0) + 6] += R @ np.asarray(H12[:, 0:6])
            Hx[rows, lo.clone(s1) : lo.clone(s1) + 6] += R @ np.asarray(H12[:, 6:12])
            Hn[rows, 0] = np.cross(ez, R @ pw)
            Hn[rows, 1:4] = np.eye(3)
            r[rows] = p_e - (R @ pw + t_al)

        st = st.replace(wtoe_th=jnp.asarray(yaw, dtype=F64),
                        wtoe_p=jnp.asarray(t_al, dtype=F64))
        r_diag = jnp.full(3 * n_fix, self.op.noise**2, dtype=F64)
        new_cov, dx_full, dn, _, _, _ = ekf.delayed_init(
            st.cov, jnp.asarray(Hx), jnp.asarray(Hn), jnp.asarray(r), r_diag,
            lo.wtoe_off, 4)
        # sanity: reject a clearly broken alignment solve (reference:
        # StateHelper.cpp:567-574 suspicious-init rejection)
        if not (np.all(np.isfinite(np.asarray(dn)))
                and abs(float(dn[0])) < 0.5
                and float(np.linalg.norm(np.asarray(dn)[1:4])) < 10.0):
            self.pending = self.pending[::2]
            return
        st = ekf.apply_dx(st, dx_full).replace(cov=new_cov)
        # apply_dx already folded dx_full's wtoe component; add the
        # initialization value dn on top
        st = st.replace(wtoe_th=st.wtoe_th + dn[0], wtoe_p=st.wtoe_p + dn[1:4])
        yaw_f = float(st.wtoe_th)
        t_f = np.asarray(st.wtoe_p)
        c_, s_ = np.cos(yaw_f), np.sin(yaw_f)
        R_f = np.array([[c_, -s_, 0.0], [s_, c_, 0.0], [0.0, 0.0, 1.0]])
        # posterior transform covariance (pre-marginalization) for NEES checks
        self.init_trans_cov = np.asarray(
            st.cov[lo.wtoe_off : lo.wtoe_off + 4,
                   lo.wtoe_off : lo.wtoe_off + 4])

        # --- whole-state rotation into ENU + transform marginalization
        # (reference: transform_state_to_ENU, UpdaterGPS.cpp:457-516).
        # Non-xyz landmark representations do not rotate linearly — drop the
        # landmarks first (the reference marginalizes SLAM here regardless).
        if getattr(system, "feat_rep", 0) != 0:
            for slot in np.nonzero(np.asarray(st.slam_valid))[0]:
                st = ekf.marginalize_slam_slot(st, int(slot))
        system.state = transform_state_to_enu_marg_trans(st)
        # rotate the recorded trajectory too (it is now in ENU)
        system.traj = [
            (t_, np.asarray(lie.quat_multiply(
                jnp.asarray(q_), lie.rot_2_quat(jnp.asarray(R_f.T)))),
             R_f @ p_ + t_f)
            for t_, q_, p_ in system.traj
        ]
        self.align = (R_f, t_f, yaw_f, rms)
        self.initialized = True

    def _update_one(self, system, t, p_meas):
        itp = self._interp_traj(system, t)
        if itp is None:
            return
        s0, s1, lam = itp
        st = system.state
        lo = self.layout
        ext = st.gps_p[0] if lo.n_gps > 0 else jnp.zeros(3, dtype=F64)
        H12, res = gps_linear_system(
            st.clone_q, st.clone_p, st.clone_q_fej, st.clone_p_fej,
            jnp.asarray(s0), jnp.asarray(s1), jnp.asarray(lam),
            ext, jnp.asarray(p_meas),
        )
        H = np.zeros((3, lo.dim))
        H[:, lo.clone(s0) : lo.clone(s0) + 6] += np.asarray(H12[:, 0:6])
        H[:, lo.clone(s1) : lo.clone(s1) + 6] += np.asarray(H12[:, 6:12])
        H = jnp.asarray(H)
        r_diag = jnp.full(3, self.op.noise**2, dtype=F64)
        mask3 = jnp.ones(3, dtype=bool)
        chi = float(ekf.chi2(st.cov, H, res, r_diag, mask3))
        gate3 = float(self.chi2_table[3]) * self.op.chi2_mult
        if chi < gate3:
            system.state = ekf.update(st, H, res, r_diag, mask3)
            self.stats["accept"] += 1
            return
        # 2-D fallback: drop the z row (reference: UpdaterGPS.cpp:260-267)
        mask2 = jnp.asarray([True, True, False])
        chi2d = float(ekf.chi2(st.cov, H, res, r_diag, mask2))
        if chi2d < float(self.chi2_table[2]) * self.op.chi2_mult:
            system.state = ekf.update(st, H, res, r_diag, mask2)
            self.stats["fallback2d"] += 1
        else:
            self.stats["reject"] += 1
