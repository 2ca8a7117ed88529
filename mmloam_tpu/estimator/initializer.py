"""Gravity / velocity / bias MAP initialization.

Re-implements TryMAPInitialization (unionPoseEstimation.cpp:425-627) as a
small on-device Gauss-Newton solve:

  1. gravity direction seed from the averaged accelerometer of the first
     keyframe interval (:428-458; the Ceres problem_quat reduces to
     aligning exp(r)*(0,0,-g) with the measured average specific force),
  2. joint GN over theta = [r_wg(3), v_0..v_{K-1}(3K), ba(3), bg(3)] with
     the prior factors (sqrt infos 2000/1000/4000/4000, :512-538) and the
     9-dim preintegration factors Cost_Initialization_IMU
     (ceresfunc.h:654-740),
  3. sanity gates |ba|,|bg| < 0.5 and |v - prior_v| < 2 (:583-599).

Keyframe poses are LIDAR poses (the pre-init scan-matcher output); the
body-frame conversion via the extrinsic happens in the factor constants
exactly as the reference does (:544-556).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie


class InitResult(NamedTuple):
    ok: jnp.ndarray        # () bool — passed the sanity gates
    gravity: jnp.ndarray   # (3,) world gravity vector
    v: jnp.ndarray         # (K,3) body velocities per keyframe
    bg: jnp.ndarray        # (3,)
    ba: jnp.ndarray        # (3,)


def _gravity_seed(avg_acc, gnorm):
    """Rotation vector r with exp(r) @ (0,0,-gnorm) == avg_acc.

    Closed form of the reference's problem_quat (:444-458): rotate
    g_I=(0,0,-g) onto the (negated, renormalized) average accelerometer.
    """
    a = avg_acc / jnp.maximum(jnp.linalg.norm(avg_acc), 1e-9)
    g = jnp.array([0.0, 0.0, -1.0], avg_acc.dtype)
    axis = jnp.cross(g, a)
    s = jnp.linalg.norm(axis)
    c = jnp.dot(g, a)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-9)
    # degenerate when a ~ ±g: fall back to a fixed perpendicular axis
    axis = jnp.where(s < 1e-6, jnp.array([1.0, 0.0, 0.0], a.dtype), axis)
    return axis * angle


def _init_residuals(theta, consts):
    """Stacked residual vector of the init problem (all factors)."""
    K = consts["ri"].shape[0]
    r = theta[0:3]
    v = theta[3:3 + 3 * K].reshape(K, 3)
    ba = theta[3 + 3 * K: 6 + 3 * K]
    bg = theta[6 + 3 * K: 9 + 3 * K]
    g_I = jnp.array([0.0, 0.0, -consts["gnorm"]], theta.dtype)

    out = []
    # Cost_Initialization_Prior_R (ceresfunc.h:781-818).  The reference
    # pins the gravity rotation to the averaged-accelerometer seed with
    # sqrt-info 2000, which assumes a quasi-static start: initializing
    # during acceleration then bakes the acceleration into gravity (a 0.6
    # m/s^2 ramp tilts gravity 3.5 deg and velocity decays ever after).
    # The prior only needs to regularize the yaw-around-gravity null
    # direction; a weak weight lets the IMU pair factors (which see the
    # lidar-pose finite differences) separate acceleration from gravity.
    Rwg = lie.exp_matrix(r)
    prior_R = lie.exp_matrix(consts["prior_r"])
    out.append(consts["gravity_prior_w"] * lie.log_matrix(Rwg.T @ prior_R))
    # bias priors (ceresfunc.h:744-777)
    out.append(1000.0 * ba)
    out.append(4000.0 * bg)
    # velocity information from the lidar poses.  The reference pins each
    # ENDPOINT velocity to the interval-average finite difference
    # (prior_bv, :480-491) — exact only at constant velocity; during an
    # acceleration ramp the 4000-weight priors force the mismatch into the
    # gravity estimate instead.  The trapezoidal two-state form
    # (v_i + v_j)/2 == dpos/dt is exact under constant acceleration and
    # keeps the same information content; v[0] keeps a weak absolute prior
    # so the joint problem stays full-rank.
    dtp = consts["dt"][1:, None]
    v_mid = 0.5 * (v[:-1] + v[1:])
    fd = consts["dpos"][1:] / jnp.maximum(dtp, 1e-6)
    out.append((4000.0 * (v_mid - fd)).reshape(-1))
    out.append(40.0 * (v[0] - consts["prior_v"][0]))

    # IMU pair factors (ceresfunc.h:654-740), pairs (i-1, i)
    def pair(i):
        Ri = lie.exp_matrix(consts["ri"][i - 1])
        Rj = lie.exp_matrix(consts["ri"][i])
        RiT = Ri.T
        m = {k: consts[k][i] for k in ("dq", "dp", "dv", "jac", "dt")}
        dbg = bg - consts["meas_bg"][i]
        dba = ba - consts["meas_ba"][i]
        jac = m["jac"]
        dT = m["dt"]
        rP = RiT @ (consts["dpos"][i] - v[i - 1] * dT
                    - Rwg @ g_I * (0.5 * dT * dT)) - (
            m["dp"] + jac[0:3, 9:12] @ dbg + jac[0:3, 12:15] @ dba)
        dR_corr = lie.quat_mul(m["dq"], lie.exp_quat(jac[3:6, 9:12] @ dbg))
        rPhi = lie.log_matrix(lie.quat_to_matrix(lie.quat_conj(dR_corr))
                              @ RiT @ Rj)
        rV = RiT @ (v[i] - v[i - 1] - Rwg @ g_I * dT) - (
            m["dv"] + jac[6:9, 9:12] @ dbg + jac[6:9, 12:15] @ dba)
        return consts["sqrt_info9"][i] @ jnp.concatenate([rP, rPhi, rV])

    for i in range(1, K):
        out.append(pair(i))
    return jnp.concatenate(out)


def initialize(kf_P, kf_Q, avg_acc, preint9, gnorm, Rlb, tlb, iters: int = 20,
               gravity_prior_w: float = 20.0, bias_bound: float = 0.5,
               velocity_bound: float = 2.0):
    """Run the init solve over K keyframes.

    kf_P (K,3), kf_Q (K,4): LIDAR keyframe poses; avg_acc (3,): average
    specific force (world-scaled, from the first interval's integrator,
    negated per :428); preint9: dict of per-pair arrays (entry i = pair
    (i-1, i)): dq,dp,dv,jac,dt,cov,bg,ba; Rlb/tlb: body-from-...: the
    reference's exRlb/exPlb (lidar-to-body correction of lidar poses,
    :544-556).  Returns InitResult.
    """
    dtype = kf_P.dtype
    K = kf_P.shape[0]
    ts = None  # timestamps only enter through prior_v, passed via preint dt

    # body-frame keyframe constants (:544-556)
    Rwl = jax.vmap(lie.quat_to_matrix)(kf_Q)
    ri = jax.vmap(lambda R: lie.log_matrix(R @ Rlb))(Rwl)
    p_b = kf_P + jnp.einsum("kij,j->ki", Rwl, tlb)
    dpos = jnp.concatenate([jnp.zeros((1, 3), dtype), p_b[1:] - p_b[:-1]])

    # velocity priors from finite differences (:480-491)
    dt = preint9["dt"]
    v_fd = dpos[1:] / jnp.maximum(dt[1:, None], 1e-6)
    prior_v = jnp.concatenate([v_fd[:1], v_fd], axis=0)    # prior_v[0]=prior_v[1]

    prior_r = _gravity_seed(avg_acc, gnorm)

    # 9x9 sqrt info from the position/rotation/velocity covariance block
    def si9(cov):
        c = cov[0:9, 0:9] + jnp.eye(9, dtype=dtype) * 1e-10
        ci = jnp.linalg.inv(0.5 * (c + c.T))
        L = jnp.linalg.cholesky(0.5 * (ci + ci.T))
        return L.T

    sqrt_info9 = jax.vmap(si9)(preint9["cov"])

    consts = dict(ri=ri, dpos=dpos, prior_v=prior_v, prior_r=prior_r,
                  gravity_prior_w=gravity_prior_w,
                  gnorm=gnorm, dq=preint9["dq"], dp=preint9["dp"],
                  dv=preint9["dv"], jac=preint9["jac"], dt=dt,
                  meas_bg=preint9["bg"], meas_ba=preint9["ba"],
                  sqrt_info9=sqrt_info9)

    theta0 = jnp.concatenate([prior_r, prior_v.reshape(-1),
                              jnp.zeros(6, dtype)])

    def gn_step(theta, _):
        r = _init_residuals(theta, consts)
        J = jax.jacfwd(lambda th: _init_residuals(th, consts))(theta)
        H = J.T @ J
        g = J.T @ r
        d = jnp.diagonal(H)
        s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-10))
        A = H * s[:, None] * s[None, :] + 1e-6 * jnp.eye(H.shape[0], dtype=dtype)
        dx = s * jax.scipy.linalg.cho_solve(
            (jnp.linalg.cholesky(A), True), -(s * g))
        return theta + dx, None

    theta, _ = jax.lax.scan(gn_step, theta0, None, length=iters)

    r = theta[0:3]
    v = theta[3:3 + 3 * K].reshape(K, 3)
    ba = theta[3 + 3 * K: 6 + 3 * K]
    bg = theta[6 + 3 * K: 9 + 3 * K]
    gravity = lie.exp_matrix(r) @ jnp.array([0.0, 0.0, -gnorm], dtype)
    # sanity gates (unionPoseEstimation.cpp:583-599; bounds from
    # cfg.failsafe.init_bias_bound / init_velocity_bound)
    ok = ((jnp.linalg.norm(ba) <= bias_bound)
          & (jnp.linalg.norm(bg) <= bias_bound)
          & jnp.all(jnp.linalg.norm(v - prior_v, axis=-1) <= velocity_bound)
          & jnp.all(jnp.isfinite(theta)))
    return InitResult(ok=ok, gravity=gravity, v=v, bg=bg, ba=ba)


def refine_gravity(x, preint, pair_valid, gravity, gnorm, iters: int = 8,
                   prior_w: float = 50.0):
    """Online gravity re-refinement against the sliding window.

    The one-shot init estimates gravity from pre-init odometry poses; if
    the rig is accelerating during init those poses lag and a residual
    gravity tilt (~1 deg per 0.1 g of unmodelled acceleration) survives —
    which the window solver cannot fix because gravity is not a state.
    The tilt then bleeds velocity at g*sin(tilt) per second forever (the
    reference has the same blind spot, unionPoseEstimation.cpp:577 fixes
    GravityVector at init).  This pass re-solves [gravity tilt, window
    velocities] against the CURRENT window poses (lidar-pinned, far better
    than pre-init odometry) and the stored preintegrations; a weak prior
    anchors the yaw-around-gravity null direction to the current estimate.

    x: (W,15) window states; preint: the pipeline's stored per-pair dict
    (sqrt_info is the whitened 15-dim factor; bias deltas are zero here
    because biases stay at their current estimates, so only columns 0:9
    of it are exercised); pair_valid: (W,) bool.  Returns (gravity', v').
    """
    dtype = x.dtype
    W = x.shape[0]
    g_I = jnp.array([0.0, 0.0, -gnorm], dtype)
    r0 = _gravity_seed(gravity, gnorm)
    Ri = jax.vmap(lie.exp_matrix)(x[:, 3:6])

    def residuals(theta):
        r = theta[0:3]
        v = theta[3:].reshape(W, 3)
        Rwg = lie.exp_matrix(r)
        g_w = Rwg @ g_I
        out = [prior_w * (r - r0)]

        def pair(i):
            RiT = Ri[i - 1].T
            dT = preint["dt"][i]
            rP = RiT @ (x[i, 0:3] - x[i - 1, 0:3] - v[i - 1] * dT
                        - 0.5 * g_w * dT * dT) - preint["dp"][i]
            rel = lie.quat_to_matrix(
                lie.quat_conj(preint["dq"][i])) @ RiT @ Ri[i]
            rPhi = lie.log_matrix(rel)
            rV = RiT @ (v[i] - v[i - 1] - g_w * dT) - preint["dv"][i]
            r15 = jnp.concatenate([rP, rPhi, rV, jnp.zeros(6, dtype)])
            m = pair_valid[i].astype(dtype)
            return m * (preint["sqrt_info"][i] @ r15)

        for i in range(1, W):
            out.append(pair(i))
        return jnp.concatenate(out)

    theta0 = jnp.concatenate([r0, x[:, 6:9].reshape(-1)])

    def gn(theta, _):
        res = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        H = J.T @ J
        d = jnp.diagonal(H)
        s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-8))
        A = H * s[:, None] * s[None, :] + 1e-5 * jnp.eye(
            H.shape[0], dtype=dtype)
        dx = s * jnp.linalg.solve(A, -(s * (J.T @ res)))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return theta + dx, None

    theta, _ = jax.lax.scan(gn, theta0, None, length=iters)
    r = theta[0:3]
    v = theta[3:].reshape(W, 3)
    g_new = lie.exp_matrix(r) @ g_I
    ok = jnp.all(jnp.isfinite(theta))
    return (jnp.where(ok, g_new, gravity),
            jnp.where(ok, v, x[:, 6:9]))
