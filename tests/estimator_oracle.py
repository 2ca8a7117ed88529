"""Literal numpy transcription of the reference's association + point-factor
math, used ONLY as a test oracle (the parity pattern of
tests/feature_oracle.py; reference is MIT-licensed).

Transcribed semantics (f64 throughout):

* `line_assoc`   — Estimator::processPointToLine (Estimator.cpp:148-287):
  exact 5-NN, gate `sqdist[4] < thres_dist`, covariance /5, Eigen
  SelfAdjointEigenSolver (ascending), gate `e2 > 3*e1(mid)`, targets
  tripod1/2 = centroid ± 0.1 * principal direction.
* `plane_assoc`  — Estimator::processPointToPlanVec (Estimator.cpp:573-696):
  exact 5-NN, same distance gate, colPivHouseholderQr solve of
  ax+by+cz+1 = 0, normalization, planarity gate (every neighbor within
  0.2 m), proj = p - dist*omega, sqrt_info = (1/lidar_m) diag(1,wt,wt)
  R_svd^T with R_svd from the SVD of e1*omega^T.
* `line_residual`, `planvec_residual` — Cost_NavState_IMU_Line
  (ceresfunc.h:397-458) and Cost_NavState_IMU_Plan_Vec (:517-570),
  including the 1 - 0.9|d|/|P|^(1/2) reweighting (inner sqrt over the
  SQUARED norm) and the body->lidar extrinsic composition.
* `gn_step` — one Gauss-Newton iteration over a single 6-dof pose from
  the stacked line+plane factors (the direction Ceres' dogleg takes when
  inside the trust region), Jacobians by central differences in f64.
"""

from __future__ import annotations

import numpy as np

LIDAR_M = 1.5e-3


def so3_exp(phi):
    phi = np.asarray(phi, np.float64)
    th = np.linalg.norm(phi)
    K = np.array([[0.0, -phi[2], phi[1]],
                  [phi[2], 0.0, -phi[0]],
                  [-phi[1], phi[0], 0.0]])
    if th < 1e-12:
        return np.eye(3) + K
    return (np.eye(3) + np.sin(th) / th * K
            + (1.0 - np.cos(th)) / (th * th) * (K @ K))


def _nn5(map_pts, q):
    d2 = np.sum((map_pts - q[None, :]) ** 2, axis=1)
    idx = np.argsort(d2)[:5]
    return idx, d2[idx]


def line_assoc(map_pts, queries_w, thres_dist):
    """Per query: (valid, centroid (3,), unit direction (3,)).

    Estimator.cpp:189-277 — 5-NN, sqdist[4] < thres_dist, covariance
    (centered, /5), principal eigenvector, eigen gate e[2] > 3*e[1].
    """
    out = []
    for q in np.asarray(queries_w, np.float64):
        idx, d2 = _nn5(map_pts, q)
        if d2[4] >= thres_dist:
            out.append((False, np.zeros(3), np.zeros(3)))
            continue
        nb = map_pts[idx]
        c = nb.mean(axis=0)
        a = nb - c[None, :]
        cov = (a.T @ a) / 5.0
        w, v = np.linalg.eigh(cov)             # ascending, like Eigen
        if w[2] > 3.0 * w[1]:
            out.append((True, c, v[:, 2]))
        else:
            out.append((False, c, v[:, 2]))
    valid = np.array([o[0] for o in out])
    c = np.stack([o[1] for o in out])
    u = np.stack([o[2] for o in out])
    return valid, c, u


def plane_assoc(map_pts, queries_w, thres_dist, weight_tan):
    """Per query: (valid, proj (3,), omega (3,), sqrt_info (3,3)).

    Estimator.cpp:617-696 — QR solve of ax+by+cz+1=0 on the 5 neighbors,
    normalize, reject unless every neighbor within 0.2 m, project the
    query onto the plane, sqrt_info = (1/lidar_m) diag(1,wt,wt) R_svd^T.
    """
    outs = []
    for q in np.asarray(queries_w, np.float64):
        idx, d2 = _nn5(map_pts, q)
        if d2[4] >= thres_dist:
            outs.append((False, np.zeros(3), np.zeros(3), np.zeros((3, 3))))
            continue
        A = map_pts[idx]                                   # (5, 3)
        b = -np.ones(5)
        x, *_ = np.linalg.lstsq(A, b, rcond=None)          # colPivQr solve
        pa, pb, pc = x
        pd = 1.0
        ps = np.sqrt(pa * pa + pb * pb + pc * pc)
        pa, pb, pc, pd = pa / ps, pb / ps, pc / ps, pd / ps
        plane_ok = True
        for j in range(5):
            if abs(pa * A[j, 0] + pb * A[j, 1] + pc * A[j, 2] + pd) > 0.2:
                plane_ok = False
                break
        if not plane_ok:
            outs.append((False, np.zeros(3), np.zeros(3), np.zeros((3, 3))))
            continue
        dist = pa * q[0] + pb * q[1] + pc * q[2] + pd
        omega = np.array([pa, pb, pc])
        proj = q - dist * omega
        e1 = np.array([1.0, 0.0, 0.0])
        J = np.outer(e1, omega)
        U, _, Vt = np.linalg.svd(J)
        R_svd = Vt.T @ U.T
        info = (1.0 / LIDAR_M) * np.eye(3)
        info[1, 1] *= weight_tan
        info[2, 2] *= weight_tan
        sqrt_info = info @ R_svd.T
        outs.append((True, proj, omega, sqrt_info))
    valid = np.array([o[0] for o in outs])
    proj = np.stack([o[1] for o in outs])
    omega = np.stack([o[2] for o in outs])
    si = np.stack([o[3] for o in outs])
    return valid, proj, omega, si


def _pose_chain(pri, Rbl, tbl):
    """(R_wl, t_wl) from the 6-dim [t(3), so3 log(3)] body pose and the
    BODY<-LIDAR extrinsic (qbl/Pbl in the cost functors come from Tbl =
    exTlb^-1, i.e. body-from-lidar — ceresfunc.h:404-410)."""
    R_wb = so3_exp(pri[3:6])
    t_wb = np.asarray(pri[0:3], np.float64)
    R_wl = R_wb @ Rbl
    t_wl = R_wb @ tbl + t_wb
    return R_wl, t_wl


def line_residual(pri, point_l, c, u, Rbl, tbl):
    """Cost_NavState_IMU_Line::operator() (ceresfunc.h:412-441), with
    tripods lpa/lpb = c ± 0.1 u and sqrt_information = 1/lidar_m."""
    R_wl, t_wl = _pose_chain(pri, Rbl, tbl)
    P = R_wl @ np.asarray(point_l, np.float64) + t_wl
    lpa = c + 0.1 * u
    lpb = c - 0.1 * u
    l12 = np.linalg.norm(lpa - lpb)
    cxy = (P[0] - lpa[0]) * (P[1] - lpb[1]) - (P[0] - lpb[0]) * (P[1] - lpa[1])
    cxz = (P[0] - lpa[0]) * (P[2] - lpb[2]) - (P[0] - lpb[0]) * (P[2] - lpa[2])
    cyz = (P[1] - lpa[1]) * (P[2] - lpb[2]) - (P[1] - lpb[1]) * (P[2] - lpa[2])
    a012 = np.sqrt(cxy * cxy + cxz * cxz + cyz * cyz)
    ld2 = a012 / l12
    w = 1.0 - 0.9 * abs(ld2) / np.sqrt(np.sqrt(P @ P))
    return np.array([(1.0 / LIDAR_M) * w * ld2])


def planvec_residual(pri, point_l, proj, sqrt_info, Rbl, tbl):
    """Cost_NavState_IMU_Plan_Vec::operator() (ceresfunc.h:533-556)."""
    R_wl, t_wl = _pose_chain(pri, Rbl, tbl)
    P = R_wl @ np.asarray(point_l, np.float64) + t_wl
    r = P - proj
    w = 1.0 - 0.9 * np.linalg.norm(r) / np.sqrt(np.sqrt(P @ P))
    return sqrt_info @ (w * r)


def gn_step(pri, line_pts, line_c, line_u, plane_pts, plane_proj,
            plane_si, Rbl, tbl, eps=1e-6):
    """One Gauss-Newton step direction over the stacked point factors
    (central-difference Jacobians).  Returns (dx (6,), JtJ, Jtr)."""
    def stack(p):
        rs = [line_residual(p, line_pts[i], line_c[i], line_u[i], Rbl, tbl)
              for i in range(len(line_pts))]
        rs += [planvec_residual(p, plane_pts[i], plane_proj[i],
                                plane_si[i], Rbl, tbl)
               for i in range(len(plane_pts))]
        return np.concatenate(rs)

    r0 = stack(pri)
    J = np.zeros((r0.size, 6))
    for k in range(6):
        dp = np.zeros(6)
        dp[k] = eps
        J[:, k] = (stack(pri + dp) - stack(pri - dp)) / (2 * eps)
    JtJ = J.T @ J
    Jtr = J.T @ r0
    dx = np.linalg.solve(JtJ + 1e-9 * np.eye(6), -Jtr)
    return dx, JtJ, Jtr
