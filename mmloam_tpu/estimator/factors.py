"""Factor construction and residual evaluation for the sliding-window solver.

Re-implements the semantics of the reference's Ceres cost functions and
association routines as fixed-shape masked tensor ops:

  * line factors    — Estimator::processPointToLine (Estimator.cpp:148-363)
                      + Cost_NavState_IMU_Line (ceresfunc.h:397-458)
  * plane factors   — Estimator::processPointToPlanVec (Estimator.cpp:573-790)
                      + Cost_NavState_IMU_Plan_Vec (ceresfunc.h:517-570)
  * IMU factor      — Cost_NavState_PRV_Bias (ceresfunc.h:321-393)
  * localizability  — Estimator::checkLocalizability (Estimator.cpp:536-565)

Scaling convention: all residuals are expressed in units of the lidar noise
sigma `lidar_m` (the reference multiplies point residuals by
1/lidar_m ~ 667 and IMU residuals by chol(cov^-1)^T; we divide the whole
cost by 1/lidar_m^2, which leaves the optimum unchanged and keeps every
number O(1)-O(100) so the f32 normal equations stay well conditioned on
TPU).  The Huber delta 0.1/lidar_m (Estimator.cpp:1216) becomes 0.1.

State layout per frame (15,): [P(0:3), phi=log R (3:6), V(6:9), bg(9:12),
ba(12:15)] — matching para_PR/para_VBias (Estimator.h:284-285).  Like the
reference (no LocalParameterization on para_PR), phi is optimized as a
plain global 3-vector, so parameter updates are ordinary addition.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from ..ops import linalg3, voxelmap


class LineTargets(NamedTuple):
    """Cached corner-factor data (reference FeatureLine, Estimator.h:59-85)."""

    p_l: jnp.ndarray      # (K,3) point in lidar frame
    c: jnp.ndarray        # (K,3) line centroid (world)
    u: jnp.ndarray        # (K,3) unit line direction (world)
    valid: jnp.ndarray    # (K,) bool


class PlaneTargets(NamedTuple):
    """Cached surf-factor data (reference FeaturePlanVec, Estimator.h:107-124)."""

    p_l: jnp.ndarray        # (K,3)
    proj: jnp.ndarray       # (K,3) projection of the point onto the plane (world)
    sqrt_info: jnp.ndarray  # (K,3,3) scaled information sqrt (unit: lidar_m)
    valid: jnp.ndarray      # (K,) bool


class StackBlocks(NamedTuple):
    """One stack's PERSISTENT-map dense candidate blocks, cached for reuse
    across the estimator's outer rounds (the map is immutable within one
    scan and poses move millimeters between rounds, so the round-0 stencil
    rows stay valid — voxelmap.shift_dense_blocks re-expresses the offsets
    at the moved pose with zero new gathers).  pw0 is the query world
    position the offsets are relative to; the dense arrays are exactly
    `query_candidates_dense` outputs."""

    pw0: jnp.ndarray   # (M,3) f32 query positions at gather time
    dxd: jnp.ndarray   # (M,C) storage dtype
    dyd: jnp.ndarray
    dzd: jnp.ndarray
    d2d: jnp.ndarray   # +inf at invalid lanes (validity carrier)


def pose_wl(x6, Rbl, tbl):
    """World-from-lidar transform for state x6 (world-from-body P, phi)."""
    Rwb = lie.exp_matrix(x6[3:6])
    Rwl = Rwb @ Rbl
    twl = Rwb @ tbl + x6[0:3]
    return Rwl, twl


def _world_points(x6, p_l, Rbl, tbl):
    Rwl, twl = pose_wl(x6, Rbl, tbl)
    return p_l @ Rwl.T + twl


# --------------------------------------------------------------------------
# association (builds fixed targets at the current pose, once per scan)
# --------------------------------------------------------------------------

def _rescue_cap(M, frac):
    """Static local-rescue buffer size: ceil(M * frac) rounded up to 128."""
    mr = int(M * frac + 0.999)
    return min(M, max(128, (mr + 127) // 128 * 128))


def _compact_indices(fail, Mr):
    """Indices of the first Mr True entries of `fail` (M,), padded with M.

    One cumsum + one small scatter — the prefix-compaction idiom (same as
    ops/downsample's slot compaction).  Returns sel (Mr,) int32.
    """
    M = fail.shape[0]
    pos = jnp.cumsum(fail.astype(jnp.int32)) - 1
    dst = jnp.where(fail & (pos < Mr), pos, Mr)
    sel = jnp.full((Mr,), M, jnp.int32).at[dst].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")
    return sel


def _neighbor_moments(vm, pw, mask, mcfg, knn, cached: StackBlocks = None):
    """k-nearest selection + first/second moments of (centroid - query).

    Returns (t_k, n, s1 (M,3), s2 (M,3,3), blk, blocks) with blk = (dxd,
    dyd, dzd, wf), the DENSE (M, C) candidate offsets and the 0/1
    selection mask (kept live for the per-candidate planarity gate — see
    _plane_fit), and blocks a StackBlocks snapshot for cross-round reuse.
    The candidate pipeline runs entirely on dense blocks
    (voxelmap.query_candidates_dense): the padded (M, S, cpr) tile forms
    of the per-superrow unpack cost 4x their logical bytes per pass.
    The 9 moments + count are 10 multiply-reduces over the dense blocks
    — XLA sibling-fuses reductions sharing inputs, and this measures
    1.55 ms FASTER per flagship surf call than the batched (M,4,C)x
    (M,4,C) einsum alternative, whose tiny 4x4-output matmuls strand
    the MXU (measured both, scripts/xla_assoc_split.py harness).

    `cached` short-circuits the row gather entirely: the dense blocks are
    re-expressed at the moved query positions (shift_dense_blocks) and
    selection/fits run fresh on them — the gather-free re-association
    used by the estimator's outer rounds.

    Validity rides d2d = inf: when fewer than k valid candidates exist,
    t_k = inf and wf selects every lane (n = C), but the downstream
    `t_k < thres_dist` gate rejects exactly those points (same final
    validity as the old explicit ok-mask, asserted by the archived-kernel
    equivalence test, tests/test_pallas_assoc.py).
    """
    if cached is None:
        dxd, dyd, dzd, d2d = voxelmap.query_candidates_dense(vm, pw, mask,
                                                             mcfg)
        blocks = StackBlocks(pw, dxd, dyd, dzd, d2d)
    else:
        dxd, dyd, dzd, d2d = voxelmap.shift_dense_blocks(
            (cached.dxd, cached.dyd, cached.dzd, cached.d2d),
            pw - cached.pw0, mcfg)
        blocks = cached
    # selection runs in the blocks' storage dtype (bf16 when
    # cfg.dense_bf16 — both compare operands quantized identically, so
    # tie-inclusive semantics hold); moment ACCUMULATION upcasts to f32
    # in-register, so fit math is f32 regardless
    t_k = voxelmap.kth_smallest_dense(d2d, knn)
    # starved rows (t_k = inf) select EVERY lane here, so their moments
    # are garbage-by-design — the `t_k < thres_dist` gate in every
    # consumer (_line_fit/_plane_fit `have5`) rejects exactly those rows
    wf = (d2d <= t_k[:, None]).astype(pw.dtype)
    dxf, dyf, dzf = (a.astype(pw.dtype) for a in (dxd, dyd, dzd))
    red = lambda a: jnp.sum(a, axis=1)
    wx, wy, wz = dxf * wf, dyf * wf, dzf * wf
    s1 = jnp.stack([red(wx), red(wy), red(wz)], axis=-1)
    sxx, syy, szz = red(wx * dxf), red(wy * dyf), red(wz * dzf)
    sxy, sxz, syz = red(wx * dyf), red(wx * dzf), red(wy * dzf)
    s2 = jnp.stack([
        jnp.stack([sxx, sxy, sxz], axis=-1),
        jnp.stack([sxy, syy, syz], axis=-1),
        jnp.stack([sxz, syz, szz], axis=-1)], axis=-2)
    n = red(wf)
    return t_k.astype(pw.dtype), n, s1, s2, (dxf, dyf, dzf, wf), blocks


def _line_fit(pw, mask, t_k, n, s1, s2, thres_dist, k):
    """PCA line fit + gates from one map's neighbor moments.

    Returns (c, u, valid): 5th-NN sq-distance < thres_dist, largest
    eigenvalue > 3x middle (Estimator.cpp:189-277), association-time
    geometric error > 1e-5 (:1311-1317 via FeatureLine::ComputeError).
    """
    have5 = (n >= k) & (t_k < thres_dist)
    nf = jnp.maximum(n, 1).astype(pw.dtype)

    mu = s1 / nf[:, None]                         # centroid - query
    cov = s2 / nf[:, None, None] - mu[:, None, :] * mu[:, :, None]
    evals = linalg3.eigvalsh3(cov)               # ascending, closed form
    u = linalg3.principal_eigvec3(cov, evals)
    line_like = evals[:, 2] > 3.0 * evals[:, 1]

    c = pw + mu
    err0 = jnp.linalg.norm(jnp.cross(-mu, u), axis=-1)
    valid = mask & have5 & line_like & (err0 > 1e-5)
    return c, u, valid


def associate_lines(x6, p_l, mask, vm, Rbl, tbl, cfg, thres_dist,
                    vm_local=None, cached=None, with_blocks=False):
    """Corner association: 5-NN -> PCA line fit -> eigenvalue gate.

    Mirrors Estimator.cpp:189-277: 5th-NN sq-distance < thres_dist (the
    shared member-variable schedule), largest eigenvalue > 3x middle,
    line = centroid +- direction.  Fits are computed from query-relative
    neighbor moments (|offset| <= stencil reach, so the f32 central-moment
    subtraction is cancellation-safe).

    `vm_local` adds the reference's second matching tier — the kd-tree
    over the fine-leaf recent-history local map (Estimator.cpp:283-360,
    MapIncrementLocal :1585-1643): a point whose PERSISTENT-map
    association fails — too few neighbors inside `thres_dist`, or a
    neighbor set that fails the line-likeness gate (coarse 0.4 m
    centroids of a thin structure are often near-collinear or
    near-isotropic where the fine map's cells resolve the geometry) —
    takes its fit from the local map instead.  Both fits are computed
    from already-gathered moment blocks, so the fallback is a per-point
    select, fully fused.

    `cached`/`with_blocks`: persistent-tier StackBlocks reuse across the
    estimator's outer rounds (see _neighbor_moments); the local rescue
    tier always gathers fresh (its compacted query set changes per round
    and is small).  Returns (targets, blocks) when with_blocks.
    """
    pw = _world_points(x6, p_l, Rbl, tbl)
    k = cfg.map.knn
    M = pw.shape[0]

    def one_map_sub(vmi, mcfg, pwq, maskq, cac=None):
        t_k, n, s1, s2, _, blo = _neighbor_moments(vmi, pwq, maskq, mcfg, k,
                                                   cached=cac)
        return _line_fit(pwq, maskq, t_k, n, s1, s2, thres_dist, k) + (blo,)

    c, u, valid, blocks = one_map_sub(vm, cfg.map, pw, mask, cached)
    if vm_local is not None:
        frac = cfg.solver.local_rescue_frac
        Mr = _rescue_cap(M, frac)
        if Mr >= M:
            c2, u2, valid2, _ = one_map_sub(vm_local, cfg.local_map, pw,
                                            mask)
            use2 = (~valid & valid2)[:, None]
            c = jnp.where(use2, c2, c)
            u = jnp.where(use2, u2, u)
            valid = valid | valid2
        else:
            # conditional rescue: the local tier's stencil rows are
            # gathered ONLY for points whose persistent fit failed,
            # compacted to a fixed Mr buffer (the row gather dominates
            # association cost; steady-state failure rates are far below
            # frac, so the cap only binds during the first scans, where
            # Mr rescued factors already over-constrain the 6-DoF pose)
            sel = _compact_indices(mask & ~valid, Mr)
            pw_r = pw.at[sel].get(mode="fill", fill_value=0.0)
            mask_r = sel < M
            c2, u2, valid2, _ = one_map_sub(vm_local, cfg.local_map, pw_r,
                                            mask_r)
            sel_ok = jnp.where(valid2, sel, M)
            c = c.at[sel_ok].set(c2, mode="drop")
            u = u.at[sel_ok].set(u2, mode="drop")
            valid = valid.at[sel_ok].set(True, mode="drop")
    lt = LineTargets(p_l=p_l, c=c, u=u, valid=valid)
    return (lt, blocks) if with_blocks else lt


def _plane_basis(omega):
    """Orthonormal basis with first row = omega (rows: normal, 2 tangents).

    Equivalent to the reference's R_svd^T from the SVD of e1*omega^T
    (Estimator.cpp:678-684) up to tangent-frame rotation and signs, which
    the isotropic tangent weights make irrelevant.
    """
    # pick the axis least aligned with omega as seed
    ax = jnp.abs(omega)
    seed = jnp.where((ax[0] <= ax[1]) & (ax[0] <= ax[2]),
                     jnp.array([1.0, 0.0, 0.0], omega.dtype),
                     jnp.where(ax[1] <= ax[2],
                               jnp.array([0.0, 1.0, 0.0], omega.dtype),
                               jnp.array([0.0, 0.0, 1.0], omega.dtype)))
    t1 = jnp.cross(omega, seed)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(omega, t1)
    return jnp.stack([omega, t1, t2], axis=0)   # (3,3), rows


def _plane_fit(pw, mask, t_k, n, s1, s2, blk, thres_dist, k, cfg):
    """Total-LS plane fit + gates from one map's neighbor moments.

    Returns (proj, omega, valid).  Gates: 5th-NN sq-distance <
    thres_dist, every selected neighbor within 0.2 m of the fitted plane
    (Estimator.cpp:617-696), scatter-rank (cfg.solver.plane_scatter_ratio),
    association-time error > 1e-5.  `blk` is the dense (M, C) candidate
    block (dxd, dyd, dzd, wf) from _neighbor_moments.
    """
    have5 = (n >= k) & (t_k < thres_dist)
    nf = jnp.maximum(n, 1).astype(pw.dtype)

    # Total-LS plane through the neighbor centroid: normal = smallest
    # eigenvector of the CENTERED second moment (query-relative, so every
    # term is O(stencil reach) and f32-exact).  Deviation from the
    # reference's colPivHouseholderQr fit of ax+by+cz+1=0 on ABSOLUTE
    # coordinates (Estimator.cpp:617-640, f64 there): that form is
    # coordinate-dependent — in f32 the n·q·qᵀ terms reach ~1e4 at 100 m
    # world coords and their cancellation noise tilts fitted normals by
    # ~1e-2, which both corrupts factors and (worse) injects phantom
    # localizability: a featureless corridor read sv_x ≈ 4 > the 3.0
    # degeneracy gate purely from fit noise.  The centered fit is also
    # well-defined for planes through the world origin, which ax+by+cz+1
    # cannot represent.
    mu = s1 / nf[:, None]                          # centroid - query
    scov = s2 - nf[:, None, None] * mu[:, None, :] * mu[:, :, None]
    sev = linalg3.eigvalsh3(scov)
    omega = linalg3.smallest_eigvec3(scov, sev)
    dist = -jnp.einsum("kj,kj->k", omega, mu)      # signed query-to-plane

    # planarity gate: every SELECTED neighbor within 0.2 m of the fitted
    # plane.  Per-candidate deviation over the DENSE candidate block:
    # (d_c - mu)·ω = dx ωx + dy ωy + dz ωz - mu·ω, masked by the
    # selection (wf zeroes unselected candidates; |0| <= 0.2 passes) —
    # one fused max-reduce pass over the dense blocks
    dxd, dyd, dzd, wf = blk
    dev = wf * (dxd * omega[:, 0, None] + dyd * omega[:, 1, None]
                + dzd * omega[:, 2, None] + dist[:, None])
    planar = jnp.max(jnp.abs(dev), axis=1) <= 0.2
    # scatter-rank gate: a near-collinear neighbor set fits "a plane"
    # with an arbitrary normal — reject it (cfg.solver.plane_scatter_ratio;
    # improvement over the reference, see config docstring)
    if cfg.solver.plane_scatter_ratio > 0:
        planar = planar & (sev[:, 1] >
                           cfg.solver.plane_scatter_ratio * sev[:, 2])

    proj = pw - dist[:, None] * omega

    err0 = jnp.abs(dist)
    valid = mask & have5 & planar & (err0 > 1e-5)
    return proj, omega, valid


def associate_planes(x6, p_l, mask, vm, Rbl, tbl, cfg, thres_dist,
                     weight_tan, vm_local=None, cached=None,
                     with_blocks=False):
    """Surf association: 5-NN -> LS plane fit -> flatness gate.

    Mirrors Estimator.cpp:617-696: plane fitted to the 5 neighbors,
    rejected unless all are within 0.2 m; residual target is the
    projected point; the 3x3 sqrt-information weights the normal direction
    with 1 and the tangents with `plan_weight_tan` (units of lidar_m here).
    Returns (PlaneTargets, normals (K,3), normal_valid (K,)).

    `vm_local` adds the reference's second matching tier (the kd-tree over
    the fine-leaf recent-history local map, Estimator.cpp:283-360 +
    MapIncrementLocal :1585-1643): a point whose persistent-map
    association FAILS — neighbor starvation inside `thres_dist`, or a
    neighborhood failing the planarity/scatter gates (coarse centroids of
    small structure fit badly where fine cells resolve it) — takes its
    fit from the local map instead.
    """
    pw = _world_points(x6, p_l, Rbl, tbl)
    k = cfg.map.knn
    M = pw.shape[0]

    def one_map_sub(vmi, mcfg, pwq, maskq, cac=None):
        t_k, n, s1, s2, blk, blo = _neighbor_moments(vmi, pwq, maskq, mcfg,
                                                     k, cached=cac)
        return _plane_fit(pwq, maskq, t_k, n, s1, s2, blk, thres_dist, k,
                          cfg) + (blo,)

    proj, omega, valid, blocks = one_map_sub(vm, cfg.map, pw, mask, cached)
    if vm_local is not None:
        frac = cfg.solver.local_rescue_frac
        Mr = _rescue_cap(M, frac)
        if Mr >= M:
            proj2, omega2, valid2, _ = one_map_sub(vm_local, cfg.local_map,
                                                   pw, mask)
            use2 = ~valid & valid2
            proj = jnp.where(use2[:, None], proj2, proj)
            omega = jnp.where(use2[:, None], omega2, omega)
            valid = valid | valid2
        else:
            # conditional rescue (see associate_lines): local-tier rows
            # gathered only for the compacted persistent-fit failures
            sel = _compact_indices(mask & ~valid, Mr)
            pw_r = pw.at[sel].get(mode="fill", fill_value=0.0)
            mask_r = sel < M
            proj2, omega2, valid2, _ = one_map_sub(vm_local, cfg.local_map,
                                                   pw_r, mask_r)
            sel_ok = jnp.where(valid2, sel, M)
            proj = proj.at[sel_ok].set(proj2, mode="drop")
            omega = omega.at[sel_ok].set(omega2, mode="drop")
            valid = valid.at[sel_ok].set(True, mode="drop")

    basis = jax.vmap(_plane_basis)(omega)         # (K,3,3)
    w = jnp.array([1.0, weight_tan, weight_tan], pw.dtype)
    sqrt_info = w[None, :, None] * basis

    pt = PlaneTargets(p_l=p_l, proj=proj, sqrt_info=sqrt_info, valid=valid)
    return (pt, omega, valid, blocks) if with_blocks else (pt, omega, valid)


def localizability_ntn(NtN, n, cfg):
    """checkLocalizability from a precomputed normal Gram matrix.

    Mirrors Estimator.cpp:536-565: sv_min of the Nx3 normal matrix (==
    sqrt of NtN's smallest eigenvalue); < degenerate threshold (3.0) =>
    degenerate; < 2.0 or fewer than min_plane_normals (10) normals =>
    failure.  Returns (is_degenerate, fail_detected, sv_min).
    """
    evals = linalg3.eigvalsh3(NtN)
    sv_min = jnp.sqrt(jnp.maximum(evals[0], 0.0))
    too_few = n <= cfg.solver.min_plane_normals
    degenerate = (sv_min < 3.0) | too_few
    fail = (sv_min < cfg.solver.degenerate_sv) | too_few
    return degenerate, fail, jnp.where(too_few, -1.0, sv_min)


def localizability(normals, valid, cfg):
    """Min singular value of stacked plane normals (localizability_ntn
    over Σ ω ωᵀ) — kept for per-point callers and tests."""
    m = valid.astype(normals.dtype)
    NtN = jnp.einsum("ki,kj->ij", normals * m[:, None], normals * m[:, None])
    return localizability_ntn(NtN, jnp.sum(valid), cfg)


# --------------------------------------------------------------------------
# residuals (evaluated every solver iteration at the live state)
# --------------------------------------------------------------------------

def _safe_norm(v, eps=1e-12):
    """|v| with a finite gradient at v = 0.

    jnp.linalg.norm's gradient is NaN at the origin; a residual passing
    exactly through zero (point on its target line/plane) then poisons the
    whole normal-equation assembly via one NaN Jacobian row — and the LM
    loop silently rejects every subsequent step.
    """
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def line_residual(x6, tgt: LineTargets, Rbl, tbl):
    """Point-to-line residuals (K,) in lidar_m units.

    Cost_NavState_IMU_Line (ceresfunc.h:415-441): distance to the line,
    reweighted by 1 - 0.9|d|/sqrt(|P|).
    """
    pw = _world_points(x6, tgt.p_l, Rbl, tbl)
    d = _safe_norm(jnp.cross(pw - tgt.c, tgt.u))
    # reference weight: 1 - 0.9|d| / sqrt(sqrt(|P|^2)) == .. / |P|^(1/2)
    # (ceresfunc.h:433-437 — the inner sqrt is over the SQUARED norm)
    pn = jnp.maximum(jnp.linalg.norm(pw, axis=-1), 1e-6)
    w = 1.0 - 0.9 * jnp.abs(d) / jnp.sqrt(pn)
    return jnp.where(tgt.valid, w * d, 0.0)


def plane_residual(x6, tgt: PlaneTargets, Rbl, tbl):
    """Projected-point plane residuals (K,3) in lidar_m units.

    Cost_NavState_IMU_Plan_Vec (ceresfunc.h:536-556).
    """
    pw = _world_points(x6, tgt.p_l, Rbl, tbl)
    r0 = pw - tgt.proj
    # weight denominator |P|^(1/2), as in ceresfunc.h:550-554 (inner sqrt
    # is over the squared norm)
    pn = jnp.maximum(jnp.linalg.norm(pw, axis=-1), 1e-6)
    w = 1.0 - 0.9 * _safe_norm(r0) / jnp.sqrt(pn)
    r = jnp.einsum("kij,kj->ki", tgt.sqrt_info, w[:, None] * r0)
    return jnp.where(tgt.valid[:, None], r, 0.0)


def imu_residual(xi, xj, meas, gravity):
    """15-dim preintegration residual (Cost_NavState_PRV_Bias,
    ceresfunc.h:330-375), already left-multiplied by the scaled sqrt-info.

    `meas` is a dict with dq/dp/dv (preintegrated deltas), jac (15,15 bias
    Jacobian), sqrt_info (15,15 scaled), dt, bg/ba (linearization biases).
    """
    Pi, phii, Vi = xi[0:3], xi[3:6], xi[6:9]
    Pj, phij, Vj = xj[0:3], xj[3:6], xj[6:9]
    dbg = xi[9:12] - meas["bg"]
    dba = xi[12:15] - meas["ba"]

    Ri = lie.exp_matrix(phii)
    Rj = lie.exp_matrix(phij)
    dt = meas["dt"]
    dt2 = dt * dt
    jac = meas["jac"]
    J_p_bg, J_p_ba = jac[0:3, 9:12], jac[0:3, 12:15]
    J_r_bg = jac[3:6, 9:12]
    J_v_bg, J_v_ba = jac[6:9, 9:12], jac[6:9, 12:15]

    RiT = Ri.T
    rP = RiT @ (Pj - Pi - Vi * dt - 0.5 * gravity * dt2) - (
        meas["dp"] + J_p_bg @ dbg + J_p_ba @ dba)
    dR_corr = lie.quat_mul(meas["dq"], lie.exp_quat(J_r_bg @ dbg))
    rel = lie.quat_to_matrix(lie.quat_conj(dR_corr)) @ RiT @ Rj
    rPhi = lie.log_matrix(rel)
    rV = RiT @ (Vj - Vi - gravity * dt) - (
        meas["dv"] + J_v_bg @ dbg + J_v_ba @ dba)
    r = jnp.concatenate([rP, rPhi, rV, xj[9:15] - xi[9:15]])
    return meas["sqrt_info"] @ r


def imu_residual_and_jac(xi, xj, meas, gravity):
    """Preintegration residual AND its analytic (15, 30) Jacobian.

    Replaces `jacfwd(imu_residual)` in the LM inner loop: forward-mode
    autodiff pays ~30 residual evaluations per factor per iteration; the
    closed forms below cost ~3.  Columns: [Pi, phii, Vi, bgi, bai,
    Pj, phij, Vj, bgj, baj].  Derivatives are with respect to the GLOBAL
    log-map coordinates the solver optimizes (plain additive phi), via
    Exp(phi + d) = Exp(phi) Exp(Jr(phi) d) — the same quantity
    `jacfwd` computes through `lie.exp_matrix` (asserted equal in
    tests/test_solver.py::test_imu_analytic_jacobian).  The reference's
    analytic variant is Cost_NavState_PRV_Bias::Evaluate
    (ceresfunc.h:330-393); the bias-correction second-order terms it also
    drops are dropped here identically.
    """
    dtype = xi.dtype
    Pi, phii, Vi = xi[0:3], xi[3:6], xi[6:9]
    Pj, phij, Vj = xj[0:3], xj[3:6], xj[6:9]
    dbg = xi[9:12] - meas["bg"]
    dba = xi[12:15] - meas["ba"]

    Ri = lie.exp_matrix(phii)
    Rj = lie.exp_matrix(phij)
    RiT = Ri.T
    dt = meas["dt"]
    dt2 = dt * dt
    jac = meas["jac"]
    J_p_bg, J_p_ba = jac[0:3, 9:12], jac[0:3, 12:15]
    J_r_bg = jac[3:6, 9:12]
    J_v_bg, J_v_ba = jac[6:9, 9:12], jac[6:9, 12:15]

    u_p = Pj - Pi - Vi * dt - 0.5 * gravity * dt2
    rP = RiT @ u_p - (meas["dp"] + J_p_bg @ dbg + J_p_ba @ dba)
    eps = J_r_bg @ dbg
    dR_corr = lie.quat_mul(meas["dq"], lie.exp_quat(eps))
    M = lie.quat_to_matrix(lie.quat_conj(dR_corr)) @ RiT @ Rj
    rPhi = lie.log_matrix(M)
    u_v = Vj - Vi - gravity * dt
    rV = RiT @ u_v - (meas["dv"] + J_v_bg @ dbg + J_v_ba @ dba)
    r_raw = jnp.concatenate([rP, rPhi, rV, xj[9:15] - xi[9:15]])

    Jr_i = lie.right_jacobian(phii)
    Jr_j = lie.right_jacobian(phij)
    Jinv = lie.right_jacobian_inv(rPhi)
    Z3 = jnp.zeros((3, 3), dtype)
    I6 = jnp.eye(6, dtype=dtype)
    Z69 = jnp.zeros((6, 9), dtype)

    # J built by block concatenation (columns: Pi phii Vi bgi bai | Pj
    # phij Vj bgj baj).  The former .at[].set chain lowered to 12
    # dynamic-update-slices PER FACTOR PER LM ITERATION — measured ~170 ms
    # of pure DUS in the flagship solver loop; concatenation folds into
    # the surrounding fusions.
    # rP rows
    rowP = jnp.concatenate(
        [-RiT, lie.hat(RiT @ u_p) @ Jr_i, -RiT * dt, -J_p_bg, -J_p_ba,
         RiT, Z3, Z3, Z3, Z3], axis=1)
    # rPhi rows: M(phii + d) = M Exp(-(Rj^T Ri Jr_i) d),
    # M(phij + d) = M Exp(Jr_j d), M(bgi + d) = Exp(-(Jr(eps) J_r_bg) d) M
    rowR = jnp.concatenate(
        [Z3, -Jinv @ Rj.T @ Ri @ Jr_i, Z3,
         -Jinv @ M.T @ lie.right_jacobian(eps) @ J_r_bg, Z3,
         Z3, Jinv @ Jr_j, Z3, Z3, Z3], axis=1)
    # rV rows
    rowV = jnp.concatenate(
        [Z3, lie.hat(RiT @ u_v) @ Jr_i, -RiT, -J_v_bg, -J_v_ba,
         Z3, Z3, RiT, Z3, Z3], axis=1)
    # bias random-walk rows
    rowB = jnp.concatenate([Z69, -I6, Z69, I6], axis=1)
    J = jnp.concatenate([rowP, rowR, rowV, rowB], axis=0)

    S = meas["sqrt_info"]
    return S @ r_raw, S @ J


def prior_residual(x0_kept, prior):
    """Marginalization prior replay (MarginalizationFactor::Evaluate,
    ceresfunc.h:280-314): r = lin_r + lin_J (x - x_lin)."""
    return prior.lin_r + prior.lin_J @ (x0_kept - prior.x0)


def huber_weight(r_block_sq, delta):
    """sqrt(rho'(s)) for Ceres HuberLoss(delta) applied per residual block."""
    s = jnp.maximum(r_block_sq, 1e-20)
    return jnp.where(s <= delta * delta, 1.0, jnp.sqrt(delta / jnp.sqrt(s)))
