"""Reduced (moment-compressed) point-factor blocks for the window solver.

The reference evaluates every point factor's residual + Jacobian at every
Ceres iteration (Estimator.cpp:1304-1374 builds the cached
vLineFeatures/vPlanFeatures once per outer round; Ceres then re-evaluates
each `Cost_NavState_IMU_Line` / `Cost_NavState_IMU_Plan_Vec` autodiff
functor per inner iteration).  On TPU that per-iteration sweep over
K ≈ 2.5k points × W frames inside a `lax.while_loop` dominates the step
program — it is serial work the MXU cannot amortize.

This module compresses each frame's point-factor set into an exact
quadratic form ONCE per association, so the LM inner loop touches O(150)
numbers per frame instead of O(K):

With per-point robust/reweight factors frozen at association time, every
point factor (line or plane) has the form

    r_k = S_k (R a_k + P' - q'_k),     a_k = Rbl p_k + tbl  (constant),

linear in z = [vec(R) (9, col-major), P' (3)] (P' = P - o, q' = q - o with
o the association-time frame position — recentering keeps f32 exact).
Therefore the TOTAL cost/gradient/GN-Hessian over a frame's K factors is
an exact quadratic in z:

    0.5 Σ|r_k|² = 0.5 (c0 + 2 g0·dz + dz·Q·dz),   dz = z - z0,
    Q  = Σ B_kᵀ B_k          (12×12),   B_k = ∂r_k/∂z,
    g0 = Σ B_kᵀ r_k(z0)      (12,),
    c0 = Σ |r_k(z0)|²        (),

expanded around the association pose z0 (residuals there are small, so the
expansion is cancellation-safe; the form itself is EXACT for any pose, not
a linearization — r is linear in z).  Each LM iteration then needs only
the 12×6 chain rule Z = ∂z/∂[P, phi] (built from R and the SO(3) right
Jacobian) to produce the same H6/b6/cost the per-point sweep would:

    H6 = Zᵀ Q Z,   b6 = Zᵀ (g0 + Q dz),   cost = 0.5 (c0 + 2 g0·dz + dz·Q·dz).

Weight freezing (the one deviation from per-iteration evaluation): the
distance reweight 1 - 0.9|d|/|pw|^(1/4) (ceresfunc.h:426,549) and the
short-window Huber weights are evaluated at the association pose and
folded into S_k, i.e. iteratively-reweighted least squares at
re-association granularity instead of per inner iteration.  Poses move
millimeters between re-associations, so the weight drift is O(1e-4)
relative; the reference's own outer loop re-linearizes associations the
same way.

Line factors are expressed in the equivalent 3-dim projected form
r = w (I - u uᵀ)(pw - c) whose squared norm equals the reference's 1-dim
point-to-line distance d² exactly (the projector is its own sqrt); the GN
Hessian differs from the 1-dim form's rank-1 JᵀJ only in curvature along
the in-plane direction perpendicular to the current residual, which is a
better-conditioned model of the same cost surface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from ..ops import linalg3, voxelmap
from . import factors


class ReducedFactor(NamedTuple):
    """One frame's point factors as an exact quadratic in z = [vecR, P-o].

    All fields broadcast over leading batch axes (the window axis W).
    """

    Q: jnp.ndarray      # (12,12)  Σ BᵀB
    g0: jnp.ndarray     # (12,)    Σ Bᵀ r(z0)
    c0: jnp.ndarray     # ()       Σ |r(z0)|²
    z0: jnp.ndarray     # (12,)    [vec(R0) col-major, P0 - o]
    o: jnp.ndarray      # (3,)     recenter origin (association frame position)
    NtN: jnp.ndarray    # (3,3)    Σ ω ωᵀ of valid plane normals (localizability)
    n_line: jnp.ndarray   # () int32
    n_plane: jnp.ndarray  # () int32  all plane-type factors (incl. non-feature)
    n_normal: jnp.ndarray  # () int32  surf normals in NtN (localizability count)


def empty_reduced(dtype=jnp.float32) -> ReducedFactor:
    return ReducedFactor(
        Q=jnp.zeros((12, 12), dtype), g0=jnp.zeros((12,), dtype),
        c0=jnp.zeros((), dtype),
        z0=jnp.concatenate([jnp.eye(3, dtype=dtype).reshape(-1),
                            jnp.zeros((3,), dtype)]),
        o=jnp.zeros((3,), dtype), NtN=jnp.zeros((3, 3), dtype),
        n_line=jnp.int32(0), n_plane=jnp.int32(0), n_normal=jnp.int32(0))


class BlocksCache(NamedTuple):
    """One frame's persistent-tier candidate blocks (corner/surf/non
    StackBlocks), cached so later outer rounds re-associate gather-free
    (factors.StackBlocks / voxelmap.shift_dense_blocks).  `non` is None
    unless cfg.use_nonfeature."""

    corner: factors.StackBlocks
    surf: factors.StackBlocks
    non: factors.StackBlocks = None


def _vecR(R):
    """Column-major vec: z[3j + i] = R[i, j]."""
    return R.T.reshape(-1)


def _zvec(R, P, o):
    return jnp.concatenate([_vecR(R), P - o])


def _accumulate(a, q_rel, S, valid, R0, P0_rel):
    """Σ BᵀB, Σ Bᵀr0, Σ|r0|² for factors r = S (R a + P' - q').

    a: (K,3) lidar-frame points (pre-rotated by the extrinsic),
    q_rel: (K,3) recentered world targets, S: (K,3,3), valid: (K,),
    R0/P0_rel: association pose (recentered).  B_k columns: vecR block
    B[:, 3j:3j+3] = a[j] * S, translation block B[:, 9:12] = S.
    """
    dtype = a.dtype
    m = valid.astype(dtype)
    Sm = S * m[:, None, None]
    # B (K,3,12): vecR block B[i, 3j+i'] = a[j] * S[i, i'], then S itself
    BR = (a[:, None, :, None] * Sm[:, :, None, :])   # (K, i, j, i')
    B = jnp.concatenate([BR.reshape(a.shape[0], 3, 9), Sm], axis=-1)
    r0 = jnp.einsum("kij,kj->ki", Sm,
                    (a @ R0.T + P0_rel[None, :] - q_rel))
    Q = jnp.einsum("kiu,kiv->uv", B, B)
    g0 = jnp.einsum("kiu,ki->u", B, r0)
    c0 = jnp.sum(r0 * r0)
    return Q, g0, c0


def build_reduced(x6, stacks_frame, vm_corner, vm_surf, Rbl, tbl, cfg,
                  thres_dist, weight_tan, huber_delta, frame_ok,
                  vm_local_corner=None, vm_local_surf=None,
                  vm_non=None, cached: BlocksCache = None):
    """Associate one frame's stacks and compress into a ReducedFactor.

    Association semantics follow factors.associate_lines/associate_planes
    (Estimator.cpp:148-363 lines, :573-696 planes): stencil 5-NN against
    the map, PCA line fit with eigenvalue gate, LS plane fit with
    planarity gate.  `huber_delta` is a traced scalar folding the
    short-window Huber weight (Estimator.cpp:1216) into the factor at
    association time (pass a huge delta, e.g. 1e12, to disable).  When
    `vm_local_*` are given, queries that miss the persistent map are
    retried against the local (fine-leaf, recent-history) maps — the
    reference's kd-tree local-map fallback (Estimator.cpp:283-360).
    `vm_non` adds the non-feature stack as zero-tangent plane factors
    (Cost_NonFeature_ICP, ceresfunc.h:573-622) when cfg.use_nonfeature.

    Returns (ReducedFactor, BlocksCache).  Passing the returned cache
    back via `cached` re-associates the frame from the SAME persistent-
    map stencil rows with zero gathers (outer-round refresh; the local
    rescue tier still gathers fresh) — see factors.StackBlocks.
    """
    dtype = x6.dtype
    cpts, cmask = stacks_frame.corner, stacks_frame.corner_mask & frame_ok
    spts, smask = stacks_frame.surf, stacks_frame.surf_mask & frame_ok

    lt, blk_c = factors.associate_lines(
        x6, cpts, cmask, vm_corner, Rbl, tbl, cfg, thres_dist,
        vm_local=vm_local_corner,
        cached=None if cached is None else cached.corner, with_blocks=True)
    pt, omega, nvalid, blk_s = factors.associate_planes(
        x6, spts, smask, vm_surf, Rbl, tbl, cfg, thres_dist, weight_tan,
        vm_local=vm_local_surf,
        cached=None if cached is None else cached.surf, with_blocks=True)

    R0w, t0w = factors.pose_wl(x6, Rbl, tbl)
    Rwb0 = lie.exp_matrix(x6[3:6])
    P0 = x6[0:3]
    o = P0                                   # recenter at the body position

    # ---- line factors as 3-dim projected residuals ----
    a_l = cpts @ Rbl.T + tbl[None, :]
    pw_l = cpts @ R0w.T + t0w[None, :]
    d_l = jnp.cross(pw_l - lt.c, lt.u)
    dist_l = jnp.sqrt(jnp.sum(d_l * d_l, axis=-1) + 1e-12)
    pn_l = jnp.maximum(jnp.linalg.norm(pw_l, axis=-1), 1e-6)
    # |P|^(1/2) denominator (ceresfunc.h:433-437: sqrt of sqrt of |P|^2)
    w_l = 1.0 - 0.9 * dist_l / jnp.sqrt(pn_l)
    w_l = w_l * factors.huber_weight((w_l * dist_l) ** 2, huber_delta)
    # projector (I - uuᵀ) is its own square root
    S_l = (jnp.eye(3, dtype=dtype)[None] -
           lt.u[:, :, None] * lt.u[:, None, :]) * w_l[:, None, None]
    Ql, gl, cl = _accumulate(a_l, lt.c - o[None, :], S_l, lt.valid, Rwb0,
                             P0 - o)

    # ---- plane factors ----
    def plane_accum(ppts, ptgt, wtan_used):
        a_p = ppts @ Rbl.T + tbl[None, :]
        pw_p = ppts @ R0w.T + t0w[None, :]
        r0_p = pw_p - ptgt.proj
        pn_p = jnp.maximum(jnp.linalg.norm(pw_p, axis=-1), 1e-6)
        w_p = 1.0 - 0.9 * jnp.sqrt(jnp.sum(r0_p * r0_p, axis=-1) + 1e-12) \
            / jnp.sqrt(pn_p)
        rw = jnp.einsum("kij,kj->ki", ptgt.sqrt_info, w_p[:, None] * r0_p)
        w_p = w_p * factors.huber_weight(jnp.sum(rw * rw, axis=-1),
                                         huber_delta)
        S_p = ptgt.sqrt_info * w_p[:, None, None]
        return _accumulate(a_p, ptgt.proj - o[None, :], S_p, ptgt.valid,
                           Rwb0, P0 - o)

    Qp, gp, cp = plane_accum(spts, pt, weight_tan)
    n_plane = jnp.sum(pt.valid)

    blk_n = None
    if vm_non is not None and stacks_frame.non is not None:
        npts = stacks_frame.non
        nmask = stacks_frame.non_mask & frame_ok
        ptn, _, _, blk_n = factors.associate_planes(
            x6, npts, nmask, vm_non, Rbl, tbl, cfg, thres_dist,
            jnp.zeros((), dtype),
            cached=None if cached is None else cached.non, with_blocks=True)
        Qn, gn, cn = plane_accum(npts, ptn, 0.0)
        Qp, gp, cp = Qp + Qn, gp + gn, cp + cn
        n_plane = n_plane + jnp.sum(ptn.valid)

    m = nvalid.astype(dtype)
    NtN = jnp.einsum("ki,kj->ij", omega * m[:, None], omega * m[:, None])
    rf = ReducedFactor(
        Q=Ql + Qp, g0=gl + gp, c0=cl + cp,
        z0=_zvec(Rwb0, P0, o), o=o, NtN=NtN,
        n_line=jnp.sum(lt.valid).astype(jnp.int32),
        n_plane=n_plane.astype(jnp.int32),
        n_normal=jnp.sum(nvalid).astype(jnp.int32))
    return rf, BlocksCache(corner=blk_c, surf=blk_s, non=blk_n)


def eval_reduced(x6, rf: ReducedFactor):
    """(H6, b6, cost) of one frame's reduced factor at state x6.

    Exactly what the per-point sweep would produce with the same frozen
    weights (see module docstring); H6 is the Gauss-Newton Hessian.
    """
    dtype = x6.dtype
    phi = x6[3:6]
    R = lie.exp_matrix(phi)
    Jr = lie.right_jacobian(phi)
    dz = _zvec(R, x6[0:3], rf.o) - rf.z0

    gy = rf.g0 + rf.Q @ dz
    cost = 0.5 * (rf.c0 + jnp.dot(2.0 * rf.g0 + rf.Q @ dz, dz))

    # chain rule Z = ∂z/∂[P, phi] (12×6): vecR rows (col-major block j):
    # d(R e_j)/dphi = -R [e_j]× Jr;  P rows: I over the P columns.
    # Built by CONCATENATION, not .at[].set on zeros — the two static
    # dynamic-update-slices ran every LM iteration per frame; concat folds
    # into the surrounding fusion (same fix as factors.imu_residual_and_jac)
    e = jnp.eye(3, dtype=dtype)
    dvecR = jnp.concatenate([-R @ lie.hat(e[j]) @ Jr for j in range(3)],
                            axis=0)                    # (9,3)
    Z = jnp.concatenate(
        [jnp.concatenate([jnp.zeros((9, 3), dtype), dvecR], axis=1),
         jnp.concatenate([e, jnp.zeros((3, 3), dtype)], axis=1)], axis=0)

    b6 = Z.T @ gy
    H6 = Z.T @ rf.Q @ Z
    return H6, b6, cost
