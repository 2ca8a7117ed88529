"""Dense sliding-window Levenberg-Marquardt solver + Schur marginalization.

Replaces Ceres (DENSE_SCHUR + DOGLEG, Estimator.cpp:1425-1432) and the
pthread-assembled marginalization (ceresfunc.h:149-225, ceresfunc.cpp:3-30)
with an on-device solve over the whole window state (W x 15 dims): batched
residual/Jacobian evaluation feeds MXU matmuls for the normal equations,
the window chain's exactly block-tridiagonal H is solved by block-Thomas
with pivot-free 15x15 Gauss-Jordan inverses (4x faster than the dense LU
custom-call on TPU, scripts/solve_bench.py), and the Schur complement is a
single 30x30 eigen-factorization.

The window state is an (W, 15) array; frames are ordered oldest (0) to
newest (W-1), with the leading `W - n_frames` rows invalid during warmup
(masked out of every factor).  The marginalization prior always binds the
oldest valid frame's 15-dim block, exactly like the reference's
(para_PR[0], para_VBias[0]) prior after the address shift
(Estimator.cpp:1556-1563).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import factors, reduced


class Prior(NamedTuple):
    """Marginalization prior (reference MarginalizationInfo kept-block data)."""

    lin_J: jnp.ndarray   # (15,15)
    lin_r: jnp.ndarray   # (15,)
    x0: jnp.ndarray      # (15,) linearization point (oldest kept frame)
    valid: jnp.ndarray   # () bool


def empty_prior(dtype=jnp.float32) -> Prior:
    return Prior(lin_J=jnp.zeros((15, 15), dtype), lin_r=jnp.zeros((15,), dtype),
                 x0=jnp.zeros((15,), dtype), valid=jnp.asarray(False))


def _point_blocks(x, rfs):
    """Per-frame 6x6 normal-equation blocks from the reduced point factors.

    x: (W,15); rfs: ReducedFactor with leading window axis (W,).  Each
    frame evaluates its exact quadratic (reduced.eval_reduced) — identical
    H6/b6/cost to a per-point residual+Jacobian sweep with the same
    association-time weights, at O(150) numbers per frame instead of O(K).
    Robust-loss weights are folded into the factors at association time
    (reduced.build_reduced), so there is no per-iteration reweighting.
    """
    H6, b6, cost = jax.vmap(reduced.eval_reduced)(x[:, :6], rfs)
    return H6, b6, jnp.sum(cost)


def _imu_blocks(x, preint, pair_valid, gravity):
    """Per-pair 30x30 blocks for the IMU factors (pair j binds frames j-1,j).

    preint: dict of arrays with leading axis W (entry j = preintegration
    from frame j-1 to frame j; entry 0 unused).  Returns H30 (W,30,30),
    b30 (W,30), cost ().
    """
    W = x.shape[0]
    xi = jnp.concatenate([jnp.roll(x, 1, axis=0), x], axis=-1)     # (W,30)

    def one_pair(z, meas, ok):
        # analytic Jacobian (factors.imu_residual_and_jac): ~3 residual
        # costs instead of jacfwd's ~30, inside the LM while_loop
        r, J = factors.imu_residual_and_jac(z[:15], z[15:], meas, gravity)
        m = ok.astype(z.dtype)
        r = r * m
        J = J * m
        return J.T @ J, J.T @ r, 0.5 * jnp.sum(r * r)

    meas = {k: v for k, v in preint.items()}
    H30, b30, cost = jax.vmap(one_pair)(xi, meas, pair_valid)
    return H30, b30, jnp.sum(cost)


def _prior_block(x, prior: Prior):
    r = factors.prior_residual(x[0], prior)
    m = prior.valid.astype(x.dtype)
    r = r * m
    J = prior.lin_J * m
    return J.T @ J, J.T @ r, 0.5 * jnp.sum(r * r)


def _assemble_blocks(x, H6, b6, H30, b30, Hp, bp, frame_valid):
    """Block-tridiagonal normal equations: diag (W,15,15), up (W-1,15,15),
    b (W,15), with invalid frames zeroed.

    The window factor graph is a chain — point factors bind single frames,
    IMU pairs bind (j-1, j), the prior binds frame 0 — so H never has
    blocks beyond the first off-diagonal.  Keeping the block form (instead
    of concatenating a dense (W*15)^2 matrix every LM iteration) feeds the
    exact block-Thomas solve in _damped_solve and skips the dense masking
    work entirely.  Lower blocks are up[i].T (H is symmetric).
    """
    W = x.shape[0]
    dtype = x.dtype
    # pad (not .at[].set on zeros: that lowers to a dynamic-update-slice
    # executed every LM iteration; pad folds into the consumer fusion)
    H6e = jnp.pad(H6, ((0, 0), (0, 9), (0, 9)))
    b6e = jnp.pad(b6, ((0, 0), (0, 9)))

    diag, bs = [], []
    for i in range(W):
        blk, bv = H6e[i], b6e[i]
        if i >= 1:
            blk = blk + H30[i, 15:30, 15:30]
            bv = bv + b30[i, 15:30]
        if i + 1 < W:
            blk = blk + H30[i + 1, 0:15, 0:15]
            bv = bv + b30[i + 1, 0:15]
        if i == 0:
            blk = blk + Hp
            bv = bv + bp
        diag.append(blk)
        bs.append(bv)
    diag = jnp.stack(diag)
    b = jnp.stack(bs)
    up = H30[1:, 0:15, 15:30]        # block (i, i+1): pair i+1's cross term

    fv = frame_valid.astype(dtype)
    diag = diag * fv[:, None, None]
    up = up * (fv[:-1] * fv[1:])[:, None, None]
    b = b * fv[:, None]
    return diag, up, b


def _gj_inv15(A):
    """15x15 inverse by pivot-free Gauss-Jordan (one fori over columns).

    Safe without pivoting here: every matrix the Thomas recursion inverts
    is a Schur complement of the SPD damped system (unit-scaled diagonal +
    ridge), so each pivot is a positive diagonal.  On TPU this is 15 fused
    VPU rank-1 updates — 4x faster than the LAPACK LU custom-call at the
    (W*15)^2 dense shape it replaces (scripts/solve_bench.py: 0.147 vs
    0.603 ms per batch-16 solve; LAPACK-shaped factorizations are
    latency-bound on TPU).
    """
    n = A.shape[-1]
    aug = jnp.concatenate([A, jnp.eye(n, dtype=A.dtype)], axis=-1)

    def body(k, aug):
        piv = aug[k] / aug[k, k]
        aug = aug - aug[:, k][:, None] * piv[None, :]
        return aug.at[k].set(piv)

    aug = jax.lax.fori_loop(0, n, body, aug)
    return aug[:, n:]


def _block_thomas(diag, up, b):
    """Exact solve of the symmetric block-tridiagonal system.

    diag (W,15,15), up (W-1,15,15) with lower blocks = up[i].T, b (W,15).
    Sequential in W (the chain's data dependency): W 15x15 GJ inversions
    + ~3W small matmuls, replacing jnp.linalg.solve on the dense (W*15)^2
    system — exact, because _assemble_blocks never populates blocks beyond
    the first off-diagonal.
    """
    W = diag.shape[0]
    Dinv = [None] * W
    y = [None] * W
    Dinv[0] = _gj_inv15(diag[0])
    y[0] = b[0]
    for i in range(1, W):
        L = up[i - 1].T @ Dinv[i - 1]
        Dinv[i] = _gj_inv15(diag[i] - L @ up[i - 1])
        y[i] = b[i] - L @ y[i - 1]
    x = [None] * W
    x[W - 1] = Dinv[W - 1] @ y[W - 1]
    for i in range(W - 2, -1, -1):
        x[i] = Dinv[i] @ (y[i] - up[i] @ x[i + 1])
    return jnp.stack(x)


def _damped_solve(diag, up, b, lam, radius):
    """Solve (H + lam*diag(H)) dx = -b with Jacobi scaling, f32-safe.

    Stands in for Ceres's dogleg trust region (Estimator.cpp:1426 DOGLEG):
    the Jacobi scale is floored RELATIVE to the largest same-unit diagonal
    (near-unobservable directions — e.g. the along-axis translation in a
    corridor — would otherwise be scaled by 1/sqrt(~0) and the solution
    explodes along them while the cost stays flat), and the step norm is
    capped by the caller's adaptive trust `radius`.

    The floor is computed PER STATE-COMPONENT GROUP (P, phi, V, bg, ba
    across all frames), never across groups: the bias random-walk terms
    carry curvature ~1e7 while velocity carries ~1, so a global relative
    floor silently froze every velocity dimension — the solver then could
    not correct velocity at all and sustained motion decayed into a
    runaway under-tracking loop (measured: vx bleeding 0.12 m/s per scan
    on a 3 m/s cruise).

    Operates on the block-tridiagonal form from _assemble_blocks; the
    scaled+damped system stays block-tridiagonal (the scaling is diagonal)
    and _block_thomas solves it exactly.  The 1e-5 ridge floor on the
    unit-scaled diagonal keeps the f32 Schur-complement pivots positive
    (the exact system is PSD but spans ~7 orders of magnitude — bias
    random walks vs velocity); the isfinite guard keeps any residual
    blowup from poisoning LM (such steps are rejected by the accept test).
    """
    d15 = jnp.diagonal(diag, axis1=-2, axis2=-1)            # (W,15)
    groups = jnp.repeat(jnp.arange(5), 3)                   # (15,) P phi V bg ba
    gmax = jnp.zeros((5,), d15.dtype).at[groups].max(jnp.max(d15, axis=0))
    d_floor15 = 1e-6 * jnp.maximum(gmax, 1e-12)[groups]     # (15,)
    # dims whose curvature is far below their group's scale are
    # unobservable from this solve's data: freeze them entirely (dx=0),
    # like dogleg, instead of letting dx = -noise/d_floor random-walk them
    observable = d15 > d_floor15[None, :]
    s = jnp.where(observable,
                  1.0 / jnp.sqrt(jnp.maximum(d15, d_floor15[None, :])), 0.0)
    diag_s = diag * s[:, :, None] * s[:, None, :]
    up_s = up * s[:-1, :, None] * s[1:, None, :]
    dd = (lam + 1e-5) + jnp.where(observable, 0.0, 1.0)     # (W,15)
    A_diag = diag_s + dd[:, :, None] * jnp.eye(15, dtype=diag.dtype)
    dx = s * _block_thomas(A_diag, up_s, -(b * s))          # (W,15)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    nrm = jnp.linalg.norm(dx)
    return dx * jnp.minimum(1.0, radius / jnp.maximum(nrm, 1e-12))


class SolveResult(NamedTuple):
    x: jnp.ndarray          # (W,15) optimized state
    cost: jnp.ndarray       # final cost
    iters: jnp.ndarray      # LM iterations executed
    converged: jnp.ndarray  # bool


def lm_solve(x0, rfs, preint, pair_valid, prior, frame_valid,
             gravity, cfg, max_iters: int, skip=None):
    """Levenberg-Marquardt over the window with fixed associations.

    Matches the reference's inner Ceres solve (up to `max_iters` dogleg
    steps, Estimator.cpp:1428).  The point-factor sets (rfs, one
    ReducedFactor per window frame) stay fixed, exactly like the cached
    vLineFeatures/vPlanFeatures (:1304-1374); robust-loss weights are
    baked into them at association time.  `skip` (traced bool) pre-sets
    the loop's done flag so the whole solve is a no-op — cheaper for the
    compiler than wrapping in lax.cond.

    Deferred-evaluation LM: each iteration evaluates residual blocks ONCE,
    at the trial point, and that evaluation doubles as (a) the accept test
    for the PREVIOUS step and (b) the normal equations for the next step
    when accepted.  On rejection the step is retried from the stored
    accepted-point blocks with stronger damping — halving the per-iteration
    cost vs the evaluate-then-re-evaluate formulation at identical accepted
    iterates.
    """
    W = x0.shape[0]

    def blocks_at(x):
        H6, b6, cp = _point_blocks(x, rfs)
        # IMU/prior carry no robust loss in the reference
        H30, b30, ci = _imu_blocks(x, preint, pair_valid, gravity)
        Hp, bp, cpr = _prior_block(x, prior)
        Hd, Hu, b = _assemble_blocks(x, H6, b6, H30, b30, Hp, bp,
                                     frame_valid)
        return Hd, Hu, b, cp + ci + cpr

    def body(carry):
        x, Hd, Hu, b, lam, radius, cost, it, done = carry
        dx = _damped_solve(Hd, Hu, b, lam, radius)          # (W,15)
        x_try = x + dx * frame_valid[:, None].astype(x.dtype)
        Hd_t, Hu_t, b_t, new_cost = blocks_at(x_try)
        accept = new_cost < cost
        # a cost-flat direction (unobservable dim) yields only noise-level
        # "improvements": such steps are accepted but the trust radius
        # SHRINKS, so flat-direction random walks stall geometrically while
        # genuinely-improving solves keep full freedom
        significant = (cost - new_cost) > 1e-7 * (1.0 + cost)
        x = jnp.where(accept, x_try, x)
        Hd = jnp.where(accept, Hd_t, Hd)
        Hu = jnp.where(accept, Hu_t, Hu)
        b = jnp.where(accept, b_t, b)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 4.0)
        radius = jnp.where(accept & significant,
                           jnp.minimum(radius * 2.0, 10.0),
                           jnp.maximum(radius * 0.5, 1e-5))
        # convergence (Ceres-like): accepted step barely moved any pose.
        # (The looser 0.05 m / 0.05 deg gates from Estimator.cpp:1448 belong
        # to the *outer* re-associate loop, handled by the pipeline.)
        dt_max = jnp.max(jnp.linalg.norm(dx[:, 0:3], axis=-1)
                         * frame_valid.astype(x.dtype))
        dr_max = jnp.max(jnp.linalg.norm(dx[:, 3:6], axis=-1)
                         * frame_valid.astype(x.dtype))
        # converged = accepted step with negligible pose motion AND no
        # significant cost progress left — pose deltas alone are not
        # enough: a trust-region-clamped step can move only velocity/bias
        # (zero pose delta) while the cost is still falling fast
        conv = (accept & ~significant
                & (dt_max < cfg.solver.inner_converge_trans)
                & (dr_max < cfg.solver.inner_converge_rot))
        # a fully-stalled trust region is also converged
        conv = conv | (radius <= 1e-5)
        return x, Hd, Hu, b, lam, radius, cost, it + 1, done | conv

    def cond(carry):
        it, done = carry[-2], carry[-1]
        return (it < max_iters) & ~done

    done0 = jnp.asarray(False) if skip is None else skip
    if skip is None:
        Hd0, Hu0, b0, init_cost = blocks_at(x0)
    else:
        # a skipped solve never reads the blocks — don't evaluate them
        Hd0, Hu0, b0, init_cost = jax.lax.cond(
            skip,
            lambda _: (jnp.zeros((W, 15, 15), x0.dtype),
                       jnp.zeros((W - 1, 15, 15), x0.dtype),
                       jnp.zeros((W, 15), x0.dtype),
                       jnp.asarray(0.0, x0.dtype)),
            lambda _: blocks_at(x0), None)
    x, _, _, _, lam, radius, cost, it, done = jax.lax.while_loop(
        cond, body, (x0, Hd0, Hu0, b0, jnp.asarray(1e-4, x0.dtype),
                     jnp.asarray(cfg.solver.init_radius, x0.dtype), init_cost,
                     jnp.int32(0), done0))
    return SolveResult(x=x, cost=cost, iters=it, converged=done)


def marginalize(x, rf0, preint, prior, gravity, cfg):
    """Schur-complement marginalization of frame 0 -> new 15-dim prior.

    Mirrors Estimator.cpp:1448-1567 + MarginalizationInfo::marginalize
    (ceresfunc.h:149-225): factors touching frame 0 are the old prior, the
    IMU factor (0,1) and frame 0's cached point factors (its ReducedFactor
    evaluated at the final pose); the dropped block is frame 0's 15 dims,
    the kept block is frame 1's.

    Deviation: the reference thresholds eigenvalues at an absolute 1e-8 in
    f64; here the threshold is relative (cfg.solver.marg_eps * max
    eigenvalue), which is the f32-meaningful equivalent.
    """
    m_eps = cfg.solver.marg_eps
    dtype = x.dtype
    A = jnp.zeros((30, 30), dtype)
    b = jnp.zeros((30,), dtype)

    # old prior on frame 0
    Hp, bp, _ = _prior_block(x, prior)
    A = A.at[0:15, 0:15].add(Hp)
    b = b.at[0:15].add(bp)

    # IMU factor between frames 0 and 1 (no loss, ceresfunc.h nullptr)
    z = jnp.concatenate([x[0], x[1]])
    meas = {k: v[1] for k, v in preint.items()}
    rI, JI = factors.imu_residual_and_jac(z[:15], z[15:], meas, gravity)
    A = A + JI.T @ JI
    b = b + JI.T @ rI

    # frame 0 point factors (cached associations, current pose, no loss —
    # matching the marginalization adds at Estimator.cpp:1521-1549) at the
    # prior-realistic sigma (cfg.solver.marg_point_sigma; residuals here
    # are in lidar_m units, so weight 1 == sigma lidar_m).  Scaling every
    # residual by w scales (H, b) by w².
    w2 = (cfg.imu.lidar_m / cfg.solver.marg_point_sigma) ** 2
    H6, b6, _ = reduced.eval_reduced(x[0, :6], rf0)
    A = A.at[0:6, 0:6].add(w2 * H6)
    b = b.at[0:6].add(w2 * b6)

    # Schur complement: drop rows/cols 0:15
    Amm = 0.5 * (A[0:15, 0:15] + A[0:15, 0:15].T)
    evals, evecs = jnp.linalg.eigh(Amm)
    eps = m_eps * jnp.maximum(jnp.max(evals), 1e-12)
    inv = jnp.where(evals > eps, 1.0 / jnp.maximum(evals, eps), 0.0)
    Amm_inv = (evecs * inv[None, :]) @ evecs.T
    Arm = A[15:30, 0:15]
    A_star = A[15:30, 15:30] - Arm @ Amm_inv @ A[0:15, 15:30]
    b_star = b[15:30] - Arm @ Amm_inv @ b[0:15]

    evals2, evecs2 = jnp.linalg.eigh(0.5 * (A_star + A_star.T))
    eps2 = m_eps * jnp.maximum(jnp.max(evals2), 1e-12)
    keep = evals2 > eps2
    S_sqrt = jnp.where(keep, jnp.sqrt(jnp.maximum(evals2, 0.0)), 0.0)
    S_inv_sqrt = jnp.where(keep, 1.0 / jnp.maximum(S_sqrt, 1e-20), 0.0)
    lin_J = S_sqrt[:, None] * evecs2.T
    lin_r = S_inv_sqrt * (evecs2.T @ b_star)
    return Prior(lin_J=lin_J, lin_r=lin_r, x0=x[1], valid=jnp.asarray(True))
