"""Dense sliding-window Levenberg-Marquardt solver + Schur marginalization.

Replaces Ceres (DENSE_SCHUR + DOGLEG, Estimator.cpp:1425-1432) and the
pthread-assembled marginalization (ceresfunc.h:149-225, ceresfunc.cpp:3-30)
with one on-device dense solve over the whole window state
(W x 15 = 75 dims): batched residual/Jacobian evaluation feeds MXU matmuls
for the normal equations, and the Schur complement is a single 30x30
eigen-factorization.

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


def _assemble(x, H6, b6, H30, b30, Hp, bp, frame_valid):
    """Dense (W*15, W*15) H and (W*15,) b with invalid frames zeroed.

    Built as a static W x W grid of 15x15 blocks (block-tridiagonal:
    point blocks on the diagonal, IMU pair quadrants on diag +
    off-diagonals, prior on block (0,0)) via concatenation — the former
    .at[].add sequence lowered to a chain of dynamic-update-slices
    executed every LM iteration.
    """
    W = x.shape[0]
    dtype = x.dtype
    Z = jnp.zeros((15, 15), dtype)
    # pad (not .at[].set on zeros: that lowers to a dynamic-update-slice
    # executed every LM iteration; pad folds into the consumer fusion)
    H6e = jnp.pad(H6, ((0, 0), (0, 9), (0, 9)))
    b6e = jnp.pad(b6, ((0, 0), (0, 9)))

    rows = []
    for i in range(W):
        blocks = []
        for j in range(W):
            if i == j:
                blk = H6e[i]
                if i >= 1:
                    blk = blk + H30[i, 15:30, 15:30]
                if i + 1 < W:
                    blk = blk + H30[i + 1, 0:15, 0:15]
                if i == 0:
                    blk = blk + Hp
            elif j == i + 1:
                blk = H30[i + 1, 0:15, 15:30]
            elif j == i - 1:
                blk = H30[i, 15:30, 0:15]
            else:
                blk = Z
            blocks.append(blk)
        rows.append(jnp.concatenate(blocks, axis=1))
    H = jnp.concatenate(rows, axis=0)

    bs = []
    for i in range(W):
        blk = b6e[i]
        if i >= 1:
            blk = blk + b30[i, 15:30]
        if i + 1 < W:
            blk = blk + b30[i + 1, 0:15]
        if i == 0:
            blk = blk + bp
        bs.append(blk)
    b = jnp.concatenate(bs, axis=0)

    fm = jnp.repeat(frame_valid.astype(dtype), 15)
    H = H * fm[:, None] * fm[None, :]
    b = b * fm
    return H, b


def _damped_solve(H, b, lam, radius):
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
    """
    d = jnp.diagonal(H)
    W = d.shape[0] // 15
    groups = jnp.repeat(jnp.arange(5), 3)                   # (15,) P phi V bg ba
    d15 = d.reshape(W, 15)
    gmax = jnp.zeros((5,), d.dtype).at[groups].max(jnp.max(d15, axis=0))
    d_floor15 = 1e-6 * jnp.maximum(gmax, 1e-12)[groups]     # (15,)
    d_floor = jnp.broadcast_to(d_floor15, (W, 15)).reshape(-1)
    # dims whose curvature is far below their group's scale are
    # unobservable from this solve's data: freeze them entirely (dx=0),
    # like dogleg, instead of letting dx = -noise/d_floor random-walk them
    observable = d > d_floor
    s = jnp.where(observable, 1.0 / jnp.sqrt(jnp.maximum(d, d_floor)), 0.0)
    Hs = H * s[:, None] * s[None, :]
    n = H.shape[0]
    # ridge floor 1e-5 (on the unit-scaled diagonal): the exact system is
    # PSD but spans ~7 orders of magnitude (bias random walks vs velocity),
    # and f32 Cholesky pivots went negative -> NaN steps that LM silently
    # rejected forever (the window then never corrected velocity at all);
    # partial-pivoting LU + the larger ridge keeps every step finite
    A = Hs + (lam + 1e-5) * jnp.eye(n, dtype=H.dtype)
    A = A + jnp.diag(jnp.where(observable, 0.0, 1.0))
    dx = s * jnp.linalg.solve(A, -(s * b))
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
        H, b = _assemble(x, H6, b6, H30, b30, Hp, bp, frame_valid)
        return H, b, cp + ci + cpr

    def body(carry):
        x, H, b, lam, radius, cost, it, done = carry
        dx = _damped_solve(H, b, lam, radius)
        x_try = x + dx.reshape(W, 15) * frame_valid[:, None].astype(x.dtype)
        H_t, b_t, new_cost = blocks_at(x_try)
        accept = new_cost < cost
        # a cost-flat direction (unobservable dim) yields only noise-level
        # "improvements": such steps are accepted but the trust radius
        # SHRINKS, so flat-direction random walks stall geometrically while
        # genuinely-improving solves keep full freedom
        significant = (cost - new_cost) > 1e-7 * (1.0 + cost)
        x = jnp.where(accept, x_try, x)
        H = jnp.where(accept, H_t, H)
        b = jnp.where(accept, b_t, b)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 4.0)
        radius = jnp.where(accept & significant,
                           jnp.minimum(radius * 2.0, 10.0),
                           jnp.maximum(radius * 0.5, 1e-5))
        # convergence (Ceres-like): accepted step barely moved any pose.
        # (The looser 0.05 m / 0.05 deg gates from Estimator.cpp:1448 belong
        # to the *outer* re-associate loop, handled by the pipeline.)
        dxf = dx.reshape(W, 15)
        dt_max = jnp.max(jnp.linalg.norm(dxf[:, 0:3], axis=-1)
                         * frame_valid.astype(x.dtype))
        dr_max = jnp.max(jnp.linalg.norm(dxf[:, 3:6], axis=-1)
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
        return x, H, b, lam, radius, cost, it + 1, done | conv

    def cond(carry):
        it, done = carry[-2], carry[-1]
        return (it < max_iters) & ~done

    done0 = jnp.asarray(False) if skip is None else skip
    n = W * 15
    if skip is None:
        H0, b0, init_cost = blocks_at(x0)
    else:
        # a skipped solve never reads the blocks — don't evaluate them
        H0, b0, init_cost = jax.lax.cond(
            skip,
            lambda _: (jnp.zeros((n, n), x0.dtype), jnp.zeros((n,), x0.dtype),
                       jnp.asarray(0.0, x0.dtype)),
            lambda _: blocks_at(x0), None)
    x, _, _, lam, radius, cost, it, done = jax.lax.while_loop(
        cond, body, (x0, H0, b0, jnp.asarray(1e-4, x0.dtype),
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
