"""Estimator::Estimate orchestration — association rounds + LM solves.

Mirrors the reference's outer optimize loop (Estimator.cpp:1143-1581) as ONE
lax.scan over `max_outer_iters` rounds whose behavior differences between
the two regimes are pure data (so the pipeline traces a single program and
`full_window` is an ordinary traced bool):

* **Full-window mode** (window == SLIDEWINDOWSIZE): associations are built
  once at the entry poses and FROZEN across rounds (the cached
  vLineFeatures/vPlanFeatures early-return path, Estimator.cpp:160-170,
  585-595), no robust loss (huber delta -> huge), thres_dist=1,
  plan_weight_tan=3e-4.
* **Short-window mode** (warmup / pre-init): associations are rebuilt every
  round at the updated poses with the member-variable threshold schedule
  25 -> 10 -> 1 -> 1 -> 1 (Estimator.cpp:1203-1208, :1376-1380),
  Huber(0.1) on point factors, plan_weight_tan=0.

Localizability (checkLocalizability, Estimator.cpp:536-565) is evaluated on
every fresh association and OR-reduced, like the reference's set-only
`is_degenerate` flag (:771-775).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import factors, solver

_HUBER_OFF = 1e12   # Huber with an unreachable delta == no robust loss


class Stacks(NamedTuple):
    """Downsampled per-frame feature stacks in the lidar frame.

    The non-feature block is optional (None unless cfg.use_nonfeature) —
    residual unclassified points matched against the non-feature map with
    1-dim plane factors (processNonFeatureICP, Estimator.cpp:780-935).
    """

    corner: jnp.ndarray       # (W, Kc, 3)
    corner_mask: jnp.ndarray  # (W, Kc)
    surf: jnp.ndarray         # (W, Ks, 3)
    surf_mask: jnp.ndarray    # (W, Ks)
    non: jnp.ndarray = None        # (W, Kn, 3)
    non_mask: jnp.ndarray = None   # (W, Kn)


class EstimateResult(NamedTuple):
    x: jnp.ndarray            # (W,15)
    degenerate: jnp.ndarray   # () bool
    fail: jnp.ndarray         # () bool
    sv_min: jnp.ndarray       # () localizability min singular value
    prior: solver.Prior       # updated marginalization prior
    n_line: jnp.ndarray       # () valid line factors (diagnostics)
    n_plane: jnp.ndarray      # () valid plane factors


def _associate_all(x, stacks: Stacks, vm_corner, vm_surf, vm_non, Rbl, tbl,
                   cfg, thres_dist, weight_tan, frame_valid):
    """Build factor targets for every window frame (vmapped).

    Non-feature points (when present) become plane targets with zero
    tangential weight — numerically identical to the reference's 1-dim
    Cost_NonFeature_ICP (ceresfunc.h:573-622) — concatenated onto the surf
    targets; their normals do NOT feed localizability (the reference
    collects normals only in processPointToPlanVec, Estimator.cpp:675).
    """
    with_non = stacks.non is not None

    def one(x15, cpts, cmask, spts, smask, fv, *non_args):
        lt = factors.associate_lines(x15[:6], cpts, cmask & fv, vm_corner,
                                     Rbl, tbl, cfg, thres_dist)
        pt, normals, nv = factors.associate_planes(
            x15[:6], spts, smask & fv, vm_surf, Rbl, tbl, cfg,
            thres_dist, weight_tan)
        if with_non:
            npts, nmask = non_args
            ptn, _, _ = factors.associate_planes(
                x15[:6], npts, nmask & fv, vm_non, Rbl, tbl, cfg,
                thres_dist, 0.0)
            pt = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                              pt, ptn)
        return lt, pt, normals, nv

    args = (x, stacks.corner, stacks.corner_mask, stacks.surf,
            stacks.surf_mask, frame_valid)
    if with_non:
        args = args + (stacks.non, stacks.non_mask)
    lt, pt, normals, nv = jax.vmap(one)(*args)
    return lt, pt, normals.reshape(-1, 3), nv.reshape(-1)


def estimate(x0, stacks: Stacks, vm_corner, vm_surf, preint, pair_valid,
             prior: solver.Prior, frame_valid, gravity, Rbl, tbl, cfg,
             full_window, do_marginalize=None, vm_non=None):
    """One scan's window optimization.  `full_window` is a traced bool.

    Returns EstimateResult; the prior is updated (marginalization) only
    when `full_window & do_marginalize`.
    """
    s = cfg.solver
    dtype = x0.dtype
    if do_marginalize is None:
        do_marginalize = full_window

    sched_short = jnp.asarray(
        [s.thres_dist_short, 10.0] + [s.thres_dist] * (s.max_outer_iters - 2),
        dtype)
    sched_full = jnp.full((s.max_outer_iters,), s.thres_dist, dtype)
    sched = jnp.where(full_window, sched_full, sched_short)
    weight_tan = jnp.where(full_window, s.plan_weight_tan, 0.0).astype(dtype)
    huber = jnp.where(full_window, _HUBER_OFF, s.huber_delta_scale).astype(dtype)

    lt0, pt0, normals0, nv0 = _associate_all(
        x0, stacks, vm_corner, vm_surf, vm_non, Rbl, tbl, cfg, sched[0],
        weight_tan, frame_valid)
    deg0, fail0, sv0 = factors.localizability(normals0, nv0, cfg)

    # full-window mode re-associates only in the first `full_reassoc_rounds`
    # rounds (the map stencil gathers dominate the step program); short
    # mode re-associates every round like the reference's member-threshold
    # schedule.  `refreshed[r]` = targets rebuilt at the END of round r.
    refresh_full = jnp.arange(1, s.max_outer_iters) < s.full_reassoc_rounds

    def round_fn(carry, inp):
        thres_i, refresh_flag, inner_cap = inp
        x, lt, pt, deg, fail, sv, conv, fresh = carry
        # unchanged targets + converged LM: further solves are identical —
        # `skip` zeroes the solve's iterations (the reference's outer
        # convergence break, Estimator.cpp:1448)
        # short-window (warmup) rounds re-associate at widening thresholds
        # and genuinely need the full budget; only full-window later rounds
        # are capped
        cap = jnp.where(full_window, inner_cap, s.max_inner_iters)
        res = solver.lm_solve(
            x, lt, pt, preint, pair_valid, prior, frame_valid, gravity,
            Rbl, tbl, cfg, cap, huber_delta=huber,
            skip=conv & ~fresh)
        x = res.x
        conv = res.converged

        # re-associate for the NEXT round at the updated poses
        def reassociate(_):
            lt_n, pt_n, normals, nv = _associate_all(
                x, stacks, vm_corner, vm_surf, vm_non, Rbl, tbl, cfg,
                thres_i, weight_tan, frame_valid)
            deg_i, fail_i, sv_i = factors.localizability(normals, nv, cfg)
            return lt_n, pt_n, deg | deg_i, fail | fail_i, sv_i

        def frozen(_):
            return lt, pt, deg, fail, sv

        do_refresh = jnp.logical_or(jnp.logical_not(full_window),
                                    refresh_flag)
        lt, pt, deg, fail, sv = jax.lax.cond(do_refresh, reassociate,
                                             frozen, None)
        return (x, lt, pt, deg, fail, sv, conv, do_refresh), None

    # the first solve (from the predicted window) gets the full budget;
    # later rounds start from an optimized window and get a short one
    caps = jnp.asarray([s.max_inner_iters]
                       + [s.max_inner_iters_later] * (s.max_outer_iters - 2),
                       jnp.int32)
    carry0 = (x0, lt0, pt0, deg0, fail0, sv0, jnp.asarray(False),
              jnp.asarray(True))
    (x, lt, pt, deg, fail, sv, conv, fresh), _ = jax.lax.scan(
        round_fn, carry0, (sched[1:], refresh_full, caps))
    # final solve with the last associations (no-op if already converged
    # on unchanged targets)
    res = solver.lm_solve(x, lt, pt, preint, pair_valid, prior,
                          frame_valid, gravity, Rbl, tbl, cfg,
                          jnp.where(full_window, s.max_inner_iters_later,
                                    s.max_inner_iters),
                          huber_delta=huber, skip=conv & ~fresh)
    x = res.x

    new_prior = solver.marginalize(x, lt, pt, preint, prior, gravity,
                                   Rbl, tbl, cfg)
    marg = full_window & do_marginalize
    new_prior = jax.tree.map(lambda a, b: jnp.where(marg, a, b),
                             new_prior, prior)

    return EstimateResult(
        x=x, degenerate=deg, fail=fail, sv_min=sv, prior=new_prior,
        n_line=jnp.sum(lt.valid).astype(jnp.int32),
        n_plane=jnp.sum(pt.valid).astype(jnp.int32))
