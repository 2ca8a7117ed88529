"""Estimator::Estimate orchestration — association rounds + LM solves.

Mirrors the reference's outer optimize loop (Estimator.cpp:1143-1581) as ONE
lax.scan over `max_outer_iters` rounds whose behavior differences between
the two regimes are pure data (so the pipeline traces a single program and
`full_window` is an ordinary traced bool):

* **Full-window mode** (window == SLIDEWINDOWSIZE): the newest frame is
  associated at the entry pose and re-associated in the first
  `full_reassoc_rounds` rounds; older frames keep CACHED reduced factors
  from previous scans (their optimized poses move millimeters per scan, so
  their 5-NN sets are stable), with `refresh_old_frames` slots rebuilt
  round-robin each scan — the TPU-shaped equivalent of the reference
  rebuilding every frame's factors every scan (Estimator.cpp:1262-1299)
  and then freezing them across rounds (the vLineFeatures cache,
  :160-170).  No robust loss, thres_dist=1, plan_weight_tan=3e-4.
* **Short-window mode** (warmup / pre-init): the newest frame is rebuilt
  every round at the updated poses with the member-variable threshold
  schedule 25 -> 10 -> 1 -> 1 -> 1 (Estimator.cpp:1203-1208, :1376-1380),
  Huber(0.1) on point factors, plan_weight_tan=0.  (Pre-init windows hold
  a single frame, so newest-frame == every-frame there.)

Point factors are moment-compressed ReducedFactors (estimator/reduced.py):
association happens once per (frame, round), after which LM iterations
cost O(150) numbers per frame — the per-iteration point sweep that
dominated the TPU step program is gone.

Localizability (checkLocalizability, Estimator.cpp:536-565) is evaluated
on the summed normal outer-products of ALL window frames' current factors
and OR-reduced across rounds, like the reference's set-only
`is_degenerate` flag (:771-775).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import factors, reduced, solver

_HUBER_OFF = 1e12   # Huber with an unreachable delta == no robust loss


class Stacks(NamedTuple):
    """Downsampled per-frame feature stacks in the lidar frame.

    The non-feature block is optional (None unless cfg.use_nonfeature) —
    residual unclassified points matched against the non-feature map with
    1-dim plane factors (processNonFeatureICP, Estimator.cpp:780-935).

    The *_rel channels are the voxel-MEAN intra-scan relative measurement
    times of each stack point: the pipeline re-deskews the newest frame's
    stacks with the SOLVED scan delta after each solve (the prediction-
    based undistortion of the first scans has no motion estimate and
    leaves the full skew in the map otherwise — pipeline.step_core).
    Field order mirrors pipeline.FrameStack (tuple-spread construction).
    """

    corner: jnp.ndarray       # (W, Kc, 3)
    corner_mask: jnp.ndarray  # (W, Kc)
    surf: jnp.ndarray         # (W, Ks, 3)
    surf_mask: jnp.ndarray    # (W, Ks)
    non: jnp.ndarray = None        # (W, Kn, 3)
    non_mask: jnp.ndarray = None   # (W, Kn)
    corner_rel: jnp.ndarray = None  # (W, Kc)
    surf_rel: jnp.ndarray = None    # (W, Ks)
    non_rel: jnp.ndarray = None     # (W, Kn)


class EstimateResult(NamedTuple):
    x: jnp.ndarray            # (W,15)
    degenerate: jnp.ndarray   # () bool
    fail: jnp.ndarray         # () bool
    sv_min: jnp.ndarray       # () localizability min singular value
    prior: solver.Prior       # updated marginalization prior
    rfs: reduced.ReducedFactor  # (W,) updated cached point factors
    n_line: jnp.ndarray       # () valid line factors (diagnostics)
    n_plane: jnp.ndarray      # () valid plane factors
    # (3,3) summed plane-normal Gram Σ ω ωᵀ over valid window frames (the
    # localizability matrix) — the pipeline's direction-selective
    # degenerate update projects window deltas onto its observable
    # eigenvectors (the principled form of Estimator.cpp:1050-1066's
    # keep-x/y-hold-z fallback)
    NtN: jnp.ndarray


def _rf_set_slot(rfs, rf, slot):
    """Write one frame's ReducedFactor into the (W,)-stacked pytree."""
    return jax.tree.map(
        lambda a, v: a.at[slot].set(v.astype(a.dtype)), rfs, rf)


def _localizability_rfs(rfs, frame_valid, cfg):
    """checkLocalizability over the union of window frames' plane normals.

    NtN = Σ ω ωᵀ is additive over frames, so the cached per-frame sums
    reproduce the reference's stacked-normal SVD (Estimator.cpp:536-565)
    without keeping normals around.
    """
    m = frame_valid.astype(rfs.NtN.dtype)
    NtN = jnp.sum(rfs.NtN * m[:, None, None], axis=0)
    n = jnp.sum(jnp.where(frame_valid, rfs.n_normal, 0))
    return factors.localizability_ntn(NtN, n, cfg)


def _assoc_frame(x, stacks: Stacks, slot, vm_corner, vm_surf, vm_lc, vm_ls,
                 vm_non, Rbl, tbl, cfg, thres, weight_tan, huber,
                 frame_valid, cached=None):
    """Build one window frame's ReducedFactor at its current pose.

    Returns (ReducedFactor, BlocksCache); pass the cache back to
    re-associate the same frame gather-free (reduced.build_reduced)."""
    fstack = Stacks(*(a[slot] if a is not None else None for a in stacks))
    return reduced.build_reduced(
        x[slot, :6], fstack, vm_corner, vm_surf, Rbl, tbl, cfg,
        thres, weight_tan, huber, frame_valid[slot],
        vm_local_corner=vm_lc, vm_local_surf=vm_ls, vm_non=vm_non,
        cached=cached)


def estimate(x0, stacks: Stacks, cached_rfs, vm_corner, vm_surf, preint,
             pair_valid, prior: solver.Prior, frame_valid, gravity, Rbl, tbl,
             cfg, full_window, refresh_slot, do_marginalize=None,
             vm_local_corner=None, vm_local_surf=None, vm_non=None):
    """One scan's window optimization.  `full_window` is a traced bool.

    `cached_rfs`: (W,)-stacked ReducedFactors carried in the pipeline
    state (already shifted so slot W-1 is this scan's — its content is
    rebuilt here).  `refresh_slot`: rotating old-frame slot index to
    rebuild this scan (see cfg.solver.refresh_old_frames).  Returns
    EstimateResult (incl. the updated factors to carry); the prior is
    updated (marginalization) only when `full_window & do_marginalize`.
    """
    s = cfg.solver
    W = x0.shape[0]
    dtype = x0.dtype
    if do_marginalize is None:
        do_marginalize = full_window

    sched_short = jnp.asarray(
        ([s.thres_dist_short, 10.0]
         + [s.thres_dist] * max(s.max_outer_iters - 2, 0))
        [:max(s.max_outer_iters, 1)], dtype)
    sched_full = jnp.full((s.max_outer_iters,), s.thres_dist, dtype)
    sched = jnp.where(full_window, sched_full, sched_short)
    weight_tan = jnp.where(full_window, s.plan_weight_tan, 0.0).astype(dtype)
    huber = jnp.where(full_window, _HUBER_OFF, s.huber_delta_scale).astype(dtype)

    vm_lc = vm_local_corner if cfg.use_local_map else None
    vm_ls = vm_local_surf if cfg.use_local_map else None

    vm_n = vm_non if cfg.use_nonfeature else None

    def assoc(x, slot, thres, cached=None):
        return _assoc_frame(x, stacks, slot, vm_corner, vm_surf, vm_lc,
                            vm_ls, vm_n, Rbl, tbl, cfg, thres, weight_tan,
                            huber, frame_valid, cached=cached)

    # ---- round 0 associations: newest frame + stalest old slots ---------
    # Old-slot refresh priority: frames with an EMPTY cached factor (e.g.
    # the just-initialized keyframes) first, then the frame whose pose has
    # moved farthest from its association-time position (the association's
    # 5-NN sets only drift when the pose does); `refresh_slot` (a rotating
    # index from the pipeline) breaks exact ties so a stationary window
    # still cycles.
    rf_new, blkc = assoc(x0, W - 1, sched[0])
    rfs = _rf_set_slot(cached_rfs, rf_new, W - 1)
    n_old = min(s.refresh_old_frames, W - 1)
    if n_old > 0:
        moved = jnp.linalg.norm(x0[:W - 1, 0:3] - cached_rfs.o[:W - 1],
                                axis=-1)
        empty = (cached_rfs.n_line + cached_rfs.n_plane)[:W - 1] == 0
        fv_old = frame_valid[:W - 1]
        tie = (jnp.arange(W - 1) == refresh_slot).astype(dtype) * 1e-3
        score = jnp.where(fv_old,
                          moved + 1e6 * (empty & fv_old) + tie, -jnp.inf)
        _, slots = jax.lax.top_k(score, n_old)
        for j in range(n_old):
            rf_j, _ = assoc(x0, slots[j], sched[0])
            rfs = _rf_set_slot(rfs, rf_j, slots[j])
    deg, fail, sv = _localizability_rfs(rfs, frame_valid, cfg)

    # short-window mode re-associates the newest frame every round at the
    # widening member thresholds; full-window mode refreshes it in the
    # first `full_reassoc_rounds` rounds (see module docstring)
    refresh_full = jnp.arange(1, s.max_outer_iters) < s.full_reassoc_rounds
    conv_rot = jnp.asarray(jnp.deg2rad(s.converge_rot_deg), dtype)
    fvf = frame_valid.astype(dtype)

    def round_fn(carry, inp):
        thres_i, refresh_flag, inner_cap, can_break = inp
        x, rfs, deg, fail, sv, conv, fresh, odone = carry
        # unchanged targets + converged LM: further solves are identical —
        # `skip` zeroes the solve's iterations (the reference's outer
        # convergence break, Estimator.cpp:1448)
        cap = jnp.where(full_window, inner_cap, s.max_inner_iters)
        res = solver.lm_solve(
            x, rfs, preint, pair_valid, prior, frame_valid, gravity,
            cfg, cap, skip=(conv & ~fresh) | odone)
        dxr = res.x - x
        x = res.x
        conv = res.converged
        # outer convergence (Estimator.cpp:1448, cfg converge_trans /
        # converge_rot_deg): one whole solve moved every pose by less than
        # the gates -> the reference breaks its iterOpt loop; here the
        # remaining rounds' re-associations and solves are skipped.  Only
        # applied in full-window mode — the short-window threshold schedule
        # (25 -> 10 -> 1) must re-associate at the tighter gates regardless.
        dt_rnd = jnp.max(jnp.linalg.norm(dxr[:, 0:3], axis=-1) * fvf)
        dr_rnd = jnp.max(jnp.linalg.norm(dxr[:, 3:6], axis=-1) * fvf)
        # `can_break` holds the break back until the full_reassoc_rounds
        # target refreshes have happened: the 0.05 m/deg gates are coarse
        # enough to fire after round 1, and skipping the post-solve
        # re-association re-opens the stale-target velocity-decay loop the
        # refresh exists to break (see cfg.full_reassoc_rounds)
        odone = odone | (can_break & full_window
                         & (dt_rnd < s.converge_trans)
                         & (dr_rnd < conv_rot))

        # re-associate the NEWEST frame for the next round at its updated
        # pose.  Re-selection runs on the ROUND-0 cached candidate blocks
        # (closure `blkc`) — zero new stencil gathers (the dominant
        # association cost; see factors.StackBlocks).  Under a batched
        # vmap both cond branches execute, so keeping this branch cheap
        # is what makes extra rounds affordable.
        def reassociate(_):
            rf_n, _ = assoc(x, W - 1, thres_i, cached=blkc)
            rfs_n = _rf_set_slot(rfs, rf_n, W - 1)
            deg_i, fail_i, sv_i = _localizability_rfs(rfs_n, frame_valid,
                                                      cfg)
            return rfs_n, deg | deg_i, fail | fail_i, sv_i

        def frozen(_):
            return rfs, deg, fail, sv

        do_refresh = (jnp.logical_not(full_window) | refresh_flag) & ~odone
        rfs, deg, fail, sv = jax.lax.cond(do_refresh, reassociate,
                                          frozen, None)
        return (x, rfs, deg, fail, sv, conv, do_refresh, odone), None

    # the first solve (from the predicted window) gets the full budget;
    # later rounds start from an optimized window and get a short one
    caps = jnp.asarray(([s.max_inner_iters]
                        + [s.max_inner_iters_later]
                        * max(s.max_outer_iters - 2, 0))
                       [:max(s.max_outer_iters - 1, 0)], jnp.int32)
    can_break = jnp.arange(1, s.max_outer_iters) >= s.full_reassoc_rounds
    carry0 = (x0, rfs, deg, fail, sv, jnp.asarray(False),
              jnp.asarray(True), jnp.asarray(False))
    (x, rfs, deg, fail, sv, conv, fresh, odone), _ = jax.lax.scan(
        round_fn, carry0, (sched[1:], refresh_full, caps, can_break))
    # final solve with the last associations (no-op if already converged
    # on unchanged targets)
    res = solver.lm_solve(x, rfs, preint, pair_valid, prior,
                          frame_valid, gravity, cfg,
                          jnp.where(full_window, s.max_inner_iters_later,
                                    s.max_inner_iters),
                          skip=(conv & ~fresh) | odone)
    x = res.x

    rf0 = jax.tree.map(lambda a: a[0], rfs)
    new_prior = solver.marginalize(x, rf0, preint, prior, gravity, cfg)
    marg = full_window & do_marginalize
    new_prior = jax.tree.map(lambda a, b: jnp.where(marg, a, b),
                             new_prior, prior)

    fvl = frame_valid
    NtN = jnp.sum(rfs.NtN * fvl.astype(dtype)[:, None, None], axis=0)
    return EstimateResult(
        x=x, degenerate=deg, fail=fail, sv_min=sv, prior=new_prior, rfs=rfs,
        n_line=jnp.sum(jnp.where(fvl, rfs.n_line, 0)).astype(jnp.int32),
        n_plane=jnp.sum(jnp.where(fvl, rfs.n_plane, 0)).astype(jnp.int32),
        NtN=NtN)
