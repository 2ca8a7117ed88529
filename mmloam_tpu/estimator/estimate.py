"""Estimator::Estimate orchestration — association rounds + LM solves.

Mirrors the reference's outer optimize loop (Estimator.cpp:1143-1581):

* **Full-window mode** (window == SLIDEWINDOWSIZE): associations are built
  ONCE at the entry poses and cached across outer iterations (the
  vLineFeatures/vPlanFeatures early-return path, Estimator.cpp:160-170,
  585-595), no robust loss, thres_dist=1, plan_weight_tan=3e-4.  The outer
  loop therefore only re-runs the same solve — equivalent to a single LM
  run with a larger iteration budget, which is what we do.

* **Short-window mode** (warmup / pre-init): associations are rebuilt every
  outer iteration at the updated poses with the member-variable threshold
  schedule 25 -> 10 -> 1 -> 1 -> 1 (Estimator.cpp:1203-1208 entry value,
  :1376-1380 per-iter updates), Huber(0.1) loss on point factors,
  plan_weight_tan=0.

Localizability/degeneracy is evaluated from the surf normals of every
fresh association round, OR-reduced (the reference's shared
`is_degenerate` flag can only be set, never cleared, across the per-frame
threads — Estimator.cpp:771-775).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import factors, solver


class Stacks(NamedTuple):
    """Downsampled per-frame feature stacks in the lidar frame."""

    corner: jnp.ndarray       # (W, Kc, 3)
    corner_mask: jnp.ndarray  # (W, Kc)
    surf: jnp.ndarray         # (W, Ks, 3)
    surf_mask: jnp.ndarray    # (W, Ks)


class EstimateResult(NamedTuple):
    x: jnp.ndarray            # (W,15)
    degenerate: jnp.ndarray   # () bool
    fail: jnp.ndarray         # () bool
    sv_min: jnp.ndarray       # () localizability min singular value
    prior: solver.Prior       # updated marginalization prior
    n_line: jnp.ndarray       # () valid line factors (diagnostics)
    n_plane: jnp.ndarray      # () valid plane factors


def _associate_all(x, stacks: Stacks, vm_corner, vm_surf, Rbl, tbl, cfg,
                   thres_dist, weight_tan, frame_valid):
    """Build factor targets for every window frame (vmapped)."""
    def one(x15, cpts, cmask, spts, smask, fv):
        lt = factors.associate_lines(x15[:6], cpts, cmask & fv, vm_corner,
                                     Rbl, tbl, cfg)
        pt, normals, nv = factors.associate_planes(
            x15[:6], spts, smask & fv, vm_surf, Rbl, tbl, cfg,
            thres_dist, weight_tan)
        return lt, pt, normals, nv

    lt, pt, normals, nv = jax.vmap(one)(
        x, stacks.corner, stacks.corner_mask, stacks.surf, stacks.surf_mask,
        frame_valid)
    return lt, pt, normals.reshape(-1, 3), nv.reshape(-1)


def estimate(x0, stacks: Stacks, vm_corner, vm_surf, preint, pair_valid,
             prior: solver.Prior, frame_valid, gravity, Rbl, tbl, cfg,
             full_window: bool, do_marginalize: bool = True):
    """One scan's window optimization.  Returns EstimateResult.

    `full_window` selects the reference's two regimes (see module doc).
    Static flag: the pipeline traces both variants it needs.
    """
    s = cfg.solver

    if full_window:
        lt, pt, normals, nv = _associate_all(
            x0, stacks, vm_corner, vm_surf, Rbl, tbl, cfg,
            s.thres_dist, s.plan_weight_tan, frame_valid)
        deg, fail, sv = factors.localizability(normals, nv, cfg)
        res = solver.lm_solve(
            x0, lt, pt, preint, pair_valid, prior, frame_valid, gravity,
            Rbl, tbl, cfg, s.max_outer_iters * s.max_inner_iters,
            huber_delta=None)
        x = res.x
        new_prior = prior
        if do_marginalize:
            new_prior = solver.marginalize(x, lt, pt, preint, prior, gravity,
                                           Rbl, tbl, cfg)
        n_line = jnp.sum(lt.valid).astype(jnp.int32)
        n_plane = jnp.sum(pt.valid).astype(jnp.int32)
        return EstimateResult(x=x, degenerate=deg, fail=fail, sv_min=sv,
                              prior=new_prior, n_line=n_line, n_plane=n_plane)

    # ---- short-window mode: re-associate with the threshold schedule ----
    sched = [s.thres_dist_short] + [10.0] + [s.thres_dist] * (s.max_outer_iters - 2)
    x = x0
    deg = jnp.asarray(False)
    fail = jnp.asarray(False)
    sv = jnp.asarray(-1.0, x0.dtype)
    n_line = jnp.int32(0)
    n_plane = jnp.int32(0)
    for thres in sched:
        lt, pt, normals, nv = _associate_all(
            x, stacks, vm_corner, vm_surf, Rbl, tbl, cfg,
            thres, 0.0, frame_valid)
        deg_i, fail_i, sv = factors.localizability(normals, nv, cfg)
        deg = deg | deg_i
        fail = fail | fail_i
        res = solver.lm_solve(
            x, lt, pt, preint, pair_valid, prior, frame_valid, gravity,
            Rbl, tbl, cfg, s.max_inner_iters,
            huber_delta=s.huber_delta_scale)
        x = res.x
        n_line = jnp.sum(lt.valid).astype(jnp.int32)
        n_plane = jnp.sum(pt.valid).astype(jnp.int32)
    return EstimateResult(x=x, degenerate=deg, fail=fail, sv_min=sv,
                          prior=prior, n_line=n_line, n_plane=n_plane)
