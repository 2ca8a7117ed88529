"""Sensor-rig calibration utilities: lidar-to-lidar extrinsic + time offset.

Replaces the reference's mm_lidarsAligner capabilities:

* `icp_extrinsic` — point-to-plane ICP between two clouds, replacing the
  startup GICP (`calibratePCLICP`, lidars_extrinsic_cali.h:493-563: far
  filter 50 m, voxel 0.05, GICP maxIter 500 / corr dist 2 m) and the
  online re-refinement `icp_ext_matching` (unionFeatureExtract.cpp:74-141,
  re-run every `extrin_recali_times` frames, :302-312).  Uses the same
  torus voxel map + plane-fit machinery as the estimator, solved by
  Gauss-Newton on SE(3) (global log-rotation parameters, like the window
  solver).

* `estimate_time_offset` — velo->hori clock offset search, replacing
  `estimate_timeoffset` (unionLidarsAligner.cpp:1021-1165): slide the
  Horizon point stream against a Velodyne reference cloud and pick the
  offset minimizing mean nearest-neighbor distance.  The reference slides
  a 24000-point window at 10-point resolution during fast yaw motion; here
  each candidate offset slices the stream by time and scores against the
  map — one vmapped evaluation over the offset grid.

Both are host-called utilities (calibration happens once per dataset /
every N frames), but the inner loops are jitted JAX.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import lie
from ..ops import linalg3, voxelmap


def _crop(pts, mask, near=2.0, far=50.0):
    """removeNearFarPoints (lidars_extrinsic_cali.h:451-477)."""
    d = jnp.linalg.norm(pts, axis=-1)
    return mask & (d >= near) & (d <= far)


@partial(jax.jit, static_argnames=("cfg", "iters"))
def _icp_core(src, src_mask, vm, x0, cfg, iters):
    mcfg = cfg.map

    def gn_step(x, _):
        R = lie.exp_matrix(x[3:6])
        t = x[0:3]
        pw = src @ R.T + t[None, :]
        nbr, nvalid, d2 = voxelmap.query_knn(vm, pw, src_mask, mcfg)
        k = mcfg.knn
        have = nvalid[:, k - 1] & (d2[:, k - 1] < 4.0)  # GICP corr dist 2 m
        AtA = jnp.einsum("kij,kil->kjl", nbr, nbr)
        Atb = -jnp.sum(nbr, axis=1)
        sol = linalg3.solve3(AtA, Atb)
        ps = jnp.maximum(jnp.linalg.norm(sol, axis=-1), 1e-9)
        omega = sol / ps[:, None]
        pd = 1.0 / ps
        planar = jnp.all(
            jnp.abs(jnp.einsum("kij,kj->ki", nbr, omega) + pd[:, None]) <= 0.2,
            axis=-1)
        w = (have & planar & src_mask).astype(src.dtype)
        r = (jnp.einsum("kj,kj->k", pw, omega) + pd) * w

        # J of the point-to-plane residual wrt [dt, dphi] (left-perturbation
        # R <- exp(dphi) R): dr/ddt = omega, dr/ddphi = (R p) x omega
        Jt = omega                                   # (K,3)
        Jr = jnp.cross(pw - t[None, :], omega)       # (K,3)
        J = jnp.concatenate([Jt, Jr], axis=-1) * w[:, None]
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=src.dtype)
        g = J.T @ r
        dx = -jnp.linalg.solve(H, g)
        x = x.at[0:3].add(dx[0:3])
        # compose rotation properly: R <- exp(dphi) R
        Rn = lie.exp_matrix(dx[3:6]) @ lie.exp_matrix(x[3:6])
        x = x.at[3:6].set(lie.log_matrix(Rn))
        resid = jnp.sum(jnp.abs(r)) / jnp.maximum(jnp.sum(w), 1.0)
        return x, (resid, jnp.sum(w))

    x, (resids, counts) = jax.lax.scan(gn_step, x0, None, length=iters)
    return x, resids[-1], counts[-1]


def _fitted_map_config(map_cfg, pts, voxel, stencil=(2, 2, 2), mask=None,
                       max_cells=64_000_000):
    """Map config whose torus covers the cloud's bounding box alias-free.

    The pipeline's map dims assume lidar-range locality (insert_guard keeps
    everything within half a period of the pose); these one-shot
    calibration utilities instead insert a whole static cloud at a fine
    leaf, so the dims must be derived from the actual extent — otherwise
    points one torus period apart alias into the same cells within a
    single insert batch, which is undefined (mixed sums under one key).

    `mask` must cover exactly the points the caller will INSERT (e.g. the
    2-50 m crop): sizing from the raw cloud would let a few >100 m returns
    inflate the dims cubically (storage is extent^3/voxel^3 * 16 B) even
    though those points are never inserted.  `max_cells` caps the allocation
    (64 M cells = 1 GiB) with a clear error instead of an OOM.
    """
    import dataclasses

    import numpy as np

    sel = np.isfinite(pts).all(axis=-1)
    if mask is not None:
        sel = sel & np.asarray(mask)
    if not sel.any():
        raise ValueError("no points selected for map sizing")
    span = np.ptp(pts[sel], axis=0) / voxel + 2 * (np.asarray(stencil) + 4)
    packs = (map_cfg.pack_x, map_cfg.pack_y, map_cfg.pack_z)
    dims = [int(-(-s // p)) * p for s, p in zip(span, packs)]
    n_cells = dims[0] * dims[1] * dims[2]
    if n_cells > max_cells:
        raise ValueError(
            f"fitted map would need {n_cells} cells (> {max_cells}): "
            f"cloud extent {np.ptp(pts[sel], axis=0)} m at voxel {voxel} m — "
            "crop the cloud or use a coarser voxel")
    return dataclasses.replace(
        map_cfg, voxel_size=voxel, dim_x=dims[0], dim_y=dims[1],
        dim_z=dims[2], stencil_x=stencil[0], stencil_y=stencil[1],
        stencil_z=stencil[2])


def icp_extrinsic(src_pts, dst_pts, cfg, init_T=None, iters=30,
                  voxel=0.1):
    """Estimate T (4x4) aligning src onto dst (e.g. hori -> velo frame).

    Returns (T, mean_abs_residual, n_matches).
    """
    import numpy as np

    src = jnp.asarray(src_pts, jnp.float32)
    dst = jnp.asarray(dst_pts, jnp.float32)
    src_mask = _crop(src, jnp.isfinite(src).all(axis=-1))
    dst_mask = _crop(dst, jnp.isfinite(dst).all(axis=-1))

    mcfg = _fitted_map_config(cfg.map, np.asarray(dst_pts), voxel,
                              stencil=(2, 2, 2),
                              mask=np.asarray(dst_mask))
    cfg2 = cfg.replace(map=mcfg)
    vm = voxelmap.insert(voxelmap.empty_map(mcfg), dst, dst_mask, mcfg)

    x0 = jnp.zeros(6, jnp.float32)
    if init_T is not None:
        T = np.asarray(init_T, np.float64)
        x0 = x0.at[0:3].set(jnp.asarray(T[:3, 3], jnp.float32))
        x0 = x0.at[3:6].set(lie.log_matrix(jnp.asarray(T[:3, :3],
                                                       jnp.float32)))
    x, resid, n = _icp_core(src, src_mask, vm, x0, cfg2, iters)
    T = np.eye(4)
    T[:3, :3] = np.asarray(lie.exp_matrix(x[3:6]))
    T[:3, 3] = np.asarray(x[0:3])
    return T, float(resid), int(n)


def estimate_time_offset(hori_abs_t, hori_pts, velo_pts, velo_t0, velo_t1,
                         cfg, offsets, voxel=0.2):
    """Search the velo->hori time offset over an `offsets` grid.

    For each candidate offset, the Horizon points whose (shifted) times
    fall in [velo_t0, velo_t1) are scored by mean nearest-centroid distance
    against the Velodyne cloud; returns (best_offset, scores).
    Mirrors unionLidarsAligner.cpp:1077-1165 with the kd-tree replaced by
    the voxel map.
    """
    import numpy as np

    mcfg = _fitted_map_config(cfg.map, np.asarray(velo_pts), voxel,
                              stencil=(1, 1, 1))
    vm = voxelmap.insert(
        voxelmap.empty_map(mcfg), jnp.asarray(velo_pts, jnp.float32),
        jnp.isfinite(jnp.asarray(velo_pts, jnp.float32)).all(axis=-1), mcfg)
    hp = jnp.asarray(hori_pts, jnp.float32)
    ht = jnp.asarray(hori_abs_t, jnp.float32)

    gate = 2.0 * voxel

    @jax.jit
    def score(off):
        m = (ht - off >= velo_t0) & (ht - off < velo_t1)
        nbr, nvalid, d2 = voxelmap.query_knn(vm, hp, m, mcfg)
        d = jnp.sqrt(jnp.where(nvalid[:, 0], d2[:, 0], jnp.inf))
        # a far match carries no alignment information: gate it and charge
        # the same flat penalty as no-match, so the score stays sharp
        # regardless of how far the stencil window reaches
        ok = m & nvalid[:, 0] & (d < gate)
        pen = jnp.where(m & ~ok, gate, 0.0)
        tot = jnp.sum(jnp.where(ok, d, 0.0)) + jnp.sum(pen)
        return tot / jnp.maximum(jnp.sum(m), 1)

    scores = jax.vmap(score)(jnp.asarray(offsets, jnp.float32))
    best = int(jnp.argmin(scores))
    return float(offsets[best]), np.asarray(scores)
