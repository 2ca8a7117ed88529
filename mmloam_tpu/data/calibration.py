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
def _icp_core(src, src_mask, vm, x0, cfg, iters, src_normals=None,
              gicp_eps=0.05):
    """Point-to-plane GN, optionally GICP(plane-to-plane)-weighted.

    With `src_normals` (unit normals of the SOURCE cloud's local surfaces,
    zero rows where unknown), each residual is scaled by the
    generalized-ICP Mahalanobis weight for disk covariances
    (C = R_plane diag(eps,1,1) R_plane^T on both surfaces, the standard
    GICP surface model):  sigma^2 = n_dst^T (C_dst + R C_src R^T) n_dst
    = 2 eps + (1 - (n_dst . R n_src)^2), so correspondences whose surface
    orientations disagree after rotation (grazing matches, mixed
    structures) are down-weighted exactly as PCL GICP does
    (calibratePCLICP, lidars_extrinsic_cali.h:493-563).  Without normals
    the weight is the plain point-to-plane 1.
    """
    mcfg = cfg.map

    # annealed correspondence gate: 2 m (the PCL GICP corr dist) for the
    # first iterations, shrinking 0.75x per iteration to a 0.25 m floor.
    # A FIXED 2 m gate in a room-scale scene lets structured outliers
    # (clutter present in one sweep only) latch onto distant surfaces and
    # makes the solve bistable — ulp-level input differences flipped the
    # converged basin (observed f32 vs f64 runs of identical inputs);
    # annealing keeps the wide basin for the initial pull-in and then
    # trims every far match, which is what PCL's correspondence rejection
    # accomplishes.
    gates = jnp.maximum(2.0 * 0.75 ** jnp.arange(iters), 0.25) ** 2

    def gn_step(x, gate2):
        R = lie.exp_matrix(x[3:6])
        t = x[0:3]
        pw = src @ R.T + t[None, :]
        nbr, nvalid, d2 = voxelmap.query_knn(vm, pw, src_mask, mcfg)
        k = mcfg.knn
        have = nvalid[:, k - 1] & (d2[:, k - 1] < gate2)
        # CENTERED total-LS plane fit (smallest eigenvector of the
        # query-relative scatter) — the ax+by+cz+1=0 fit on ABSOLUTE
        # coordinates this replaces is f32-catastrophic at range (the
        # n q q^T cancellation tilts normals ~1e-2; see the same analysis
        # in factors._plane_fit), which made the GN iteration chaotic on
        # cluttered scenes
        rel = nbr - pw[:, None, :]                     # (K,k,3) small coords
        mu = jnp.mean(rel, axis=1)
        cen = rel - mu[:, None, :]
        scov = jnp.einsum("kij,kil->kjl", cen, cen)
        sev = linalg3.eigvalsh3(scov)
        omega = linalg3.smallest_eigvec3(scov, sev)
        # signed query-to-plane distance: plane passes through pw + mu
        pd_q = -jnp.einsum("kj,kj->k", omega, mu)
        planar = jnp.all(
            jnp.abs(jnp.einsum("kij,kj->ki", cen, omega)) <= 0.2, axis=-1)
        w = (have & planar & src_mask).astype(src.dtype)
        if src_normals is not None:
            ns_w = src_normals @ R.T                      # rotated src normals
            cos2 = jnp.einsum("kj,kj->k", omega, ns_w) ** 2
            known = jnp.sum(src_normals * src_normals, axis=-1) > 0.5
            wg = jnp.sqrt((2.0 * gicp_eps)
                          / (2.0 * gicp_eps + 1.0 - cos2))
            w = w * jnp.where(known, wg, 1.0)
        r0 = pd_q
        # Huber(0.1 m) robust reweight: an undamped least-squares step on
        # cluttered correspondences is chaotic (structured outliers several
        # sigma out dominate the quadratic cost and ulp-level input noise
        # flips the converged basin); sqrt(rho'/1) caps their influence
        w = w / jnp.sqrt(jnp.maximum(jnp.abs(r0) / 0.1, 1.0))
        r = r0 * w

        # J of the point-to-plane residual wrt [dt, dphi] (left-perturbation
        # R <- exp(dphi) R): dr/ddt = omega, dr/ddphi = (R p) x omega
        Jt = omega                                   # (K,3)
        Jr = jnp.cross(pw - t[None, :], omega)       # (K,3)
        J = jnp.concatenate([Jt, Jr], axis=-1) * w[:, None]
        H = J.T @ J
        # Levenberg damping relative to the diagonal scale: bounds the
        # step when the 6x6 system is ill-conditioned (grazing geometry)
        H = H + (1e-3 * jnp.diag(jnp.diagonal(H))
                 + 1e-6 * jnp.eye(6, dtype=src.dtype))
        g = J.T @ r
        dx = -jnp.linalg.solve(H, g)
        x = x.at[0:3].add(dx[0:3])
        # compose rotation properly: R <- exp(dphi) R
        Rn = lie.exp_matrix(dx[3:6]) @ lie.exp_matrix(x[3:6])
        x = x.at[3:6].set(lie.log_matrix(Rn))
        resid = jnp.sum(jnp.abs(r)) / jnp.maximum(jnp.sum(w), 1.0)
        return x, (resid, jnp.sum(w))

    x, (resids, counts) = jax.lax.scan(gn_step, x0, gates)
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


def _cloud_normals(pts, mask, cfg, voxel):
    """Unit surface normals of a cloud from its OWN neighborhoods.

    Builds a fine torus map over the cloud and plane-fits each point's
    stencil neighborhood (the same machinery the estimator uses); rows are
    zero where the fit fails (the GICP weight then falls back to
    point-to-plane for that point).
    """
    import numpy as np

    mcfg = _fitted_map_config(cfg.map, np.asarray(pts), voxel,
                              stencil=(2, 2, 2), mask=np.asarray(mask))
    vm = voxelmap.insert(voxelmap.empty_map(mcfg), pts, mask, mcfg)
    _, n, s1, s2, _ = _moments(vm, pts, mask, mcfg)
    nf = jnp.maximum(n, 1.0).astype(pts.dtype)
    mu = s1 / nf[:, None]
    scov = s2 - nf[:, None, None] * mu[:, None, :] * mu[:, :, None]
    sev = linalg3.eigvalsh3(scov)
    omega = linalg3.smallest_eigvec3(scov, sev)
    ok = (n >= 4) & (sev[:, 1] > 0.05 * sev[:, 2]) & mask
    return jnp.where(ok[:, None], omega, 0.0)


def _moments(vm, pw, mask, mcfg):
    dx, dy, dz, d2, ok = voxelmap.query_candidates(vm, pw, mask, mcfg)
    t_k, n, w = voxelmap.select_k_smallest(d2, ok, mcfg.knn)
    wf = w.astype(pw.dtype)
    red = lambda a: jnp.sum(a * wf, axis=(1, 2))
    s1 = jnp.stack([red(dx), red(dy), red(dz)], axis=-1)
    s2 = jnp.stack([
        jnp.stack([red(dx * dx), red(dx * dy), red(dx * dz)], axis=-1),
        jnp.stack([red(dx * dy), red(dy * dy), red(dy * dz)], axis=-1),
        jnp.stack([red(dx * dz), red(dy * dz), red(dz * dz)], axis=-1)],
        axis=-2)
    return t_k, n, s1, s2, w


def icp_extrinsic(src_pts, dst_pts, cfg, init_T=None, iters=30,
                  voxel=0.1, gicp=True):
    """Estimate T (4x4) aligning src onto dst (e.g. hori -> velo frame).

    `gicp=True` adds the plane-to-plane GICP weighting (see _icp_core) —
    the reference's calibratePCLICP runs PCL GeneralizedICP
    (lidars_extrinsic_cali.h:493-563).  Returns
    (T, mean_abs_residual, n_matches).
    """
    import numpy as np

    src = jnp.asarray(src_pts, jnp.float32)
    dst = jnp.asarray(dst_pts, jnp.float32)
    src_mask = _crop(src, jnp.isfinite(src).all(axis=-1))
    dst_mask = _crop(dst, jnp.isfinite(dst).all(axis=-1))

    src_normals = (_cloud_normals(src, src_mask, cfg, voxel)
                   if gicp else None)

    x0 = jnp.zeros(6, jnp.float32)
    if init_T is not None:
        T = np.asarray(init_T, np.float64)
        x0 = x0.at[0:3].set(jnp.asarray(T[:3, 3], jnp.float32))
        x0 = x0.at[3:6].set(lie.log_matrix(jnp.asarray(T[:3, :3],
                                                       jnp.float32)))

    # coarse-to-fine: the stencil's CAPTURE RADIUS is ~2 leaves per axis,
    # so a fine-leaf map cannot even see correspondences beyond ~2*voxel
    # of initial misalignment (a 0.2 m offset at voxel 0.08 leaves the
    # constraining surface invisible and that DoF silently unobserved —
    # the solve "converges" with near-zero residual at the wrong pose).
    # A coarse pass at 4x the leaf pulls the estimate into fine-capture
    # range first; PCL GICP's kd-tree search radius plays the same role.
    x = x0
    resid = n = None
    for lv_voxel, lv_iters in ((4.0 * voxel, max(iters // 2, 5)),
                               (voxel, iters)):
        mcfg = _fitted_map_config(cfg.map, np.asarray(dst_pts), lv_voxel,
                                  stencil=(2, 2, 2),
                                  mask=np.asarray(dst_mask))
        cfg2 = cfg.replace(map=mcfg)
        vm = voxelmap.insert(voxelmap.empty_map(mcfg), dst, dst_mask, mcfg)
        x, resid, n = _icp_core(src, src_mask, vm, x, cfg2, lv_iters,
                                src_normals=src_normals)
    T = np.eye(4)
    T[:3, :3] = np.asarray(lie.exp_matrix(x[3:6]))
    T[:3, 3] = np.asarray(x[0:3])
    return T, float(resid), int(n)


def align_startup(hori_frames, velo_cloud, cfg, init_T=None, iters=40,
                  voxel=0.08):
    """Startup extrinsic estimation: integrate several Horizon frames,
    then one GICP against the newest Velodyne cloud.

    Mirrors LidarsParamEstimator::hori_cloud_handler's integration phase
    (unionLidarsAligner.cpp:224-254: `_hori_igcloud += *pointCloudIn`
    for `_hori_itegrate_frames` messages, then calibratePCLICP against
    `_velo_new_cloud`).  `hori_frames` is a list of (Ni, 3) clouds in the
    Horizon frame (the rig is assumed static during integration, like the
    reference's startup).  Returns (T_hori_to_velo, resid, n_matches).
    """
    import numpy as np

    ig = np.concatenate([np.asarray(f, np.float32) for f in hori_frames],
                        axis=0)
    return icp_extrinsic(ig, velo_cloud, cfg, init_T=init_T, iters=iters,
                         voxel=voxel, gicp=True)


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
