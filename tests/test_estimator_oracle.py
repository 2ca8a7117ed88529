"""Association + point-factor parity vs the reference transcription oracle.

tests/estimator_oracle.py is a literal numpy transcription of
processPointToLine / processPointToPlanVec (Estimator.cpp:148-696) and the
point cost functors (ceresfunc.h:397-570).  This file quantifies every
deviation of the production path against it on a controlled scene:

* scene: one rough plane + two horizontal rods, one map point per voxel
  cell (so voxel centroids == the points the oracle's exact 5-NN sees,
  and the stencil-bounded gather finds the same 5 neighbors the
  reference's unbounded kd-tree search would);
* association: valid masks, line directions, plane normals, projections;
* residuals: line + plan-vec values at a perturbed pose, exact;
* one Gauss-Newton step: direction + magnitude of the 6-dof pose update
  from identical targets (what Ceres' dogleg takes inside the trust
  region, Estimator.cpp:1425-1432).

Documented deviations exercised here:
* plane fit form — centered-scatter eigenvector (repo) vs
  colPivHouseholderQr of ax+by+cz+1=0 (reference, coordinate-dependent
  and f32-unsafe at range, see factors._plane_fit) — normals agree to
  |dot| > 0.995 on this scene;
* plane_scatter_ratio gate (repo improvement, default on) — faithful
  mode (ratio=0) matches the reference acceptance exactly on this scene.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmloam_tpu.config import tiny_config
from mmloam_tpu.estimator import factors
from mmloam_tpu.ops import voxelmap as vx
from tests import estimator_oracle as oracle

THRES = 2.0          # squared-distance gate (member schedule value)
WTAN = 0.0003


def _scene(seed=0):
    """Map points, one per 0.4 m voxel cell: a z=0.9 plane patch and two
    rods along x.  In-cell jitter keeps each point inside its own cell."""
    rng = np.random.default_rng(seed)
    vsize = 0.4

    def cell_center(i, j, k):
        return (np.array([i, j, k], np.float64) + 0.5) * vsize

    pts = []
    for i in range(-8, 9):
        for j in range(-8, 9):
            p = cell_center(i, j, 2)
            p[:2] += rng.uniform(-0.08, 0.08, 2)
            p[2] += rng.uniform(-0.03, 0.03)      # rough plane near z=0.9
            pts.append(p)
    n_plane = len(pts)
    for i in range(-8, 9):
        for (j, k) in ((-4, 6), (5, 7)):
            p = cell_center(i, j, k)
            p[0] += rng.uniform(-0.08, 0.08)
            p[1:] += rng.uniform(-0.02, 0.02, 2)  # rods along x
            pts.append(p)
    pts = np.asarray(pts)
    return pts[:n_plane], pts[n_plane:], rng


def _build_maps(plane_pts, rod_pts, mcfg):
    vm_surf = vx.insert(vx.empty_map(mcfg),
                        jnp.asarray(plane_pts, jnp.float32),
                        jnp.ones(len(plane_pts), bool), mcfg)
    vm_corner = vx.insert(vx.empty_map(mcfg),
                          jnp.asarray(rod_pts, jnp.float32),
                          jnp.ones(len(rod_pts), bool), mcfg)
    return vm_surf, vm_corner


def _pose():
    x6 = np.array([0.12, -0.07, 0.04, 0.015, -0.02, 0.03])
    Rbl = oracle.so3_exp([0.01, -0.015, 0.02])
    tbl = np.array([0.05, 0.08, -0.03])
    return x6, Rbl, tbl


def _queries(world_q, x6, Rbl, tbl):
    """Lidar-frame points whose world image is world_q under (x6, Tbl)."""
    R_wl, t_wl = oracle._pose_chain(x6, Rbl, tbl)
    return (world_q - t_wl[None, :]) @ R_wl


@pytest.fixture(scope="module")
def scene():
    plane_pts, rod_pts, rng = _scene()
    cfg = tiny_config()
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver,
                                                 plane_scatter_ratio=0.0))
    vm_surf, vm_corner = _build_maps(plane_pts, rod_pts, cfg.map)
    x6, Rbl, tbl = _pose()

    qs_w = plane_pts[rng.choice(len(plane_pts), 64, replace=False)]
    qs_w = qs_w + rng.uniform(-0.05, 0.05, qs_w.shape)
    qc_w = rod_pts[rng.choice(len(rod_pts), 32, replace=False)]
    qc_w = qc_w + rng.uniform(-0.03, 0.03, qc_w.shape)
    return dict(cfg=cfg, plane_pts=plane_pts, rod_pts=rod_pts,
                vm_surf=vm_surf, vm_corner=vm_corner, x6=x6, Rbl=Rbl,
                tbl=tbl, qs_w=qs_w, qc_w=qc_w, rng=rng)


def test_line_association_matches_oracle(scene):
    x6, Rbl, tbl = scene["x6"], scene["Rbl"], scene["tbl"]
    q_l = _queries(scene["qc_w"], x6, Rbl, tbl)
    # repo path (world points derived inside from the same pose chain)
    lt = factors.associate_lines(
        jnp.asarray(x6, jnp.float32), jnp.asarray(q_l, jnp.float32),
        jnp.ones(len(q_l), bool), scene["vm_corner"],
        jnp.asarray(Rbl, jnp.float32), jnp.asarray(tbl, jnp.float32),
        scene["cfg"], THRES)
    ov, oc, ou = oracle.line_assoc(scene["rod_pts"], scene["qc_w"], THRES)

    rv = np.asarray(lt.valid)
    # DEVIATION (documented, SURVEY §7 "KNN replacement"): the reference's
    # kd-tree 5-NN is range-unbounded; the repo gathers within a
    # (2,2,1)-cell stencil window, so a query whose 5th neighbor lies
    # beyond the window (rod gaps up to ~0.96 m here) starves and drops
    # the factor.  Starvation only ever REMOVES acceptances — the repo
    # must never accept where the oracle rejects.
    assert not (rv & ~ov).any(), "repo accepted where the reference rejects"
    agree = (rv == ov).mean()
    assert agree >= 0.85, (agree, rv.sum(), ov.sum())
    both = rv & ov
    assert both.sum() >= 0.7 * len(q_l)
    dots = np.abs(np.sum(np.asarray(lt.u)[both] * ou[both], axis=-1))
    assert (dots > 0.995).all(), dots.min()
    # centroid parity: voxel centroids == map points (1 pt/cell) so the
    # fitted centroid matches the oracle's 5-NN mean to f32 noise
    np.testing.assert_allclose(np.asarray(lt.c)[both], oc[both],
                               rtol=0, atol=5e-3)


def test_plane_association_matches_oracle(scene):
    x6, Rbl, tbl = scene["x6"], scene["Rbl"], scene["tbl"]
    q_l = _queries(scene["qs_w"], x6, Rbl, tbl)
    pt, omega, _ = factors.associate_planes(
        jnp.asarray(x6, jnp.float32), jnp.asarray(q_l, jnp.float32),
        jnp.ones(len(q_l), bool), scene["vm_surf"],
        jnp.asarray(Rbl, jnp.float32), jnp.asarray(tbl, jnp.float32),
        scene["cfg"], THRES, WTAN)
    ov, oproj, oomega, _ = oracle.plane_assoc(
        scene["plane_pts"], scene["qs_w"], THRES, WTAN)

    rv = np.asarray(pt.valid)
    agree = (rv == ov).mean()
    assert agree >= 0.92, (agree, rv.sum(), ov.sum())
    both = rv & ov
    assert both.sum() >= 0.7 * len(q_l)
    # DEVIATION (documented): centered-eigen total-LS normal vs the
    # reference's QR fit of ax+by+cz+1=0 — same plane, different noise
    # response; on this rough-plane scene they agree to |dot| > 0.995.
    dots = np.abs(np.sum(np.asarray(omega)[both] * oomega[both], axis=-1))
    assert (dots > 0.995).all(), dots.min()
    np.testing.assert_allclose(np.asarray(pt.proj)[both], oproj[both],
                               rtol=0, atol=1.5e-2)


def test_scatter_gate_is_the_only_acceptance_deviation(scene):
    """plane_scatter_ratio > 0 (the default improvement) only ever REMOVES
    acceptances relative to the faithful/reference gate set."""
    cfg_faith = scene["cfg"]
    cfg_dflt = cfg_faith.replace(solver=dataclasses.replace(
        cfg_faith.solver, plane_scatter_ratio=0.01))
    x6, Rbl, tbl = scene["x6"], scene["Rbl"], scene["tbl"]
    q_l = _queries(scene["qs_w"], x6, Rbl, tbl)
    args = (jnp.asarray(x6, jnp.float32), jnp.asarray(q_l, jnp.float32),
            jnp.ones(len(q_l), bool), scene["vm_surf"],
            jnp.asarray(Rbl, jnp.float32), jnp.asarray(tbl, jnp.float32))
    pt_f, _, _ = factors.associate_planes(*args, cfg_faith, THRES, WTAN)
    pt_d, _, _ = factors.associate_planes(*args, cfg_dflt, THRES, WTAN)
    vf, vd = np.asarray(pt_f.valid), np.asarray(pt_d.valid)
    assert not (vd & ~vf).any()          # gate only subtracts


def test_line_residual_matches_oracle(scene):
    """Identical targets -> repo line_residual == transcription * lidar_m."""
    x6, Rbl, tbl = scene["x6"], scene["Rbl"], scene["tbl"]
    ov, oc, ou = oracle.line_assoc(scene["rod_pts"], scene["qc_w"], THRES)
    sel = np.where(ov)[0][:16]
    q_l = _queries(scene["qc_w"][sel], x6, Rbl, tbl)
    tgt = factors.LineTargets(p_l=jnp.asarray(q_l),
                              c=jnp.asarray(oc[sel]),
                              u=jnp.asarray(ou[sel]),
                              valid=jnp.ones(len(sel), bool))
    r_repo = np.asarray(factors.line_residual(
        jnp.asarray(x6), tgt, jnp.asarray(Rbl), jnp.asarray(tbl)))
    r_or = np.array([oracle.line_residual(x6, q_l[i], oc[sel][i],
                                          ou[sel][i], Rbl, tbl)[0]
                     for i in range(len(sel))])
    # repo residuals are metric (lidar-sigma scaling folded into the
    # solver); the transcription carries the reference's 1/lidar_m
    np.testing.assert_allclose(r_repo, r_or * oracle.LIDAR_M,
                               rtol=1e-6, atol=1e-10)


def test_planvec_residual_matches_oracle(scene):
    """Same targets -> identical residual norms + normal components (the
    tangent frame differs by a rotation the isotropic weights erase)."""
    x6, Rbl, tbl = scene["x6"], scene["Rbl"], scene["tbl"]
    ov, oproj, oomega, osi = oracle.plane_assoc(
        scene["plane_pts"], scene["qs_w"], THRES, WTAN)
    sel = np.where(ov)[0][:16]
    q_l = _queries(scene["qs_w"][sel], x6, Rbl, tbl)

    basis = jax.vmap(factors._plane_basis)(jnp.asarray(oomega[sel]))
    w3 = jnp.array([1.0, WTAN, WTAN])
    sqrt_info = w3[None, :, None] * basis
    tgt = factors.PlaneTargets(p_l=jnp.asarray(q_l),
                               proj=jnp.asarray(oproj[sel]),
                               sqrt_info=sqrt_info,
                               valid=jnp.ones(len(sel), bool))
    r_repo = np.asarray(factors.plane_residual(
        jnp.asarray(x6), tgt, jnp.asarray(Rbl), jnp.asarray(tbl)))
    r_or = np.stack([oracle.planvec_residual(x6, q_l[i], oproj[sel][i],
                                             osi[sel][i], Rbl, tbl)
                     for i in range(len(sel))])
    r_or = r_or * oracle.LIDAR_M
    np.testing.assert_allclose(np.linalg.norm(r_repo, axis=-1),
                               np.linalg.norm(r_or, axis=-1),
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.abs(r_repo[:, 0]), np.abs(r_or[:, 0]),
                               rtol=1e-5, atol=1e-10)


def test_gn_step_matches_oracle(scene):
    """One Gauss-Newton iteration from identical targets: step direction
    within 0.3 deg, magnitude within 0.5% (Jacobian + normal-equation
    parity; the reference's dogleg takes exactly this step inside the
    trust region)."""
    x6, Rbl, tbl = scene["x6"], scene["Rbl"], scene["tbl"]
    lv, lc, lu = oracle.line_assoc(scene["rod_pts"], scene["qc_w"], THRES)
    pv, pproj, pomega, psi = oracle.plane_assoc(
        scene["plane_pts"], scene["qs_w"], THRES, WTAN)
    lsel = np.where(lv)[0][:24]
    psel = np.where(pv)[0][:40]
    ql = _queries(scene["qc_w"][lsel], x6, Rbl, tbl)
    qp = _queries(scene["qs_w"][psel], x6, Rbl, tbl)

    # perturb the pose so residuals are non-trivial
    x6p = x6 + np.array([0.03, -0.02, 0.015, 0.01, 0.008, -0.012])

    dx_or, _, _ = oracle.gn_step(x6p, ql, lc[lsel], lu[lsel], qp,
                                 pproj[psel], psi[psel], Rbl, tbl)

    basis = jax.vmap(factors._plane_basis)(jnp.asarray(pomega[psel]))
    w3 = jnp.array([1.0, WTAN, WTAN])
    ptgt = factors.PlaneTargets(p_l=jnp.asarray(qp),
                                proj=jnp.asarray(pproj[psel]),
                                sqrt_info=w3[None, :, None] * basis,
                                valid=jnp.ones(len(psel), bool))
    ltgt = factors.LineTargets(p_l=jnp.asarray(ql),
                               c=jnp.asarray(lc[lsel]),
                               u=jnp.asarray(lu[lsel]),
                               valid=jnp.ones(len(lsel), bool))

    def stacked(x):
        rl = factors.line_residual(x, ltgt, jnp.asarray(Rbl),
                                   jnp.asarray(tbl))
        rp = factors.plane_residual(x, ptgt, jnp.asarray(Rbl),
                                    jnp.asarray(tbl))
        return jnp.concatenate([rl, rp.reshape(-1)])

    x = jnp.asarray(x6p)
    r0 = stacked(x)
    J = jax.jacrev(stacked)(x)
    JtJ = np.asarray(J.T @ J)
    Jtr = np.asarray(J.T @ r0)
    dx_repo = np.linalg.solve(JtJ + 1e-9 * np.eye(6), -Jtr)

    cos = dx_repo @ dx_or / (np.linalg.norm(dx_repo)
                             * np.linalg.norm(dx_or))
    assert cos > 0.99999, cos
    ratio = np.linalg.norm(dx_repo) / np.linalg.norm(dx_or)
    assert abs(ratio - 1.0) < 5e-3, ratio
