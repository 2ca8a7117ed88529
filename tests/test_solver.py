"""Solver tests: factor residuals vs ground truth, pose recovery, prior math."""

import numpy as np
import jax
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu import lie
from mmloam_tpu.data import synthetic
from mmloam_tpu.estimator import estimate, factors, reduced, solver
from mmloam_tpu.ops import voxelmap as vx
from mmloam_tpu.ops.preintegration import preintegrate, sqrt_info_from_cov
import pytest

CFG = tiny_config()
RBL = jnp.eye(3, dtype=jnp.float64)
TBL = jnp.zeros(3, dtype=jnp.float64)
LIDAR_M = CFG.imu.lidar_m


def build_world_maps(rng, n=24000):
    """Populate surf/corner maps from the default box world's surfaces.

    `n` must give real-scan-like density on the FAR walls: the association
    gate requires the 5th NN within sqrt(thres_dist)=1 m (Estimator.cpp
    member threshold schedule tail), and a starved far wall silently drops
    that wall's normal direction from the solve — measured with n=6000 the
    12 m x-walls starve at thres 1, the x direction becomes unobservable,
    and the associate->solve loop holds a spurious fixed point ~0.10 m off
    along x (scripts history: probe_outer).  Real accumulated maps are
    dense there; the map must be too.
    """
    world = synthetic.default_world()
    # sample wall points: cast rays from the center in random directions
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = world.raycast(np.zeros(3), dirs)
    ok = np.isfinite(r)
    pts = (dirs[ok] * r[ok][:, None]).astype(np.float64)
    vm_surf = vx.insert(vx.empty_map(CFG.map), jnp.asarray(pts),
                        jnp.ones(pts.shape[0], bool), CFG.map)
    # corner map: the four vertical pillar edges nearest the center
    zs = np.linspace(-1.5, 3.5, 200)
    edges = []
    for x, y in [(-5.5, -2.5), (5.5, -2.5), (-5.5, 2.5), (5.5, 2.5)]:
        edges.append(np.stack([np.full_like(zs, x), np.full_like(zs, y), zs], 1))
    epts = np.concatenate(edges).astype(np.float64)
    vm_corner = vx.insert(vx.empty_map(CFG.map), jnp.asarray(epts),
                          jnp.ones(epts.shape[0], bool), CFG.map)
    return world, vm_surf, vm_corner


def scan_points(world, R_wl, t_wl, rng, n=400, range_noise=0.003):
    """Lidar-frame points observed from a pose (surf samples on walls).

    `range_noise` matters: the association gate requires the point's
    geometric error against its fitted plane to exceed 1e-5
    (Estimator.cpp:1311-1317) — on a NOISE-FREE synthetic scan a point at
    the true pose lies exactly on its wall plane, so nearly every good
    factor is rejected there and the optimum equilibrates ~4 cm off truth
    where only junction-corrupted fits survive.  Real lidar noise
    (sigma >= 1.5 mm) keeps errors above the gate; 3 mm matches the other
    end-to-end tests.
    """
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs_w = dirs @ R_wl.T
    r = world.raycast(t_wl, dirs_w)
    ok = np.isfinite(r)
    r = r + rng.normal(scale=range_noise, size=r.shape)
    return (dirs * np.where(ok, r, 0.0)[:, None]).astype(np.float64), ok


def x_from_pose(R, t):
    x = np.zeros(15)
    x[0:3] = t
    x[3:6] = np.array(lie.log_matrix(jnp.asarray(R)))
    return x


@pytest.mark.slow
def test_single_frame_pose_recovery():
    rng = np.random.default_rng(0)
    world, vm_surf, vm_corner = build_world_maps(rng)
    R_gt = np.array(lie.exp_matrix(jnp.array([0.02, -0.03, 0.4])))
    t_gt = np.array([1.0, -0.5, 0.2])
    p_l, ok = scan_points(world, R_gt, t_gt, rng)

    # perturbed initial guess
    dx = np.array([0.08, -0.06, 0.04, 0.01, -0.015, 0.02])
    x0 = np.zeros((1, 15))
    x0[0] = x_from_pose(R_gt, t_gt)
    x0[0, :6] += dx

    x0 = jnp.asarray(x0)
    stacks = estimate.Stacks(
        corner=jnp.zeros((1, 8, 3)), corner_mask=jnp.zeros((1, 8), bool),
        surf=jnp.asarray(p_l)[None], surf_mask=jnp.asarray(ok)[None])
    preint = {k: jnp.zeros((1,) + s) for k, s in
              dict(dq=(4,), dp=(3,), dv=(3,), jac=(15, 15),
                   sqrt_info=(15, 15), dt=(), bg=(3,), ba=(3,)).items()}
    rfs0 = jax.tree.map(lambda a: jnp.zeros((1,) + a.shape, a.dtype),
                        reduced.empty_reduced(jnp.float64))
    res = estimate.estimate(
        x0, stacks, rfs0, vm_corner, vm_surf, preint, jnp.zeros(1, bool),
        solver.empty_prior(jnp.float64), jnp.ones(1, bool),
        jnp.array([0.0, 0.0, -9.805]), RBL, TBL, CFG, full_window=False,
        refresh_slot=jnp.int32(0))
    assert int(res.n_plane) > 200, "plane association should succeed"
    err_t = np.linalg.norm(np.array(res.x[0, 0:3]) - t_gt)
    err_r = np.linalg.norm(np.array(res.x[0, 3:6]) - x_from_pose(R_gt, t_gt)[3:6])
    # single-shot scan-to-map accuracy floor is set by mixed-surface voxels
    # at wall junctions corrupting a few plane fits (same failure mode as
    # the reference's 5-NN mixing two planes near corners); the end-to-end
    # sequence ATE test in test_pipeline.py is the tighter accuracy guard.
    assert err_t < 0.05, f"translation error {err_t}"
    assert err_r < 0.01, f"rotation error {err_r}"
    assert not bool(res.fail)


def test_localizability_flags_corridor():
    # normals spanning 3 directions -> localizable
    rng = np.random.default_rng(1)
    n3 = np.concatenate([np.tile(np.eye(3), (20, 1))])
    deg, fail, sv = factors.localizability(jnp.asarray(n3),
                                           jnp.ones(60, bool), CFG)
    assert not bool(fail) and float(sv) > 3.0
    # corridor: only 2 wall directions -> degenerate (z unconstrained has
    # normals; a corridor lacks the along-axis normal)
    n2 = np.tile(np.array([[1.0, 0, 0], [0, 0, 1.0]]), (30, 1))
    deg2, fail2, sv2 = factors.localizability(jnp.asarray(n2),
                                              jnp.ones(60, bool), CFG)
    assert bool(deg2) and bool(fail2)
    # too few normals -> fail
    deg3, fail3, sv3 = factors.localizability(jnp.asarray(n3),
                                              jnp.arange(60) < 5, CFG)
    assert bool(fail3) and float(sv3) == -1.0


def make_preint(traj, t_i, t_j, bg, ba, rate=200.0):
    acc, gyr, ts = synthetic.simulate_imu(traj, t_i, t_j, rate=rate)
    dts = np.diff(np.concatenate([[t_i], ts]))
    M = 64
    pad = lambda a: np.pad(a, [(0, M - a.shape[0])] + [(0, 0)] * (a.ndim - 1))
    mask = np.arange(M) < len(ts)
    r = preintegrate(jnp.asarray(pad(acc)), jnp.asarray(pad(gyr)),
                     jnp.asarray(pad(dts)), jnp.asarray(mask),
                     jnp.asarray(bg), jnp.asarray(ba), CFG.imu)
    return r


def test_imu_residual_zero_at_truth():
    traj = synthetic.Trajectory()
    t_i, t_j = 1.0, 1.1
    r = make_preint(traj, t_i, t_j, np.zeros(3), np.zeros(3))
    sqrt_info = LIDAR_M * sqrt_info_from_cov(r.cov)
    meas = dict(dq=r.dq, dp=r.dp, dv=r.dv, jac=r.jac, sqrt_info=sqrt_info,
                dt=r.dtime, bg=r.bg, ba=r.ba)

    def state_at(t):
        x = np.zeros(15)
        x[0:3] = traj.pos(t)
        x[3:6] = np.array(lie.log_matrix(jnp.asarray(traj.rot(t))))
        x[6:9] = traj.vel(t)
        return jnp.asarray(x)

    res = factors.imu_residual(state_at(t_i), state_at(t_j), meas,
                               jnp.array([0.0, 0.0, -9.805]))
    # residual is in sigma units; discretization error of the 200 Hz Euler
    # preintegration keeps it small but nonzero
    assert float(jnp.max(jnp.abs(res))) < 0.5, np.array(res)

    # a wrong state must produce a much larger residual
    xj_bad = state_at(t_j).at[0].add(0.05)
    res_bad = factors.imu_residual(state_at(t_i), xj_bad, meas,
                                   jnp.array([0.0, 0.0, -9.805]))
    assert float(jnp.max(jnp.abs(res_bad))) > 10.0 * float(jnp.max(jnp.abs(res)))


def test_imu_jacobian_matches_fd():
    traj = synthetic.Trajectory()
    r = make_preint(traj, 2.0, 2.08, np.zeros(3), np.zeros(3))
    sqrt_info = LIDAR_M * sqrt_info_from_cov(r.cov)
    meas = dict(dq=r.dq, dp=r.dp, dv=r.dv, jac=r.jac, sqrt_info=sqrt_info,
                dt=r.dtime, bg=r.bg, ba=r.ba)
    g = jnp.array([0.0, 0.0, -9.805])
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(0, 0.1, 30))

    f = lambda zz: factors.imu_residual(zz[:15], zz[15:], meas, g)
    J = np.array(jax.jacfwd(f)(z))
    h = 1e-6
    J_fd = np.zeros_like(J)
    for k in range(30):
        e = np.zeros(30); e[k] = h
        J_fd[:, k] = (np.array(f(z + jnp.asarray(e)))
                      - np.array(f(z - jnp.asarray(e)))) / (2 * h)
    np.testing.assert_allclose(J, J_fd, atol=1e-4 * max(1.0, np.abs(J).max()))


def test_marginalization_preserves_linear_minimum():
    """For a pure quadratic problem, marginalizing frame0 must leave the
    minimizer of the kept variables unchanged."""
    rng = np.random.default_rng(4)
    # random SPD 30x30 coupling both frames + linear term
    A = rng.normal(size=(40, 30))
    H = A.T @ A + np.eye(30) * 0.1
    x_star = rng.normal(size=30)        # ground-truth minimizer
    b = -H @ x_star                     # gradient at x=0

    # encode as a synthetic prior on frame0 + "IMU-like" coupling via the
    # solver's own marginalize: we instead test the Schur math directly.
    Hmm, Hmr, Hrr = H[:15, :15], H[:15, 15:], H[15:, 15:]
    bm, br = b[:15], b[15:]
    H_star = Hrr - Hmr.T @ np.linalg.inv(Hmm) @ Hmr
    b_star = br - Hmr.T @ np.linalg.inv(Hmm) @ bm
    x_kept = np.linalg.solve(H_star, -b_star)
    np.testing.assert_allclose(x_kept, x_star[15:], atol=1e-8)

    # now the solver's prior representation: lin_J/lin_r must reproduce
    # H_star, b_star through prior_residual's quadratic expansion
    evals, evecs = np.linalg.eigh(H_star)
    lin_J = np.sqrt(np.maximum(evals, 0))[:, None] * evecs.T
    lin_r = (1.0 / np.sqrt(np.maximum(evals, 1e-12)))[:, None] * evecs.T @ b_star
    prior = solver.Prior(lin_J=jnp.asarray(lin_J), lin_r=jnp.asarray(lin_r),
                         x0=jnp.zeros(15), valid=jnp.asarray(True))
    x = jnp.zeros((1, 15)).at[0].set(jnp.asarray(rng.normal(size=15)))
    # gradient of 0.5|r|^2 at x must equal H_star x + b_star
    gfun = jax.grad(lambda xx: 0.5 * jnp.sum(
        factors.prior_residual(xx, prior) ** 2))
    g = np.array(gfun(x[0]))
    np.testing.assert_allclose(g, H_star @ np.array(x[0]) + b_star, rtol=1e-6,
                               atol=1e-6)


def test_velocity_recovery():
    """The window solver must recover velocity from position evidence.

    Regression for two silent failure modes found together: (1) a zero
    residual (point exactly on its target plane) produced a NaN Jacobian
    through jnp.linalg.norm's gradient, poisoning the normal equations so
    every LM step was rejected; (2) the convergence test looked only at
    pose deltas, so a velocity-only step declared convergence immediately.
    Setup: positions pinned at a constant-velocity truth by plane factors,
    exact preintegration, velocities started wrong — the solve must drive
    them to the true value.
    """
    import jax.numpy as jnp
    import numpy as np
    from mmloam_tpu.config import tiny_config
    from mmloam_tpu.estimator import solver, factors
    from mmloam_tpu.ops import preintegration as pre

    cfg = tiny_config()
    W, dt, vtrue = 5, 0.1, 3.0
    g = jnp.asarray([0.0, 0.0, -cfg.imu.gnorm], jnp.float32)
    P_true = np.array([[vtrue * dt * i, 0, 0] for i in range(W)], np.float32)

    M = 20
    acc = np.zeros((M, 3), np.float32)
    acc[:, 2] = 1.0
    dts = np.full(M, dt / M, np.float32)
    r = pre.preintegrate(jnp.asarray(acc), jnp.zeros((M, 3), jnp.float32),
                         jnp.asarray(dts), jnp.ones(M, bool),
                         jnp.zeros(3), jnp.zeros(3), cfg.imu)
    si = (cfg.imu.lidar_m * pre.sqrt_info_from_cov(r.cov)).astype(jnp.float32)
    tile = lambda a: jnp.tile(jnp.asarray(np.asarray(a), jnp.float32),
                              (W,) + (1,) * np.ndim(np.asarray(a)))
    preint = dict(dq=tile(r.dq), dp=tile(r.dp), dv=tile(r.dv),
                  jac=tile(np.asarray(r.jac)), sqrt_info=tile(np.asarray(si)),
                  dt=jnp.full((W,), dt, jnp.float32),
                  bg=jnp.zeros((W, 3), jnp.float32),
                  ba=jnp.zeros((W, 3), jnp.float32))
    pair_valid = jnp.asarray([False, True, True, True, True])

    K = 64
    rng = np.random.default_rng(0)
    p_l = rng.uniform(-3, 3, (W, K, 3)).astype(np.float32)
    proj = np.zeros((W, K, 3), np.float32)
    sqrt_info = np.zeros((W, K, 3, 3), np.float32)
    for f in range(W):
        for k in range(K):
            n_ = rng.normal(size=3)
            n_ /= np.linalg.norm(n_)
            proj[f, k] = p_l[f, k] + P_true[f]   # plane through the true point
            sqrt_info[f, k, 0] = n_
    # compress the plane factors into per-frame ReducedFactors (the solver's
    # factor representation); association pose = the position-true states
    from mmloam_tpu.estimator import reduced as red

    def rf_frame(f):
        o = jnp.asarray(P_true[f])
        Q, g0, c0 = red._accumulate(
            jnp.asarray(p_l[f]), jnp.asarray(proj[f]) - o[None, :],
            jnp.asarray(sqrt_info[f]), jnp.ones(K, bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        return red.ReducedFactor(
            Q=Q, g0=g0, c0=c0,
            z0=red._zvec(jnp.eye(3, dtype=jnp.float32), o, o), o=o,
            NtN=jnp.zeros((3, 3), jnp.float32), n_line=jnp.int32(0),
            n_plane=jnp.int32(K), n_normal=jnp.int32(K))

    rfs = jax.tree.map(lambda *xs: jnp.stack(xs),
                       *[rf_frame(f) for f in range(W)])

    x0 = np.zeros((W, 15), np.float32)
    x0[:, 0:3] = P_true
    x0[:, 6] = -1.0                                   # wrong velocity
    res = solver.lm_solve(jnp.asarray(x0), rfs, preint, pair_valid,
                          solver.empty_prior(), jnp.ones(W, bool), g,
                          cfg, 30)
    x = np.asarray(res.x)
    np.testing.assert_allclose(x[:, 6], vtrue, atol=1e-2)
    np.testing.assert_allclose(x[:, 0], P_true[:, 0], atol=1e-3)


def test_imu_analytic_jacobian():
    """factors.imu_residual_and_jac == jacfwd(imu_residual) to f64
    machine precision on random states/measurements."""
    import jax

    from mmloam_tpu import lie

    rng = np.random.default_rng(3)
    g = jnp.asarray([0.0, 0.0, -9.805])
    for _ in range(10):
        xi = jnp.asarray(rng.normal(scale=0.8, size=15))
        xj = jnp.asarray(rng.normal(scale=0.8, size=15))
        meas = {
            "dq": lie.exp_quat(jnp.asarray(rng.normal(scale=0.3, size=3))),
            "dp": jnp.asarray(rng.normal(size=3)),
            "dv": jnp.asarray(rng.normal(size=3)),
            "jac": jnp.asarray(np.eye(15) + rng.normal(size=(15, 15)) * 0.1),
            "sqrt_info": jnp.asarray(
                np.eye(15) + rng.normal(size=(15, 15)) * 0.05),
            "dt": jnp.asarray(0.1),
            "bg": jnp.asarray(rng.normal(scale=0.02, size=3)),
            "ba": jnp.asarray(rng.normal(scale=0.02, size=3)),
        }
        z = jnp.concatenate([xi, xj])
        J_ad = jax.jacfwd(lambda zz: factors.imu_residual(
            zz[:15], zz[15:], meas, g))(z)
        r_an, J_an = factors.imu_residual_and_jac(xi, xj, meas, g)
        r_ref = factors.imu_residual(xi, xj, meas, g)
        np.testing.assert_allclose(np.asarray(r_an), np.asarray(r_ref),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                                   rtol=1e-7, atol=1e-9)
