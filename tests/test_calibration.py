"""Extrinsic ICP + time-offset estimation on synthetic rigs."""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu import lie
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import calibration, synthetic

CFG = tiny_config()


def two_lidar_clouds(rng, T_true):
    """Velo + hori clouds of the same world; hori points expressed in the
    hori frame so that T_true maps hori -> velo."""
    world = synthetic.default_world()
    dirs = rng.normal(size=(6000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = world.raycast(np.zeros(3), dirs)
    ok = np.isfinite(r)
    velo = (dirs[ok] * r[ok][:, None])
    # hori sees the same world from the same origin with a (wide) forward FOV
    # spanning several walls so all 6 DoF are constrained
    sel = np.abs(np.arctan2(dirs[ok][:, 1], dirs[ok][:, 0])) < 1.6
    velo_sub = velo[sel]
    R, t = T_true[:3, :3], T_true[:3, 3]
    hori = (velo_sub - t) @ R        # inverse transform: hori frame points
    return velo.astype(np.float32), hori.astype(np.float32)


def test_icp_recovers_extrinsic():
    rng = np.random.default_rng(0)
    R = np.asarray(lie.exp_matrix(jnp.array([0.01, -0.02, 0.05])))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [0.15, -0.1, 0.05]
    velo, hori = two_lidar_clouds(rng, T)
    T_est, resid, n = calibration.icp_extrinsic(hori, velo, CFG, iters=25)
    assert n > 200
    err_t = np.linalg.norm(T_est[:3, 3] - T[:3, 3])
    err_r = np.linalg.norm(np.asarray(
        lie.log_matrix(jnp.asarray(T_est[:3, :3] @ T[:3, :3].T))))
    assert err_t < 0.03, f"translation err {err_t}, resid {resid}"
    assert err_r < 0.01, f"rotation err {err_r}"


def test_time_offset_search():
    rng = np.random.default_rng(1)
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=1.0, yaw_rate=0.8)
    # velo reference scan over [1.0, 1.1) at its own poses
    t0, t1 = 1.0, 1.1
    Rv = traj.rot(t0 + 0.05)
    pv = traj.pos(t0 + 0.05)
    pts_v, valid_v, _ = synthetic.simulate_scan(world, Rv, pv, n_az=720)
    velo_cloud = pts_v[valid_v]               # velo LIDAR frame
    # hori point stream over a longer span with a TRUE offset of +0.07 s:
    # each point is expressed in the (moving) lidar frame at observation
    # time but STAMPED 0.07 s late — exactly the aligner's situation
    true_off = 0.07
    stream_t = np.arange(0.7, 1.4, 0.0005)
    Rs = traj.rot(stream_t)
    ps = traj.pos(stream_t)
    dirs = rng.normal(size=(len(stream_t), 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dw = np.einsum("kij,kj->ki", Rs, dirs)
    rr = world.raycast(ps, dw)
    ok = np.isfinite(rr)
    hori_lidar = dirs * np.where(ok, rr, 0.0)[:, None]   # sensor frame
    offsets = np.arange(-0.02, 0.16, 0.01)
    best, scores = calibration.estimate_time_offset(
        stream_t[ok] + true_off, hori_lidar[ok], velo_cloud, t0, t1, CFG,
        offsets)
    assert abs(best - true_off) <= 0.015, f"best {best}, scores {scores}"


def test_gicp_weighting_rejects_misoriented_clutter():
    """Plane-to-plane weighting: a clutter patch in the SOURCE cloud whose
    surface orientation disagrees with what it lands on in dst must not
    drag the estimate; GICP stays within the clean-cloud error budget."""
    rng = np.random.default_rng(4)
    R = np.asarray(lie.exp_matrix(jnp.array([-0.015, 0.02, -0.04])))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [0.1, 0.12, -0.04]
    velo, hori = two_lidar_clouds(rng, T)
    # clutter: a vertical disc of points 3 m ahead in the hori frame only
    # (e.g. a person/object present during the hori sweep) — its normal
    # disagrees with the floor/wall surfaces its matches land on
    nclut = 600
    disc = np.stack([np.full(nclut, 3.0),
                     rng.uniform(-0.5, 0.5, nclut),
                     rng.uniform(-1.0, 0.4, nclut)], -1).astype(np.float32)
    hori_cl = np.concatenate([hori, disc], axis=0)
    T_g, _, n_g = calibration.icp_extrinsic(hori_cl, velo, CFG, iters=25,
                                            gicp=True)
    err_t = np.linalg.norm(T_g[:3, 3] - T[:3, 3])
    err_r = np.linalg.norm(np.asarray(
        lie.log_matrix(jnp.asarray(T_g[:3, :3] @ T[:3, :3].T))))
    assert n_g > 200
    assert err_t < 0.04, f"gicp translation err {err_t}"
    assert err_r < 0.012, f"gicp rotation err {err_r}"


def test_align_startup_integrates_frames():
    """Multi-frame startup integration (unionLidarsAligner.cpp:224-254):
    several sparse hori frames integrate into one cloud dense enough to
    calibrate, where a single frame is too sparse."""
    rng = np.random.default_rng(5)
    R = np.asarray(lie.exp_matrix(jnp.array([0.02, 0.01, 0.06])))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [0.2, -0.05, 0.08]
    world = synthetic.default_world()
    frames = []
    for i in range(6):
        dirs = rng.normal(size=(700, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        sel = np.abs(np.arctan2(dirs[:, 1], dirs[:, 0])) < 1.6
        dirs = dirs[sel]
        r = world.raycast(np.zeros(3), dirs)
        ok = np.isfinite(r)
        velo_pts = dirs[ok] * r[ok][:, None]
        frames.append(((velo_pts - T[:3, 3]) @ R).astype(np.float32))
    dirs = rng.normal(size=(6000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = world.raycast(np.zeros(3), dirs)
    ok = np.isfinite(r)
    velo = (dirs[ok] * r[ok][:, None]).astype(np.float32)

    T_est, resid, n = calibration.align_startup(frames, velo, CFG)
    err_t = np.linalg.norm(T_est[:3, 3] - T[:3, 3])
    err_r = np.linalg.norm(np.asarray(
        lie.log_matrix(jnp.asarray(T_est[:3, :3] @ T[:3, :3].T))))
    assert n > 250  # Huber-weighted effective match count
    assert err_t < 0.04, f"startup translation err {err_t}"
    assert err_r < 0.012, f"startup rotation err {err_r}"
