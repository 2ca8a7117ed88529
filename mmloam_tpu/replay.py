"""Sequence replay driver + trajectory metrics.

Replaces the reference's operational harness (`rosbag play` + roslaunch +
RViz, README.md:48-62) with: a host-side sequence builder producing stacked
`ScanInput` tensors, a jitted `lax.scan` replay over one sequence, `vmap`
over a batch of sequences, and ATE metrics against ground truth.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import lie, pipeline
from .data import synthetic


def _hori_dirs(n_az):
    """Livox-Horizon-like raster: 81.7 x 25.1 deg FOV, 6 lines."""
    el = np.deg2rad(np.linspace(-12.55, 12.55, 6))
    az = np.deg2rad(np.linspace(-40.85, 40.85, n_az))
    ca, sa = np.cos(az), np.sin(az)
    ce, se = np.cos(el), np.sin(el)
    return np.stack([ce[:, None] * ca[None, :],
                     ce[:, None] * sa[None, :],
                     np.broadcast_to(se[:, None], (6, n_az))], axis=-1)


def make_sequence(world, traj, t0, n_scans, cfg, scan_hz=10.0, imu_rate=200.0,
                  range_noise=0.0, imu_noise=(0.0, 0.0), bg=(0, 0, 0),
                  ba=(0, 0, 0), g_vec=None, n_az=900, seed=0,
                  dtype=np.float32, with_hori=False, hori_n_az=None,
                  to_device=True):
    """Build a stacked ScanInput pytree of `n_scans` scans + ground truth.

    Scan i spans (t_{i-1}, t_i] with stamp t_i = t0 + (i+1)/scan_hz, points
    sampled at per-azimuth times (motion-skewed, like a real spinning
    lidar); the IMU window covers the same interval — matching the
    reference's fetchImuMsgs windows (unionPoseEstimation.cpp:307-395).
    Ground truth is the lidar pose at each stamp.  `with_hori` adds a
    time-aligned Livox-Horizon-like sweep (identity extrinsic).
    """
    rng = np.random.default_rng(seed)
    period = 1.0 / scan_hz
    L = len(synthetic.VLP16_ELEVATIONS_DEG)
    M = cfg.imu.max_samples

    el = np.deg2rad(synthetic.VLP16_ELEVATIONS_DEG)
    az = -np.pi + 2 * np.pi * (np.arange(n_az) + 0.5) / n_az
    ca, sa = np.cos(az), np.sin(az)
    ce, se = np.cos(el), np.sin(el)
    dirs_l = np.stack([ce[:, None] * ca[None, :],
                       ce[:, None] * sa[None, :],
                       np.broadcast_to(se[:, None], (L, n_az))], axis=-1)
    if with_hori:
        h_az = hori_n_az or (cfg.scan.hori_max_pts_per_line)
        dirs_h = _hori_dirs(h_az)

    scans = []
    gt = []
    for i in range(n_scans):
        ts_start = t0 + i * period
        ts_end = ts_start + period
        # per-azimuth measurement times and poses
        t_az = ts_start + (np.arange(n_az) + 0.5) / n_az * period
        R_az = traj.rot(t_az)                       # (n_az,3,3) world-from-body(=lidar)
        p_az = traj.pos(t_az)
        dirs_w = np.einsum("aij,laj->lai", R_az, dirs_l)
        origins = np.broadcast_to(p_az[None, :, :], (L, n_az, 3))
        r = world.raycast(origins.reshape(-1, 3), dirs_w.reshape(-1, 3))
        r = r.reshape(L, n_az)
        valid = np.isfinite(r)
        if range_noise > 0:
            r = r + np.where(valid, rng.normal(0, range_noise, r.shape), 0.0)
        pts = dirs_l * np.where(valid, r, 0.0)[..., None]
        rel = np.broadcast_to((np.arange(n_az) + 0.5) / n_az, (L, n_az))

        # compact valid points to a prefix per ring (decoder behavior)
        pts_c = np.zeros((L, n_az, 3))
        rel_c = np.zeros((L, n_az))
        n_val = valid.sum(axis=1).astype(np.int32)
        for l in range(L):
            sel = np.where(valid[l])[0]
            pts_c[l, :len(sel)] = pts[l, sel]
            rel_c[l, :len(sel)] = rel[sel] if rel.ndim == 1 else rel[l, sel]

        acc, gyr, its = synthetic.simulate_imu(
            traj, ts_start, ts_end, rate=imu_rate, gnorm=cfg.imu.gnorm,
            bg=bg, ba=np.asarray(ba), noise_gyr=imu_noise[0],
            noise_acc=imu_noise[1], rng=rng if sum(imu_noise) > 0 else None,
            g_vec=g_vec)
        dts = np.diff(np.concatenate([[ts_start], its]))
        m = len(its)
        imu_acc = np.zeros((M, 3)); imu_acc[:m] = acc[:M]
        imu_gyr = np.zeros((M, 3)); imu_gyr[:m] = gyr[:M]
        imu_dt = np.zeros(M); imu_dt[:m] = dts[:M]
        imu_mask = np.arange(M) < min(m, M)

        hori = {}
        if with_hori:
            # Horizon points at per-column times over the same interval
            th_az = ts_start + (np.arange(dirs_h.shape[1]) + 0.5) \
                / dirs_h.shape[1] * period
            Rh = traj.rot(th_az)
            ph = traj.pos(th_az)
            dw_h = np.einsum("aij,laj->lai", Rh, dirs_h)
            org_h = np.broadcast_to(ph[None], (6,) + ph.shape)
            rh = world.raycast(org_h.reshape(-1, 3), dw_h.reshape(-1, 3))
            rh = rh.reshape(dirs_h.shape[:2])
            hval = np.isfinite(rh)
            if range_noise > 0:
                rh = rh + np.where(hval, rng.normal(0, range_noise, rh.shape),
                                   0.0)
            hpts = dirs_h * np.where(hval, rh, 0.0)[..., None]
            hrel = np.broadcast_to(
                (np.arange(dirs_h.shape[1]) + 0.5) / dirs_h.shape[1],
                dirs_h.shape[:2])
            Lh, Nh = dirs_h.shape[:2]
            hp_c = np.zeros((Lh, Nh, 3))
            hr_c = np.zeros((Lh, Nh))
            hn = hval.sum(axis=1).astype(np.int32)
            for l in range(Lh):
                sel = np.where(hval[l])[0]
                hp_c[l, :len(sel)] = hpts[l, sel]
                hr_c[l, :len(sel)] = hrel[l, sel]
            hori = dict(hori_pts=hp_c.astype(dtype),
                        hori_intensity=np.zeros((Lh, Nh), dtype),
                        hori_n_valid=hn,
                        hori_rel_time=hr_c.astype(dtype))

        scans.append(pipeline.ScanInput(
            pts=pts_c.astype(dtype), intensity=np.zeros((L, n_az), dtype),
            n_valid=n_val, rel_time=rel_c.astype(dtype),
            t=np.asarray(ts_end, dtype),
            imu_acc=imu_acc.astype(dtype), imu_gyr=imu_gyr.astype(dtype),
            imu_dt=imu_dt.astype(dtype), imu_mask=imu_mask, **hori))
        gt.append((traj.rot(ts_end), traj.pos(ts_end)))

    # `to_device=False` keeps host numpy (callers stacking many sequences
    # should transfer ONCE — per-leaf-per-sequence transfers over the
    # tunneled backend cost far more than one bulk device_put)
    conv = jnp.asarray if to_device else np.asarray
    stacked = jax.tree.map(lambda *xs: conv(np.stack(xs)), *scans)
    gt_R = np.stack([g[0] for g in gt])
    gt_p = np.stack([g[1] for g in gt])
    return stacked, gt_R, gt_p


_RUNNERS = {}


def _runner(cfg):
    """One cached jitted scan-driver per config (re-jitting per call costs
    a full retrace of the step program)."""
    if cfg not in _RUNNERS:
        @jax.jit
        def run(state, scans):
            return jax.lax.scan(lambda s, sc: pipeline.step(s, sc, cfg),
                                state, scans)

        _RUNNERS[cfg] = run
    return _RUNNERS[cfg]


def replay(state, scans, cfg):
    """lax.scan the pipeline over a stacked ScanInput sequence (jitted)."""
    return _runner(cfg)(state, scans)


_BATCH_RUNNERS = {}


def replay_batch(states, scans, cfg, mesh=None):
    """Replay a BATCH of sequences in lockstep: vmap over the leading batch
    axis of `states`/`scans`, optionally sharded over `mesh` (a 1-D
    `jax.sharding.Mesh` whose axis partitions the batch).

    This is the engine's designed scale-out (SURVEY.md §2.4): pure data
    parallelism over independent replays — each device owns B/n sequences'
    full state (window, prior, voxel maps); no intra-model cross-device
    traffic.  scans axes: (T, B, ...) — time-major for lax.scan.
    """
    # On TPU backends the map writes run OUTSIDE the per-sequence vmap via
    # the batch-native Pallas row-RMW kernel (ops/pallas_insert.py): a
    # vmapped XLA scatter serializes per batch element and copies whole
    # maps.  CPU (tests) keeps the plain XLA path.
    use_pallas = jax.default_backend() != "cpu"
    key = (cfg, None if mesh is None else tuple(mesh.axis_names), use_pallas)
    if key not in _BATCH_RUNNERS:
        # the input state is DONATED: it aliases the output state's buffers,
        # halving peak HBM (the per-sequence maps dominate — ~165 MB/seq at
        # flagship dims; without donation batch 32 exceeded v5e's 16 GB).
        # Callers must not reuse the passed `states` after the call (bench
        # and the dryrun rebuild it; XLA:CPU ignores donation, so the
        # CPU-pinned tests are unaffected).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(bs, bsc):
            if use_pallas:
                def body(s, sc):
                    s, outs, pend = jax.vmap(
                        lambda st, x: pipeline.step_core(st, x, cfg))(s, sc)
                    s = pipeline.apply_inserts_batched(s, pend, cfg)
                    return s, outs

                return jax.lax.scan(body, bs, bsc)

            def one(s, sc):
                return jax.lax.scan(lambda st, x: pipeline.step(st, x, cfg),
                                    s, sc)
            return jax.vmap(one, in_axes=(0, 1), out_axes=(0, 1))(bs, bsc)

        _BATCH_RUNNERS[key] = run
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        st_shard = NamedSharding(mesh, P(axis))
        sc_shard = NamedSharding(mesh, P(None, axis))
        states = jax.tree.map(lambda a: jax.device_put(a, st_shard), states)
        scans = jax.tree.map(lambda a: jax.device_put(a, sc_shard), scans)
    return _BATCH_RUNNERS[key](states, scans)


def stack_sequences(seqs):
    """Stack per-sequence ScanInput pytrees (T, ...) into (T, B, ...)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *seqs)


def stack_states(states):
    """Stack per-sequence LIOStates into a batch (B, ...)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def ate_rmse(est_q, est_p, gt_R, gt_p):
    """ATE RMSE after first-pose alignment (odometry starts at identity)."""
    R0 = gt_R[0]
    p0 = gt_p[0]
    # ground truth in the first-scan lidar frame
    gt_rel = np.einsum("ij,nj->ni", R0.T, gt_p - p0)
    # estimated poses relative to the first estimate
    q0 = np.asarray(est_q[0])
    e_rel = np.stack([
        np.array(lie.quat_rotate(lie.quat_conj(jnp.asarray(q0)),
                                 jnp.asarray(np.asarray(est_p[i]) - np.asarray(est_p[0]))))
        for i in range(len(est_p))])
    err = e_rel - gt_rel
    return float(np.sqrt((err ** 2).sum(axis=1).mean())), err
    # (see also metrics.ate for stamp-matched ATE/RPE)
