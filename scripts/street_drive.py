"""Street-scale drive: 500+ scans over a ~125 m canyon at FLAGSHIP config —
the reference's Street dataset class (README.md:74: 27.7 GB bag).  The
flagship 256-cell 0.4 m torus (102.4 m period) wraps during the drive,
exercising epoch-key eviction at scale; ATE is evaluated against the
analytic trajectory.

Run on TPU (tiny on CPU takes hours):

    python scripts/street_drive.py [n_scans=500] [batch=1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(n_scans=500, batch=1):
    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import LIOConfig
    from mmloam_tpu.data import synthetic

    cfg = LIOConfig()
    world = synthetic.street_world()
    # near-straight drive down the canyon: x swings +-100 m inside the
    # 250 m box, ~2.8 m/s -> ~140 m of travel over 50 s (500 scans)
    traj = synthetic.Trajectory(speed=2.8, radius_x=100.0, radius_y=3.0,
                                yaw_rate=0.05, z_amp=0.1)
    print(f"building {n_scans} scans ...", flush=True)
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, t0=0.0, n_scans=n_scans, cfg=cfg,
        n_az=cfg.scan.max_pts_per_line, range_noise=0.004,
        dtype=np.float32, to_device=False)
    if batch > 1:
        scans = jax.tree.map(
            lambda a: jnp.asarray(np.stack([a] * batch, axis=1)), scans)
        state = replay.stack_states([pipeline.init_state(cfg)
                                     for _ in range(batch)])
        t0 = time.perf_counter()
        state, outs = replay.replay_batch(state, scans, cfg)
        p = np.asarray(outs.pose_p)[:, 0]
        ts = np.asarray(outs.t)[:, 0] if np.asarray(outs.t).ndim > 1 \
            else np.asarray(outs.t)
    else:
        scans = jax.tree.map(jnp.asarray, scans)
        state = pipeline.init_state(cfg)
        t0 = time.perf_counter()
        state, outs = replay.replay(state, scans, cfg)
        p = np.asarray(outs.pose_p)
        ts = np.asarray(outs.t)
    dt = time.perf_counter() - t0
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    rmse = float(np.sqrt((err ** 2).sum(1).mean()))
    dist = float(np.linalg.norm(np.diff(gt_rel, axis=0), axis=1).sum())
    print(f"street drive: {n_scans} scans, {dist:.0f} m travelled "
          f"({dist / 102.4:.1f} torus periods), ATE RMSE {rmse:.3f} m "
          f"({100 * rmse / max(dist, 1e-9):.2f}% of distance), "
          f"{batch * n_scans / dt:.1f} scans/s "
          f"(incl. compile: one-shot run)", flush=True)
    assert np.isfinite(p).all()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500,
         int(sys.argv[2]) if len(sys.argv) > 2 else 1)
