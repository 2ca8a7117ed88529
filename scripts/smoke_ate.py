"""Quick CPU smoke: tiny-config replay, per-scan error breakdown.

    JAX_PLATFORMS=cpu python scripts/smoke_ate.py [n_scans] [speed]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_scans=14, speed=0.8):
    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import tiny_config
    from mmloam_tpu.data import synthetic

    cfg = tiny_config()
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=speed, z_amp=0.15)
    scans, gt_R, gt_p = replay.make_sequence(world, traj, 0.0, n_scans, cfg,
                                             n_az=720, seed=3,
                                             range_noise=0.003,
                                             dtype=np.float32)
    state = pipeline.init_state(cfg)
    t0 = time.time()
    st, outs = replay.replay(state, scans, cfg)
    q = np.asarray(outs.pose_q)
    p = np.asarray(outs.pose_p)
    print(f"replay {time.time()-t0:.1f}s", flush=True)
    print("inited:", np.asarray(outs.inited).astype(int).tolist())
    print("fail:  ", np.asarray(outs.fail).astype(int).tolist())
    print("sv_min:", np.round(np.asarray(outs.sv_min), 1).tolist())
    # stamp-matched error (published poses are the smoothed FRONT frame:
    # post-init the stamp lags the scan by ~(W-1) intervals)
    ts = np.asarray(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    en = np.linalg.norm(err, axis=1)
    print("per-scan |err| (mm):", np.round(en * 1000).astype(int).tolist())
    print("stamp-matched ATE:", round(float(np.sqrt((en ** 2).mean())), 4))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 14, float(a[1]) if len(a) > 1 else 0.8)
