"""Measure the scene x mode ATE matrix (hall / corridor / office x
default / faithful) at tiny config on CPU — the evidence base for
tests/test_world_matrix.py's bounds and BASELINE.md's table.

    JAX_PLATFORMS=cpu python scripts/scene_matrix.py [n_scans]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def ate_rmse(outs, gt_R, gt_p, period=0.1):
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / period)) - 1]
                    for i in range(len(p))])
    return float(np.sqrt((err ** 2).sum(1).mean()))


def scenes():
    from mmloam_tpu.data import synthetic as syn

    return {
        "hall": (syn.default_world(), syn.Trajectory(speed=0.8)),
        "corridor": (syn.corridor_world(),
                     syn.Trajectory(speed=2.0, radius_x=16.0, radius_y=0.8,
                                    yaw_rate=0.08, z_amp=0.05)),
        "office": (syn.office_world(),
                   syn.Trajectory(speed=0.8, radius_x=5.5, radius_y=2.5,
                                  z_amp=0.1)),
    }


def main(n_scans=25):
    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import faithful_config, tiny_config

    for name, (world, traj) in scenes().items():
        for mode in ("default", "faithful"):
            cfg = tiny_config()
            if mode == "faithful":
                cfg = faithful_config(cfg)
            scans, gt_R, gt_p = replay.make_sequence(
                world, traj, t0=0.0, n_scans=n_scans, cfg=cfg, n_az=360,
                range_noise=0.004, dtype=np.float32)
            state = pipeline.init_state(cfg)
            state, outs = replay.replay(state, scans, cfg)
            inited = bool(outs.inited[-1])
            rmse = ate_rmse(outs, gt_R, gt_p)
            print(f"{name:10s} {mode:9s} inited={inited} "
                  f"ATE RMSE {rmse:.3f} m", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
