"""A/B: max_outer_iters=2 (static 2-assoc schedule) vs ATE + init."""
import os, sys, dataclasses
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_cpu_parallel_codegen_split_count=1").strip()
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic

def run(cfg, n_scans=25, speed=1.0, yaw=0.25, seed=3):
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=speed, yaw_rate=yaw, z_amp=0.1)
    scans, gt_R, gt_p = replay.make_sequence(world, traj, 0.0, n_scans, cfg,
                                             n_az=480, dtype=np.float32,
                                             range_noise=0.003, seed=seed)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)
    p = np.array(outs.pose_p); ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    inited = np.array(outs.inited)
    rmse = float(np.sqrt((err[inited] ** 2).sum(1).mean()))
    return rmse, bool(inited[-1]), int(np.argmax(inited)) if inited.any() else -1

base = tiny_config()
for mo, rr in ((2, 1), (3, 2)):
    cfg = dataclasses.replace(base, solver=dataclasses.replace(
        base.solver, max_outer_iters=mo, full_reassoc_rounds=rr))
    for sp, yw, sd, tag in ((1.0, 0.25, 3, "norm"), (1.8, 0.5, 3, "fast"),
                            (0.6, 0.15, 7, "slow7"), (1.2, 0.35, 11, "mid11")):
        rmse, ok, t0 = run(cfg, speed=sp, yaw=yw, seed=sd)
        print(f"mo={mo} {tag}: ATE {rmse:.4f} m inited={ok} at scan {t0}",
              flush=True)
