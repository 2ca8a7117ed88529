"""Benchmark: batched multi-sequence LIO replay throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The BASELINE.json target is >= 200 scans/sec/chip (batched replay); the
C++ reference processes one bag in real time at ~10 scans/sec/core with
no published numbers (BASELINE.md), so vs_baseline is measured against
the 200 scans/sec/chip target.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


BASELINE_SCANS_PER_SEC = 200.0


def main(batch=16, n_scans=30, warmup=5, seed0=None):
    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import tiny_config
    from mmloam_tpu.data import synthetic

    cfg = tiny_config()
    world = synthetic.default_world()

    # fresh range-noise seeds per invocation so no execution-cache layer
    # (local or remote) can return memoized results
    if seed0 is None:
        seed0 = int(time.time() * 1000) % 100000

    seqs = []
    for b in range(batch):
        traj = synthetic.Trajectory(speed=0.6 + 0.05 * b, z_amp=0.1,
                                    yaw_rate=0.2 + 0.02 * b)
        scans, _, _ = replay.make_sequence(world, traj, 0.0, n_scans, cfg,
                                           n_az=720, seed=seed0 + b,
                                           range_noise=0.003,
                                           dtype=np.float32)
        seqs.append(scans)
    batch_scans = replay.stack_sequences(seqs)   # (n_scans, batch, ...)
    batch_state = replay.stack_states(
        [pipeline.init_state(cfg) for _ in range(batch)])

    # compile warmup on the full shape, then time on perturbed inputs so an
    # execution-result cache cannot serve the timed run.  np.asarray (full
    # device->host materialization) is the completion barrier — on tunneled
    # TPU backends block_until_ready alone under-reports.
    st, outs = replay.replay_batch(batch_state, batch_scans, cfg)
    np.asarray(outs.pose_p)
    timed = batch_scans._replace(pts=batch_scans.pts + np.float32(1e-5))
    t0 = time.perf_counter()
    st, outs = replay.replay_batch(batch_state, timed, cfg)
    np.asarray(outs.pose_p)
    dt = time.perf_counter() - t0

    scans_per_sec = batch * n_scans / dt
    print(json.dumps({
        "metric": "batched_replay_throughput",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    import sys

    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         n_scans=int(sys.argv[2]) if len(sys.argv) > 2 else 30)
