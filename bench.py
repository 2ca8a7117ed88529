"""Benchmark: batched multi-sequence LIO replay throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the FLAGSHIP configuration (LIOConfig() defaults: 256x256x64
persistent map + 192x192x32 fine local map, 512/2048 stacks, 16x1024
Velodyne + 6x2048 Horizon dual-lidar scans) — the config the BASELINE.json
target of >= 200 scans/sec/chip is defined against.  The C++ reference
processes one bag in real time at ~10 scans/sec/core with no published
numbers (BASELINE.md), so vs_baseline is the ratio to the 200 target.

Measurement rules (CLAUDE.md): np.asarray on an output is the completion
barrier; inputs are perturbed between the warmup and the timed run so no
execution cache can serve memoized results; sequences vary per batch lane.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


BASELINE_SCANS_PER_SEC = 200.0


def _require_device(timeout_s=180):
    """Fail FAST with one structured JSON line if the TPU tunnel is down.

    Device enumeration on the tunneled backend blocks INDEFINITELY in
    native code when the tunnel is dead (a SIGALRM handler never runs —
    the GIL is held), so the probe runs in a SUBPROCESS with a hard
    timeout; on failure one structured JSON line is printed so the
    harness records a diagnosable result instead of hanging.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print(json.dumps({
            "metric": "flagship_replay_throughput", "value": 0.0,
            "unit": "scans/sec/chip", "vs_baseline": 0.0,
            "error": f"device enumeration failed/timed out ({timeout_s}s):"
                     " TPU tunnel unreachable"}))
        sys.stdout.flush()
        sys.exit(3)


def build_inputs(batch, n_scans, cfg, seed0):
    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.data import synthetic

    world = synthetic.default_world()
    seqs = []
    for b in range(batch):
        traj = synthetic.Trajectory(speed=0.6 + 0.05 * (b % 8), z_amp=0.1,
                                    yaw_rate=0.2 + 0.02 * (b % 8))
        scans, _, _ = replay.make_sequence(
            world, traj, 0.0, n_scans, cfg, n_az=cfg.scan.max_pts_per_line,
            seed=seed0 + b, range_noise=0.003, dtype=np.float32,
            with_hori=True, hori_n_az=cfg.scan.hori_max_pts_per_line,
            to_device=False)
        seqs.append(scans)
    # one bulk transfer: (T, B, ...) host pytree -> device
    batch_scans = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs, axis=1)), *seqs)
    batch_state = replay.stack_states(
        [pipeline.init_state(cfg) for _ in range(batch)])
    return batch_state, batch_scans


def main(batch=16, n_scans=30, seed0=None):
    from mmloam_tpu import replay
    from mmloam_tpu.config import LIOConfig

    _require_device()
    cfg = LIOConfig()
    # A/B hook for the two-level gather (BASELINE.md r5) WITHOUT source
    # edits: any package-source change invalidates the persistent compile
    # cache, and a flagship compile costs ~1h on the remote server.
    dedup = os.environ.get("MMLOAM_DEDUP")
    if dedup in ("1", "2"):
        import dataclasses
        cfg = cfg.replace(
            map=dataclasses.replace(cfg.map, dedup_gather=True))
        if dedup == "1":        # "2" = persistent-map streams only
            cfg = cfg.replace(local_map=dataclasses.replace(
                cfg.local_map, dedup_gather=True))

    # fresh range-noise seeds per invocation so no execution-cache layer
    # (local or remote) can return memoized results
    if seed0 is None:
        seed0 = int(time.time() * 1000) % 100000

    batch_state, batch_scans = build_inputs(batch, n_scans, cfg, seed0)

    # replay_batch DONATES the state (see replay.py) — rebuild it per call.
    # init_state is all device-side zeros, so the rebuild costs no host
    # transfer; its wall time is excluded by starting the clock after.
    from mmloam_tpu import pipeline

    def fresh_state():
        s = replay.stack_states([pipeline.init_state(cfg)
                                 for _ in range(batch)])
        jax.block_until_ready(s.vm_surf.cells)
        return s

    st, outs = replay.replay_batch(batch_state, batch_scans, cfg)
    np.asarray(outs.pose_p)
    # three timed repetitions, each on freshly perturbed inputs (so no
    # execution-result cache can serve them); report the MEDIAN and the
    # spread — a single timing on the tunneled backend is too noisy to
    # steer optimization
    times = []
    for rep in range(3):
        timed = batch_scans._replace(
            pts=batch_scans.pts + np.float32(1e-5 * (rep + 1)))
        # drop the previous run's output state BEFORE building the next
        # zero state: at batch 32 the flagship map state is ~5.2 GB, and
        # two live copies exceed the 16 GB chip (measured r5)
        st = outs = None
        bs = fresh_state()
        t0 = time.perf_counter()
        st, outs = replay.replay_batch(bs, timed, cfg)
        np.asarray(outs.pose_p)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]

    scans_per_sec = batch * n_scans / dt
    # self-describing config stamp so cross-round trend lines compare like
    # for like (r01 recorded an easier config under a different name)
    config_stamp = {
        "batch": batch, "n_scans": n_scans,
        "map_dims": list(cfg.map.dims),
        "local_map_dims": list(cfg.local_map.dims),
        "scan": [cfg.scan.n_lines, cfg.scan.max_pts_per_line,
                 cfg.scan.hori_n_lines, cfg.scan.hori_max_pts_per_line],
        "stacks": [cfg.scan.max_corner, cfg.scan.max_surf,
                   cfg.scan.max_nonfeature],
    }
    print(json.dumps({
        "metric": "flagship_replay_throughput",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
        "reps_scans_per_sec": [round(batch * n_scans / t, 2) for t in times],
        "config": config_stamp,
    }))


if __name__ == "__main__":
    import sys

    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         n_scans=int(sys.argv[2]) if len(sys.argv) > 2 else 30)
