"""One-shot TPU smoke + bench warm-up.

Run after the TPU tunnel recovers (or any time the step program changed) to
(1) verify the pipeline end-to-end on the real chip, (2) warm the
persistent compile cache so the driver's bench run doesn't pay the full
remote compile, (3) print honest timings.

    python scripts/tpu_check.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import dataclasses

    from mmloam_tpu import checkpoint, metrics, pipeline, replay
    from mmloam_tpu.config import tiny_config
    from mmloam_tpu.data import synthetic

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    rng = np.random.default_rng(int(time.time()))
    BASE = tiny_config()
    CFG = BASE.replace(solver=dataclasses.replace(BASE.solver,
                                                  corner_cnt_gate_hori=5))
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.15, yaw_rate=0.05)
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, 0.0, 30, CFG, n_az=720, with_hori=True, hori_n_az=512,
        range_noise=0.003, seed=int(rng.integers(1 << 30)))

    t0 = time.perf_counter()
    state, outs = replay.replay(pipeline.init_state(CFG), scans, CFG)
    p = np.asarray(outs.pose_p)
    print(f"dual-lidar replay compile+run: {time.perf_counter() - t0:.0f}s",
          flush=True)

    sc2 = scans._replace(pts=scans.pts + jnp.float32(rng.uniform(1e-6, 1e-4)))
    t0 = time.perf_counter()
    _, o2 = replay.replay(pipeline.init_state(CFG), sc2, CFG)
    np.asarray(o2.pose_p)
    dt = time.perf_counter() - t0
    print(f"timed run: {dt:.2f}s -> {30 / dt:.1f} scans/s", flush=True)

    m = metrics.ate(p, np.array(outs.t), gt_p, gt_R,
                    0.1 + 0.1 * np.arange(30))
    print(f"ATE rmse={m.ate_rmse:.3f} max={m.ate_max:.3f} "
          f"rpe={m.rpe_rmse:.3f}")
    print(f"telemetry: {metrics.run_telemetry(outs)}")
    print(f"hori merge rate: {np.array(outs.hori_merged)[1:].mean():.2f}")

    # warm the default (velo-only, tiny-config) bench path too
    import bench
    bench.main(batch=4, n_scans=10)


if __name__ == "__main__":
    main()
