"""Per-stage TPU micro-benchmarks at bench shapes.

Times each pipeline piece in isolation (jitted, honest np.asarray barrier,
fresh perturbed inputs per rep) so optimization effort goes where the time
is.  Run: python scripts/micro_bench.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5, perturb=None):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for r in range(reps):
        if perturb is not None:
            args = perturb(args, r)
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best*1e3:9.2f} ms", flush=True)
    return best


def main(batch=8):
    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import tiny_config
    from mmloam_tpu.data import synthetic
    from mmloam_tpu.estimator import estimate as est
    from mmloam_tpu.estimator import solver, factors
    from mmloam_tpu.ops import features, preintegration, voxelmap, downsample

    cfg = tiny_config()
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.1, yaw_rate=0.2)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 12, cfg, n_az=720,
                                       seed=1, range_noise=0.003,
                                       dtype=np.float32)
    state = pipeline.init_state(cfg)

    # run the real pipeline for a few scans to get a representative state
    run1 = jax.jit(lambda s, sc: jax.lax.scan(
        lambda st, x: pipeline.step(st, x, cfg), s, sc))
    state, _ = run1(state, scans)
    jax.block_until_ready(state.x)

    B = batch
    scan0 = jax.tree.map(lambda a: a[-1], scans)
    bscan = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), scan0)
    bstate = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)

    def pert(args, r):
        return (jax.tree.map(
            lambda a: (a + np.float32(1e-5 * (r + 1))
                       if a.dtype == jnp.float32 else a), args[0]),) + args[1:]

    # ---- full step --------------------------------------------------------
    stepf = jax.jit(jax.vmap(lambda s, sc: pipeline.step(s, sc, cfg)))
    t_step = timeit("full step", stepf, bstate, bscan,
                    perturb=lambda a, r: (a[0], jax.tree.map(
                        lambda x: x + np.float32(1e-5 * (r + 1))
                        if x.dtype == jnp.float32 else x, a[1])))

    # ---- features ---------------------------------------------------------
    featf = jax.jit(jax.vmap(lambda p, i, n: features.extract_scan_features(
        p, i, n, cfg)))
    timeit("features", featf, bscan.pts, bscan.intensity, bscan.n_valid,
           perturb=lambda a, r: (a[0] + np.float32(1e-5), a[1], a[2]))

    # ---- preintegration ---------------------------------------------------
    pref = jax.jit(jax.vmap(lambda a, g, d, m: preintegration.preintegrate(
        a, g, d, m, jnp.zeros(3), jnp.zeros(3), cfg.imu)))
    timeit("preintegration", pref, bscan.imu_acc, bscan.imu_gyr,
           bscan.imu_dt, bscan.imu_mask,
           perturb=lambda a, r: (a[0] + np.float32(1e-6), a[1], a[2], a[3]))

    # ---- voxel downsample x2 ---------------------------------------------
    flat = bscan.pts.reshape(B, -1, 3)
    fmask = jnp.ones(flat.shape[:2], bool)
    dsf = jax.jit(jax.vmap(lambda p, m: downsample.voxel_downsample(
        p, m, 0.2, cfg.scan.max_surf)))
    timeit("voxel_downsample (surf)", dsf, flat, fmask,
           perturb=lambda a, r: (a[0] + np.float32(1e-5), a[1]))

    # ---- map insert -------------------------------------------------------
    spts = bstate.stacks.surf[:, -1]
    smask = bstate.stacks.surf_mask[:, -1]
    insf = jax.jit(jax.vmap(lambda vm_cells, p, m: voxelmap.insert(
        voxelmap.VoxelMap(vm_cells), p, m, cfg.map).cells))
    timeit("map insert (surf stack)", insf, bstate.vm_surf.cells, spts, smask,
           perturb=lambda a, r: (a[0], a[1] + np.float32(1e-4), a[2]))

    # ---- query_knn --------------------------------------------------------
    qf = jax.jit(jax.vmap(lambda cells, q, m: voxelmap.query_knn(
        voxelmap.VoxelMap(cells), q, m, cfg.map)))
    timeit(f"query_knn surf ({spts.shape[1]} q)", qf, bstate.vm_surf.cells,
           spts, smask,
           perturb=lambda a, r: (a[0], a[1] + np.float32(1e-4), a[2]))

    # ---- build_reduced (one frame association + compression) --------------
    from mmloam_tpu.estimator import reduced as red
    from mmloam_tpu.ops import voxelmap as vx

    huber = jnp.float32(1e12)
    asf = jax.jit(jax.vmap(lambda x, st, vc, vs, lc, ls: red.build_reduced(
        x[-1, :6], jax.tree.map(lambda a: a[-1], est.Stacks(*st)),
        vx.VoxelMap(vc), vx.VoxelMap(vs), jnp.eye(3), jnp.zeros(3), cfg,
        jnp.float32(1.0), jnp.float32(3e-4), huber, jnp.asarray(True),
        vm_local_corner=vx.VoxelMap(lc) if cfg.use_local_map else None,
        vm_local_surf=vx.VoxelMap(ls) if cfg.use_local_map else None)[0]))
    t_assoc = timeit("build_reduced (1 frame)", asf, bstate.x,
                     tuple(bstate.stacks), bstate.vm_corner.cells,
                     bstate.vm_surf.cells, bstate.vm_local_corner.cells,
                     bstate.vm_local_surf.cells,
                     perturb=lambda a, r: (a[0] + np.float32(1e-6),) + a[1:])

    # ---- lm_solve (one call, max_inner_iters) ------------------------------
    rf1 = asf(bstate.x, tuple(bstate.stacks), bstate.vm_corner.cells,
              bstate.vm_surf.cells, bstate.vm_local_corner.cells,
              bstate.vm_local_surf.cells)
    W = cfg.solver.window
    rfs = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (B, W) + a.shape[1:]), rf1)
    fv = jnp.ones((B, W), bool)

    lmf = jax.jit(jax.vmap(
        lambda x, rfs, preint, pv, prior, fv, g: solver.lm_solve(
            x, rfs, preint, pv, solver.Prior(*prior), fv, g,
            cfg, cfg.solver.max_inner_iters)))
    t_lm = timeit("lm_solve (<=10 iters)", lmf, bstate.x, rfs,
                  bstate.preint, bstate.pair_valid, tuple(bstate.prior), fv,
                  bstate.gravity,
                  perturb=lambda a, r: (a[0] + np.float32(1e-6),) + a[1:])

    # ---- marginalize -------------------------------------------------------
    mgf = jax.jit(jax.vmap(
        lambda x, rfs, preint, prior, g: solver.marginalize(
            x, jax.tree.map(lambda a: a[0], rfs), preint,
            solver.Prior(*prior), g, cfg)))
    timeit("marginalize", mgf, bstate.x, rfs, bstate.preint,
           tuple(bstate.prior), bstate.gravity,
           perturb=lambda a, r: (a[0] + np.float32(1e-6),) + a[1:])

    n_rounds = cfg.solver.max_outer_iters
    print(f"\nstep {t_step*1e3:.1f} ms | {n_rounds}x(assoc {t_assoc*1e3:.1f} "
          f"+ lm {t_lm*1e3:.1f}) = {n_rounds*(t_assoc+t_lm)*1e3:.1f} ms")
    print(f"throughput estimate: {batch / t_step:.1f} scans/s")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:2]])
