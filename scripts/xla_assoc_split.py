"""Split the PRODUCTION (XLA) association cost at flagship shapes.

Differential in-program benchmark (loop-inside-jit, input rotated per
iteration, two loop counts differenced — see CLAUDE.md measurement rules)
of the `factors._neighbor_moments` + `_plane_fit` pipeline, stage by
stage, vmapped over B like the flagship step:

  A. query_candidates            (gather + candidate arithmetic)
  B. + kth_smallest              (k+1 reduction passes over dense (M,C))
  C. + masked G + moments matmul (MXU contraction)
  D. + plane fit + gates         (the full production path)

    python scripts/xla_assoc_split.py [B] [M]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmloam_tpu.config import LIOConfig
from mmloam_tpu.estimator import factors
from mmloam_tpu.ops import voxelmap as vx

N_LO, N_HI = 2, 10


def bench(name, fn, *args):
    @partial(jax.jit, static_argnums=0)
    def red(n, *a):
        def it(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

    def run(n):
        np.asarray(red(n, *args))          # compile + warm
        ts = []
        for r in range(3):
            a0 = args[0] + np.float32(1e-6 * (r + 1))
            t0 = time.perf_counter()
            np.asarray(red(n, a0, *args[1:]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per = (run(N_HI) - run(N_LO)) / (N_HI - N_LO)
    print(f"{name:44s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def main(B=16, M=2048):
    cfg = LIOConfig()
    mcfg = cfg.map
    k = mcfg.knn
    rng = np.random.default_rng(0)
    vm = vx.empty_map(mcfg)
    pts = rng.uniform(-20, 20, (40000, 3)).astype(np.float32)
    for i in range(0, len(pts), 4000):
        vm = vx.insert(vm, jnp.asarray(pts[i:i + 4000]),
                       jnp.ones(4000, bool), mcfg)
    cells = jax.block_until_ready(vm.cells)
    q0 = jnp.asarray(rng.uniform(-18, 18, (B, M, 3)).astype(np.float32))
    mask = jnp.ones((B, M), bool)
    thres = jnp.float32(cfg.solver.thres_dist)

    def vm_of(c):
        return vx.VoxelMap(c)

    def stage_a(i, q, c):
        qq = q + i * 1e-4

        def one(qi, m):
            dx, dy, dz, d2, ok = vx.query_candidates(vm_of(c), qi, m, mcfg)
            return (jnp.sum(jnp.where(ok, dx + dy + dz, 0.0))
                    + jnp.sum(jnp.where(ok, d2, 0.0)))
        return jnp.sum(jax.vmap(one, in_axes=(0, 0))(qq, mask))

    def stage_b(i, q, c):
        qq = q + i * 1e-4

        def one(qi, m):
            dx, dy, dz, d2, ok = vx.query_candidates(vm_of(c), qi, m, mcfg)
            t = vx.kth_smallest(d2, ok, k)
            return (jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                    + jnp.sum(jnp.where(ok, dx + dy + dz, 0.0)))
        return jnp.sum(jax.vmap(one, in_axes=(0, 0))(qq, mask))

    def stage_c(i, q, c):
        qq = q + i * 1e-4

        def one(qi, m):
            t_k, n, s1, s2, _ = factors._neighbor_moments(
                vm_of(c), qi, m, mcfg, k)
            return jnp.sum(s1) + jnp.sum(s2) + jnp.sum(n)
        return jnp.sum(jax.vmap(one, in_axes=(0, 0))(qq, mask))

    def stage_d(i, q, c):
        qq = q + i * 1e-4

        def one(qi, m):
            t_k, n, s1, s2, blk = factors._neighbor_moments(
                vm_of(c), qi, m, mcfg, k)
            proj, omega, valid = factors._plane_fit(
                qi, m, t_k, n, s1, s2, blk, thres, k, cfg)
            return (jnp.sum(jnp.where(valid[:, None], proj, 0.0))
                    + jnp.sum(jnp.where(valid[:, None], omega, 0.0)))
        return jnp.sum(jax.vmap(one, in_axes=(0, 0))(qq, mask))

    bench("A. query_candidates (gather + cand math)", stage_a, q0, cells)
    bench("B. + kth_smallest", stage_b, q0, cells)
    bench("C. + moments matmul (G einsum)", stage_c, q0, cells)
    bench("D. + plane fit + gates (full path)", stage_d, q0, cells)


def _cli():
    args = [a for a in sys.argv[1:] if a != "kernel"]
    if "kernel" in sys.argv[1:]:
        kernel_variant(int(args[0]) if args else 16,
                       int(args[1]) if len(args) > 1 else 2048)
    else:
        main(int(args[0]) if args else 16,
             int(args[1]) if len(args) > 1 else 2048)


def kernel_variant(B=16, M=2048):
    """Stage E: the compute-only Pallas kernel path (XLA gather + fused
    VMEM kernel), same harness — directly comparable to stage D."""
    from scripts import pallas_assoc as pa  # archived kernel (round 4)

    cfg = LIOConfig()
    mcfg = cfg.map
    rng = np.random.default_rng(0)
    vm = vx.empty_map(mcfg)
    pts = rng.uniform(-20, 20, (40000, 3)).astype(np.float32)
    for i in range(0, len(pts), 4000):
        vm = vx.insert(vm, jnp.asarray(pts[i:i + 4000]),
                       jnp.ones(4000, bool), mcfg)
    cells = jax.block_until_ready(
        jnp.broadcast_to(vm.cells, (B,) + vm.cells.shape))
    q0 = jnp.asarray(rng.uniform(-18, 18, (B, M, 3)).astype(np.float32))
    mask = jnp.ones((B, M), bool)
    thres = jnp.float32(cfg.solver.thres_dist)

    def stage_e(i, q, c):
        qq = q + i * 1e-4
        mu, vec, valid, t_k, n = pa.assoc_batched(
            c, qq, mask, thres, mcfg, mode=0,
            scatter_ratio=cfg.solver.plane_scatter_ratio)
        return (jnp.sum(jnp.where(valid[..., None], mu, 0.0))
                + jnp.sum(jnp.where(valid[..., None], vec, 0.0)))

    bench("E. pallas kernel path (gather + fused)", stage_e, q0, cells)


if __name__ == "__main__":
    _cli()
