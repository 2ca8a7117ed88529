"""Split the gathered-rows association cost: gather vs kernel vs XLA fit.

    python scripts/assoc_split_bench.py [B] [M]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mmloam_tpu.config import LIOConfig
from scripts import pallas_assoc as pa  # archived kernel (round 4)
from mmloam_tpu.ops import voxelmap as vx
from scripts.pallas_assoc_test import build, queries


def timed(fn, args_fn, tag, reps=20):
    fn(*args_fn(0))
    jax.block_until_ready(fn(*args_fn(0)))
    t0 = time.perf_counter()
    outs = [fn(*args_fn(i + 1)) for i in range(reps)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:8]
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:28s}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


def main(B=16, M=2048):
    cfg = LIOConfig()
    vm, world, rng = build(cfg)
    pw, mask = queries(world, rng, M, origin=(0.0, 0.0, 0.0))
    pw_b = jnp.asarray(np.stack([np.asarray(pw) + 1e-4 * b
                                 for b in range(B)]), jnp.float32)
    mask_b = jnp.broadcast_to(jnp.asarray(mask), (B, M))
    cells_b = jnp.broadcast_to(vm.cells, (B,) + vm.cells.shape)

    prep = jax.jit(lambda p, m: jax.vmap(
        lambda pp, mm: pa.prepare_queries(pp, mm, cfg.map))(p, m))
    slot_b, meta_b = prep(pw_b, mask_b)

    # 1. prep only (XLA address math)
    timed(prep, lambda i: (pw_b + np.float32(1e-5 * i), mask_b),
          "prepare_queries")

    # 2. gather only
    gather = jax.jit(lambda c, s: pa._gather_rows(c, s))
    timed(gather, lambda i: (cells_b, jnp.clip(slot_b + i, 0,
                                               vm.cells.shape[0] - 1)),
          "row gather (B,M,8,128)")

    rows_b = gather(cells_b, slot_b)

    # 3. kernel only on pre-gathered rows
    params = dict(packs=vx._pack(cfg.map), voxel=float(cfg.map.voxel_size),
                  stencil=(float(cfg.map.stencil_x),
                           float(cfg.map.stencil_y),
                           float(cfg.map.stencil_z)))
    kern = jax.jit(lambda r, m, t: pa._assoc_pallas(
        r, m, t, k=5, mode=0, params=params, scatter_ratio=0.05,
        interpret=False))
    thres_b = jnp.full((B,), 1.0, jnp.float32)
    timed(kern, lambda i: (rows_b + np.float32(1e-6 * i), meta_b, thres_b),
          "fit kernel on rows")

    # 4. end-to-end (public API)
    full = jax.jit(lambda c, p, m: pa.assoc_batched(
        c, p, m, jnp.float32(1.0), cfg.map, mode=0, scatter_ratio=0.05))
    timed(full, lambda i: (cells_b, pw_b + np.float32(1e-5 * i), mask_b),
          "assoc_batched end-to-end")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2048)
