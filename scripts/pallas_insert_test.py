"""Standalone check + micro-bench of the Pallas insert kernel vs XLA.

    python scripts/pallas_insert_test.py          # TPU: correctness + speed
    JAX_PLATFORMS=cpu python scripts/pallas_insert_test.py --interpret
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(interpret=False):
    from mmloam_tpu.config import LIOConfig
    from mmloam_tpu.ops import pallas_insert, voxelmap

    cfg = LIOConfig().map if not interpret else \
        LIOConfig().replace(map=None).map  # placeholder, replaced below
    from mmloam_tpu.config import MapConfig
    mcfg = MapConfig(dim_x=64, dim_y=64, dim_z=32) if interpret else \
        LIOConfig().map

    B, N = (2, 256) if interpret else (8, 2048)
    rng = np.random.default_rng(0)
    span = min(mcfg.dim_x, mcfg.dim_y, mcfg.dim_z) * mcfg.voxel_size * 0.4
    pts = rng.uniform(-span, span, (B, N, 3)).astype(np.float32)
    mask = rng.random((B, N)) > 0.1
    cells0 = jnp.stack([voxelmap.empty_map(mcfg).cells] * B)

    # seed the maps with a prior batch so eviction/accumulate paths hit
    pts_prev = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    ref_prev = jax.jit(jax.vmap(lambda c, p, m: voxelmap.insert(
        voxelmap.VoxelMap(c), p, m, mcfg).cells))(
            cells0, jnp.asarray(pts_prev), jnp.asarray(mask))

    t0 = time.time()
    ref = jax.jit(jax.vmap(lambda c, p, m: voxelmap.insert(
        voxelmap.VoxelMap(c), p, m, mcfg).cells))(
            ref_prev, jnp.asarray(pts), jnp.asarray(mask))
    ref_np = np.asarray(ref)
    t_ref_compile = time.time() - t0

    t0 = time.time()
    out = pallas_insert.insert_batched(ref_prev, jnp.asarray(pts),
                                       jnp.asarray(mask), mcfg,
                                       interpret=interpret)
    out_np = np.asarray(out)
    t_pal_compile = time.time() - t0

    diff = np.abs(out_np - ref_np)
    print("max abs diff:", diff.max(), " nonzero cells:",
          int((np.asarray(ref_np) != 0).sum()))
    bad = np.argwhere(diff > 1e-4)
    print("bad entries:", len(bad), bad[:5].tolist())
    assert diff.max() < 1e-4, "MISMATCH"
    print("EQUIVALENT  (compile ref %.1fs pallas %.1fs)" %
          (t_ref_compile, t_pal_compile))

    if not interpret:
        # timing: loop inside jit to beat the RPC floor
        def lots(c, p, m, fn, reps=20):
            def body(i, c):
                return fn(c, p + i * jnp.float32(1e-6), m)
            return jax.lax.fori_loop(0, reps, body, c)

        f_ref = jax.jit(lambda c, p, m: lots(
            c, p, m, lambda c, p, m: jax.vmap(
                lambda cc, pp, mm: voxelmap.insert(
                    voxelmap.VoxelMap(cc), pp, mm, mcfg).cells)(c, p, m)))
        f_pal = jax.jit(lambda c, p, m: lots(
            c, p, m, lambda c, p, m: pallas_insert.insert_batched(
                c, p, m, mcfg)))
        for name, f in [("xla", f_ref), ("pallas", f_pal)]:
            o = f(cells0, jnp.asarray(pts), jnp.asarray(mask))
            np.asarray(o[0, 0])
            t0 = time.time()
            o = f(cells0, jnp.asarray(pts + np.float32(1e-5)),
                  jnp.asarray(mask))
            np.asarray(o[0, 0])
            dt = time.time() - t0
            print(f"{name}: {dt*1e3/20:.2f} ms per batched insert "
                  f"(B={B}, N={N})")


if __name__ == "__main__":
    main(interpret="--interpret" in sys.argv)
