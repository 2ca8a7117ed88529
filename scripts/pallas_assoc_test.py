"""Standalone check + micro-bench of the fused association kernel vs XLA.

    python scripts/pallas_assoc_test.py              # TPU: correctness + speed
    JAX_PLATFORMS=cpu python scripts/pallas_assoc_test.py --interpret

Compares assoc_batched against the XLA path (query_candidates +
select_k_smallest + moments + linalg3 fits) on flagship shapes, both
directly and under vmap (the pipeline calls it inside vmap(step_core)),
then times both at (B=16, M=2048).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

from mmloam_tpu.config import LIOConfig
from mmloam_tpu.data import synthetic
from mmloam_tpu.estimator import factors
from mmloam_tpu.ops import linalg3, voxelmap as vx
from scripts import pallas_assoc  # archived kernel (round 4)


def build(cfg, seed=0, n_scans=5):
    rng = np.random.default_rng(seed)
    world = synthetic.default_world()
    vm = vx.empty_map(cfg.map)
    az = np.linspace(-np.pi, np.pi, 1024, endpoint=False)
    elevs = np.deg2rad(np.linspace(-15, 15, 16))
    A, E = np.meshgrid(az, elevs)
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], -1).reshape(-1, 3)
    for i in range(n_scans):
        o = np.array([0.4 * i, 0.2 * i, 0.0])
        r = world.raycast(o, dirs)
        ok = np.isfinite(r)
        r = r + rng.normal(scale=0.004, size=r.shape)
        pts = o + dirs * np.where(ok, r, 0.0)[:, None]
        vm = vx.insert(vm, jnp.asarray(pts, jnp.float32), jnp.asarray(ok),
                       cfg.map)
    return vm, world, rng


def queries(world, rng, M, origin):
    az = rng.uniform(-np.pi, np.pi, M)
    el = rng.uniform(-0.3, 0.3, M)
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], -1)
    o = np.asarray(origin)
    r = world.raycast(o, dirs)
    ok = np.isfinite(r)
    pw = o + dirs * np.where(ok, r, 0.0)[:, None]
    return jnp.asarray(pw, jnp.float32), jnp.asarray(ok)


@functools.partial(jax.jit, static_argnames=("cfg",))
def xla_plane(cells, pw, mask, *, cfg):
    vm = vx.VoxelMap(cells=cells)
    dx, dy, dz, d2, ok = vx.query_candidates(vm, pw, mask, cfg.map)
    t_k, n, w = vx.select_k_smallest(d2, ok, cfg.map.knn)
    wf = w.astype(jnp.float32)
    red = lambda a: jnp.sum(a * wf, axis=(1, 2))
    s1 = jnp.stack([red(dx), red(dy), red(dz)], axis=-1)
    nf = jnp.maximum(n, 1.0)
    return t_k, n, s1 / nf[:, None]


def main():
    cfg = LIOConfig()
    vm, world, rng = build(cfg)
    B, M = 16, 2048
    pws, masks = [], []
    for b in range(B):
        pw, mask = queries(world, rng, M, (0.9 + 0.02 * b, 0.5, 0.05))
        pws.append(pw)
        masks.append(mask)
    pw_b = jnp.stack(pws)
    mask_b = jnp.stack(masks)
    cells_b = jnp.broadcast_to(vm.cells, (B,) + vm.cells.shape)

    # correctness: direct batch
    mu, vec, valid, t_k, n = pallas_assoc.assoc_batched(
        cells_b, pw_b, mask_b, jnp.float32(1.0), cfg.map, mode=0,
        scatter_ratio=cfg.solver.plane_scatter_ratio, interpret=INTERPRET)
    t_r, n_r, mu_r = jax.vmap(
        lambda p, m: xla_plane(vm.cells, p, m, cfg=cfg))(pw_b, mask_b)
    t_r, n_r, mu_r = map(np.asarray, (t_r, n_r, mu_r))
    have = (n_r >= cfg.map.knn) & (t_r < 1.0) & np.asarray(mask_b)
    assert have.sum() > B * 200, have.sum()
    np.testing.assert_array_equal(np.asarray(n)[have], n_r[have])
    np.testing.assert_allclose(np.asarray(t_k)[have], t_r[have],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mu)[have], mu_r[have],
                               rtol=1e-4, atol=1e-5)
    print(f"direct batch OK ({int(have.sum())} associated points)")

    # correctness: under vmap (the pipeline's calling convention)
    mu2, _, _, t2, n2 = jax.vmap(
        lambda c, p, m: tuple(x[0] for x in pallas_assoc.assoc_batched(
            c[None], p[None], m[None], jnp.float32(1.0), cfg.map, mode=0,
            scatter_ratio=cfg.solver.plane_scatter_ratio,
            interpret=INTERPRET)))(cells_b, pw_b, mask_b)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu),
                               rtol=1e-6, atol=1e-7)
    print("vmap == direct batch OK")

    if INTERPRET:
        print("interpret mode: skipping timing")
        return

    # timing: rotate query sets to defeat any execution cache
    def timed(fn, tag, reps=20):
        fn(pw_b, mask_b)  # warm
        t0 = time.perf_counter()
        outs = []
        for i in range(reps):
            outs.append(fn(pw_b + np.float32(1e-4 * (i + 1)), mask_b))
        for o in outs:
            np.asarray(jax.tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag}: {dt * 1e3:.2f} ms per (B={B}, M={M}) association")
        return dt

    # cells must be jit ARGUMENTS: closed-over concrete arrays are baked
    # into the program as constants, and at flagship dims the serialized
    # compile request exceeds the remote compile server's size limit
    # (HTTP 413)
    k_fn_raw = jax.jit(lambda c, p, m: pallas_assoc.assoc_batched(
        c, p, m, jnp.float32(1.0), cfg.map, mode=0,
        scatter_ratio=cfg.solver.plane_scatter_ratio))
    x_fn_raw = jax.jit(lambda c, p, m: jax.vmap(
        lambda pp, mm: xla_plane(c, pp, mm, cfg=cfg))(p, m))
    k_fn = lambda p, m: k_fn_raw(cells_b, p, m)
    x_fn = lambda p, m: x_fn_raw(vm.cells, p, m)
    dk = timed(k_fn, "pallas kernel")
    dx_ = timed(x_fn, "xla path    ")
    print(f"speedup: {dx_ / dk:.2f}x")


if __name__ == "__main__":
    main()
