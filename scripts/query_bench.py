"""Differential in-program benchmark of query_knn and its selection tail.

Variants measured with the loop-inside-jit method (see gather_bench):
  A. current query_knn (argmin-loop tail)
  B. top_k on reshaped (M, S*cpr) tail
  C. gather + d2 only (no selection) — the floor
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu.ops import voxelmap as vx

B, M = 8, 1024
N_LO, N_HI = 2, 12


def bench(name, fn, *args):
    @partial(jax.jit, static_argnums=0)
    def red(n, *a):
        def it(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

    def run(n):
        out = np.asarray(red(n, *args))
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


def main():
    cfg = tiny_config().map
    rng = np.random.default_rng(0)
    pts = rng.uniform(-15, 15, (20000, 3)).astype(np.float32)
    vm = vx.empty_map(cfg)
    step = 2000
    for i in range(0, len(pts), step):
        vm = vx.insert(vm, jnp.asarray(pts[i:i + step]),
                       jnp.ones(step, bool), cfg)
    cells = jax.block_until_ready(vm.cells)
    q0 = jnp.asarray(rng.uniform(-14, 14, (B, M, 3)).astype(np.float32))
    mask = jnp.ones((B, M), bool)

    def qa(i, q, cells):
        qq = q + i * 1e-4
        nbr, valid, d2 = jax.vmap(
            lambda qi, m: vx.query_knn(vx.VoxelMap(cells), qi, m, cfg))(
                qq, mask)
        return jnp.sum(jnp.where(valid, nbr[..., 0], 0.0))

    bench("A. query_knn current (argmin tail)", qa, q0, cells)

    # variant B: top_k tail
    def query_topk(vmc, q, msk):
        px, py, pz = cfg.pack_x, cfg.pack_y, cfg.pack_z
        nbx, nby, nbz = vx._super_window(cfg)
        cpr = vx._cpr(cfg)
        S = nbx * nby * nbz
        Mq = q.shape[0]
        v = vx._voxel_coords(q, cfg)
        sx0 = (v[:, 0] - cfg.stencil_x) // px
        sy0 = (v[:, 1] - cfg.stencil_y) // py
        sz0 = (v[:, 2] - cfg.stencil_z) // pz
        ox, oy, oz = jnp.meshgrid(jnp.arange(nbx), jnp.arange(nby),
                                  jnp.arange(nbz), indexing="ij")
        sv = jnp.stack([sx0[:, None] + ox.ravel()[None, :],
                        sy0[:, None] + oy.ravel()[None, :],
                        sz0[:, None] + oz.ravel()[None, :]], axis=-1)
        slot, key = vx._super_decompose(sv, cfg)
        rows = vmc.cells[slot]
        sum_x = rows[..., 0:cpr]
        sum_y = rows[..., cpr:2 * cpr]
        sum_z = rows[..., 2 * cpr:3 * cpr]
        meta = rows[..., 3 * cpr:4 * cpr]
        key_st = jnp.floor(meta / 128.0)
        cnt = meta - key_st * 128.0
        ok = (key_st == key[..., None]) & (cnt > 0) & msk[:, None, None]
        inv = 1.0 / jnp.maximum(cnt, 1.0)
        subx, suby, subz = jnp.meshgrid(jnp.arange(px), jnp.arange(py),
                                        jnp.arange(pz), indexing="ij")
        ls = cfg.voxel_size
        dx = (sv[..., 0:1].astype(q.dtype) * (px * ls) - q[:, None, 0:1]
              + (subx.ravel().astype(q.dtype) * ls)[None, None, :]
              + sum_x * inv)
        dy = (sv[..., 1:2].astype(q.dtype) * (py * ls) - q[:, None, 1:2]
              + (suby.ravel().astype(q.dtype) * ls)[None, None, :]
              + sum_y * inv)
        dz = (sv[..., 2:3].astype(q.dtype) * (pz * ls) - q[:, None, 2:3]
              + (subz.ravel().astype(q.dtype) * ls)[None, None, :]
              + sum_z * inv)
        d2 = jnp.where(ok, dx * dx + dy * dy + dz * dz, jnp.inf)
        C = S * cpr
        neg, idx = jax.lax.top_k(-d2.reshape(Mq, C), cfg.knn)
        take = lambda a: jnp.take_along_axis(a.reshape(Mq, C), idx, axis=1)
        nbr = jnp.stack([take(dx), take(dy), take(dz)], -1) + q[:, None, :]
        return nbr, take(ok), -neg

    def qb(i, q, cells):
        qq = q + i * 1e-4
        nbr, valid, d2 = jax.vmap(
            lambda qi, m: query_topk(vx.VoxelMap(cells), qi, m))(qq, mask)
        return jnp.sum(jnp.where(valid, nbr[..., 0], 0.0))

    bench("B. top_k tail", qb, q0, cells)

    # variant C: floor — gather + d2 min only
    def qc(i, q, cells):
        qq = q + i * 1e-4

        def one(qi, msk):
            px, py, pz = cfg.pack_x, cfg.pack_y, cfg.pack_z
            nbx, nby, nbz = vx._super_window(cfg)
            cpr = vx._cpr(cfg)
            v = vx._voxel_coords(qi, cfg)
            sx0 = (v[:, 0] - cfg.stencil_x) // px
            sy0 = (v[:, 1] - cfg.stencil_y) // py
            sz0 = (v[:, 2] - cfg.stencil_z) // pz
            ox, oy, oz = jnp.meshgrid(jnp.arange(nbx), jnp.arange(nby),
                                      jnp.arange(nbz), indexing="ij")
            sv = jnp.stack([sx0[:, None] + ox.ravel()[None, :],
                            sy0[:, None] + oy.ravel()[None, :],
                            sz0[:, None] + oz.ravel()[None, :]], axis=-1)
            slot, key = vx._super_decompose(sv, cfg)
            rows = vx.VoxelMap(cells).cells[slot]
            return jnp.sum(jnp.min(rows, axis=-1))

        return jnp.sum(jax.vmap(one)(qq, mask))

    bench("C. gather floor", qc, q0, cells)


if __name__ == "__main__":
    main()
