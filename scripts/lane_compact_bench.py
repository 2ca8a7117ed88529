"""Decision microbenchmark: compact the dense candidate blocks to 128 lanes?

The dense association blocks (voxelmap.query_candidates_dense) carry
S*cpr = 256 candidate lanes per query, but the exact fine stencil
(2*2+1, 2*2+1, 2*1+1) = 75 cells means ~71% of lanes are always-invalid
window overshoot; every downstream pass (k-smallest reads d2d ~6x,
moments read all 4 blocks) pays bytes for dead lanes.  PROFILE_r05 ranks
this pipeline first (voxelmap.py:305 fusion, ~17% of wall), so halving
its lane width is the largest single perf lever left.

The catch: compaction needs a per-query minor-dim gather
(out[m, j] = x[m, table[phase[m], j]] with 32 possible phases = v mod
pack), and gathers that permute the 128-lane minor dim of a tiled block
can lower to a real transpose (CLAUDE.md).  This bench measures, on the
real chip, the full slice both ways:

  FULL:     build 4x (M, 256) bf16 blocks from gathered rows, then the
            5-pass distinct-min selection + count pass + moment pass.
  COMPACT:  same build fused with a take_along_axis lane-compaction to
            (M, 128), then the same selection/moment passes at half
            width.
  COMPACT-GATHER-ONLY: the take_along_axis alone (isolates the
            compaction op's cost from the byte savings).

Timing per CLAUDE.md: loop N inside one jit, perturb per iteration,
difference two N values, np.asarray barrier.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, M, S, CPR = 8, 2048, 8, 32
C_FULL = S * CPR
C_CMP = 128
N_LO, N_HI = 3, 13


def run(red, n, *args):
    np.asarray(red(n, *args))
    ts = []
    for r in range(3):
        a0 = args[0] + np.float32(1e-6 * (r + 1))
        t0 = time.perf_counter()
        np.asarray(red(n, a0, *args[1:]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, body, *args):
    @partial(jax.jit, static_argnums=0)
    def red(n, *a):
        def it(i, acc):
            return acc + body(a[0] + jnp.float32(i) * 1e-7, *a[1:])
        return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

    t_lo = run(red, N_LO, *args)
    t_hi = run(red, N_HI, *args)
    per = (t_hi - t_lo) / (N_HI - N_LO)
    print(f"{name:44s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def select_moments(dxd, dyd, dzd, d2d, k=5):
    """The downstream consumer both schemes share: k-pass distinct-min
    threshold + tie-inclusive count + masked moment sums (the shape of
    voxelmap.kth_smallest_dense + factors' moment accumulation)."""
    f32 = jnp.float32
    t = jnp.full((d2d.shape[0],), -jnp.inf, d2d.dtype)
    for _ in range(k):
        t = jnp.min(jnp.where(d2d > t[:, None], d2d, jnp.inf), axis=1)
    sel = (d2d <= t[:, None]) & jnp.isfinite(d2d.astype(f32))
    w = sel.astype(f32)
    cnt = jnp.maximum(w.sum(1), 1.0)
    mx = (dxd.astype(f32) * w).sum(1) / cnt
    my = (dyd.astype(f32) * w).sum(1) / cnt
    mz = (dzd.astype(f32) * w).sum(1) / cnt
    mxx = (dxd.astype(f32) ** 2 * w).sum(1) / cnt
    return jnp.sum(mx + my + mz + mxx)


def build_blocks(rows, base):
    """Stand-in for the dense build: unpack 4 field slices and produce
    dx/dy/dz/d2 with the same arithmetic shape as query_candidates."""
    sum_x = rows[..., 0:CPR] + base[:, None, None]
    sum_y = rows[..., CPR:2 * CPR]
    sum_z = rows[..., 2 * CPR:3 * CPR]
    meta = rows[..., 3 * CPR:4 * CPR]
    ok = meta > 0.0
    dx = sum_x.reshape(-1, C_FULL)
    dy = sum_y.reshape(-1, C_FULL)
    dz = sum_z.reshape(-1, C_FULL)
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(ok.reshape(-1, C_FULL), d2, jnp.inf)
    return dx, dy, dz, d2


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(B * M, S, 4 * CPR)).astype(np.float32))
    base = jnp.asarray(rng.normal(size=(B * M,)).astype(np.float32))
    phase = jnp.asarray(rng.integers(0, 32, size=(B * M,)).astype(np.int32))
    # per-phase lane tables: which 128 of the 256 lanes survive (host
    # constants in production; random but valid here)
    tbl_np = np.stack([rng.permutation(C_FULL)[:C_CMP] for _ in range(32)])
    tbl = jnp.asarray(np.sort(tbl_np, axis=1).astype(np.int32))

    def full(base, rows):
        dx, dy, dz, d2 = build_blocks(rows, base)
        bf = lambda a: a.astype(jnp.bfloat16)
        dx, dy, dz, d2 = jax.lax.optimization_barrier(
            (bf(dx), bf(dy), bf(dz), bf(d2)))
        return select_moments(dx, dy, dz, d2)

    def compact(base, rows):
        dx, dy, dz, d2 = build_blocks(rows, base)
        idx = tbl[phase]                              # (B*M, 128)
        g = lambda a: jnp.take_along_axis(a, idx, axis=1)
        bf = lambda a: g(a).astype(jnp.bfloat16)
        dx, dy, dz, d2 = jax.lax.optimization_barrier(
            (bf(dx), bf(dy), bf(dz), bf(d2)))
        return select_moments(dx, dy, dz, d2)

    def gather_only(base, rows):
        dx, _, _, _ = build_blocks(rows, base)
        idx = tbl[phase]
        return jnp.sum(jnp.take_along_axis(dx, idx, axis=1))

    def build_only(base, rows):
        dx, dy, dz, d2 = build_blocks(rows, base)
        bf = lambda a: a.astype(jnp.bfloat16)
        dx, dy, dz, d2 = jax.lax.optimization_barrier(
            (bf(dx), bf(dy), bf(dz), bf(d2)))
        f = lambda a: jnp.sum(jnp.where(jnp.isfinite(a.astype(jnp.float32)),
                                        a.astype(jnp.float32), 0.0))
        return f(dx) + f(dy) + f(dz) + f(d2)

    bench("FULL 256-lane build+select+moments", full, base, rows)
    bench("COMPACT 128-lane build+select+moments", compact, base, rows)
    bench("compaction take_along_axis only", gather_only, base, rows)
    bench("build+materialize only (256-lane)", build_only, base, rows)
    print("done", flush=True)


if __name__ == "__main__":
    main()
