"""Raw TPU gather-formulation shootout for the voxel-map stencil read.

The tunneled backend has a ~27 ms per-execution RPC floor, so each variant
is looped N times INSIDE one jitted program (input rotated per iteration to
defeat CSE/hoisting) and cost is reported as (t(N_hi) - t(N_lo)) / (N_hi -
N_lo).

Workload: B=8 sequences, M=1024 queries each, S=75 stencil cells, table
C=294912 rows of 8 f32 (tiny-config surf map).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial

B, M, S, C, R = 8, 1024, 75, 294912, 8
N_LO, N_HI = 2, 22


def run(red, n, *args):
    out = np.asarray(red(n, *args))       # compile+warm
    ts = []
    for r in range(3):
        a0 = args[0] + np.float32(1e-6 * (r + 1))
        t0 = time.perf_counter()
        out = np.asarray(red(n, (a0,) + args[1:])[0] if False else red(n, a0, *args[1:]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, body, *args, bytes_per_iter=None):
    """body(i, *args) -> array; summed into an accumulator inside the loop."""

    @partial(jax.jit, static_argnums=0)
    def red(n, *a):
        def it(i, acc):
            return acc + jnp.sum(body(i, *a))
        return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

    t_lo = run(red, N_LO, *args)
    t_hi = run(red, N_HI, *args)
    per = (t_hi - t_lo) / (N_HI - N_LO)
    gbs = (bytes_per_iter or B * M * S * R * 4) / 1e9
    print(f"{name:44s} {per*1e3:9.3f} ms/iter  ({gbs/max(per,1e-9):6.1f} GB/s)",
          flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.normal(size=(B, C, R)).astype(np.float32))
    cells4 = jnp.asarray(np.ascontiguousarray(np.asarray(cells[..., :4])))
    # clustered slots like real queries (points nearby -> nearby slots)
    base = rng.integers(0, C - 4096, size=(B, M, 1, 1))
    off = rng.integers(0, 4096, size=(B, M, S, 1))
    slot0 = jnp.asarray(((base + off) % C).astype(np.int32))[..., 0]  # (B,M,S)

    def rot(i, s):
        return (s + i * 97) % C

    bench("c[slot] rows of 8 f32 (current)",
          lambda i, c, s: jax.vmap(lambda cc, ss: cc[ss])(c, rot(i, s)),
          cells, slot0)
    bench("c4[slot] rows of 4 f32",
          lambda i, c, s: jax.vmap(lambda cc, ss: cc[ss])(c, rot(i, s)),
          cells4, slot0, bytes_per_iter=B * M * S * 4 * 4)
    bench("gather+reduce fused (sum over S)",
          lambda i, c, s: jax.vmap(lambda cc, ss: jnp.sum(cc[ss], axis=1))(
              c, rot(i, s)),
          cells, slot0)
    # one flat scalar gather per element (vector payload as separate gathers)
    def scalarized(i, c, s):
        si = rot(i, s)
        return sum(jax.vmap(lambda cc, ss: cc[:, k][ss])(c, si)
                   for k in range(R))
    bench("8x scalar-column gathers", scalarized, cells, slot0)

    # dense one-hot matmul over a cropped window (queries clustered in 4096
    # rows): crop C to 8192 rows around min(slot), one-hot (M*S, 8192) @ rows
    def onehot_crop(i, c, s):
        si = rot(i, s)
        lo = jnp.min(si, axis=(1, 2))                       # (B,)
        def one(cc, ss, l):
            win = jax.lax.dynamic_slice(cc, (l, 0), (8192, R))
            oh = jax.nn.one_hot(ss.reshape(-1) - l, 8192, dtype=cc.dtype)
            return oh @ win
        return jax.vmap(one)(c, si, lo)
    bench("one-hot matmul over 8192-row crop", onehot_crop, cells, slot0,
          bytes_per_iter=B * (M * S * 8192 * 2))   # flops proxy, GB/s meaningless

    # iota-compare gather: for small crop, compare-select without matmul
    print("done")


if __name__ == "__main__":
    main()


def rowsize_sweep():
    """Gather rate vs row size at constant table bytes and row count scalings."""
    rng = np.random.default_rng(1)
    total = C * R  # keep table float count constant
    for rows_f32 in (4, 8, 16, 32, 64, 128):
        nrows = total // rows_f32
        tbl = jnp.asarray(rng.normal(size=(B, nrows, rows_f32)).astype(np.float32))
        # per-query row count shrinks as rows grow (superrow packing model):
        # 75 cells of 16B -> equivalent coverage with fewer superrows
        s_eff = max(6, int(round(75 * 16 / (rows_f32 * 4))))
        base = rng.integers(0, nrows - 4096, size=(B, M, 1, 1))
        off = rng.integers(0, 4096, size=(B, M, s_eff, 1))
        sl = jnp.asarray(((base + off) % nrows).astype(np.int32))[..., 0]

        def body(i, c, s, _n=nrows):
            return jax.vmap(lambda cc, ss: cc[ss])(c, (s + i * 97) % _n)
        bench(f"rows of {rows_f32:3d} f32 x {s_eff:3d}/query", body, tbl, sl,
              bytes_per_iter=B * M * s_eff * rows_f32 * 4)


if __name__ == "__main__":
    rowsize_sweep()
