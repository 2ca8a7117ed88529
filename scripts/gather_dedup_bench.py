"""Decision microbenchmark for superrow-gather deduplication (VERDICT r4).

The association path issues 8 superrow gathers PER QUERY POINT
(voxelmap.query_candidates); downsampled stack points cluster heavily, so
neighboring queries share most of their 8 rows.  The gather-issue cost is
~10 ns/row (scripts/gather_bench.py), making association issue-bound.  This
script measures, on the real TPU, which dedup scheme actually pays:

  A. baseline           — (M, 8) row gathers from the big map table
  B. small-table        — (M, 8) row gathers from a compact (U*8)-row table
                          (does issue cost depend on table size?)
  C. two-level          — (U, 8) from big + (M, 8) from compact (scheme B's
                          real total)
  D. grouped broadcast  — queries sorted by base superrow, groups of G
                          share one (8,) window gather, rescue buffer for
                          group-impure queries: (M/G + Mr, 8) gathers total
  E. sort overhead      — lax.sort of (M,) keys + 4 payload columns
  F. sorted-index big   — (M, 8) gathers from big table with SORTED
                          (spatially correlated) indices (locality effect?)

Timing per CLAUDE.md rules: loop N inside one jit, rotate indices per
iteration to defeat CSE, difference two N values, np.asarray barrier.

Shapes model the flagship surf association: B=8 sequences, M=2048 queries,
rows of 128 f32 (512 B), C=131072 rows (the 256x256x64 map's superrow
count), U=M/4, G=8, Mr=M/4.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, M, C, R = 8, 2048, 131072, 128
S = 8              # rows per query window
U = M // 4         # unique-base budget
G = 8              # queries per group (sorted)
MR = M // 4        # rescue buffer
N_LO, N_HI = 2, 22


def run(red, n, *args):
    np.asarray(red(n, *args))          # compile+warm
    ts = []
    for r in range(3):
        a0 = args[0] + (np.float32(1e-6 * (r + 1))
                        if args[0].dtype == jnp.float32 else (r + 1))
        t0 = time.perf_counter()
        np.asarray(red(n, a0, *args[1:]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, body, *args, rows_per_iter):
    @partial(jax.jit, static_argnums=0)
    def red(n, *a):
        def it(i, acc):
            return acc + jnp.sum(body(i, *a))
        return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

    t_lo = run(red, N_LO, *args)
    t_hi = run(red, N_HI, *args)
    per = (t_hi - t_lo) / (N_HI - N_LO)
    print(f"{name:46s} {per*1e3:9.3f} ms/iter "
          f"({per/max(rows_per_iter,1)*1e9:6.2f} ns/row @ {rows_per_iter} rows)",
          flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.normal(size=(B, C, R)).astype(np.float32))
    small = jnp.asarray(rng.normal(size=(B, U * S, R)).astype(np.float32))

    # clustered query slots: M queries over ~U unique bases, sorted variant
    # groups duplicates together (what a base-slot sort produces)
    ubase = rng.integers(0, C - 64, size=(B, U))
    assign = rng.integers(0, U, size=(B, M))
    slot_rand = np.take_along_axis(ubase, assign, axis=1)       # (B, M)
    slot_sort = np.sort(slot_rand, axis=1)
    win = np.arange(S)[None, None, :]                           # window rows
    idx_rand = jnp.asarray(((slot_rand[..., None] + win) % C).astype(np.int32))
    idx_sort = jnp.asarray(((slot_sort[..., None] + win) % C).astype(np.int32))
    idx_uniq = jnp.asarray(((ubase[..., None] + win) % C).astype(np.int32))
    idx_small = jnp.asarray(
        (assign[..., None] * S + np.arange(S)[None, None, :]).astype(np.int32))
    idx_grp = jnp.asarray(((slot_sort[:, ::G][..., None] + win) % C
                           ).astype(np.int32))                  # (B, M/G, S)
    idx_resc = jnp.asarray(((slot_rand[:, :MR][..., None] + win) % C
                            ).astype(np.int32))

    gath = lambda c, s: jax.vmap(lambda cc, ss: cc[ss])(c, s)

    def rot(i, s, n):
        return (s + i * 97) % n

    bench("A baseline (M,8) big-table",
          lambda i, c, s: gath(c, rot(i, s, C)), cells, idx_rand,
          rows_per_iter=B * M * S)
    bench("F sorted-index (M,8) big-table",
          lambda i, c, s: gath(c, rot(i, s, C)), cells, idx_sort,
          rows_per_iter=B * M * S)
    bench("B small-table (M,8) reads",
          lambda i, c, s: gath(c, rot(i, s, U * S)), small, idx_small,
          rows_per_iter=B * M * S)
    bench("C1 unique-base (U,8) big-table",
          lambda i, c, s: gath(c, rot(i, s, C)), cells, idx_uniq,
          rows_per_iter=B * U * S)

    def two_level(i, c, sm, su, sq):
        t = gath(c, rot(i, su, C)).reshape(B, U * S, R)
        return jax.vmap(lambda tt, ss: tt[ss])(t, sq)
    bench("C  two-level (U,8 big + M,8 compact)",
          lambda i, c, su, sq: two_level(i, c, None, su, sq),
          cells, idx_uniq, idx_small, rows_per_iter=B * (U + M) * S)

    def grouped(i, c, sg, sr):
        g = gath(c, rot(i, sg, C))                    # (B, M/G, S, R)
        gb = jnp.broadcast_to(g[:, :, None], (B, M // G, G, S, R))
        r = gath(c, rot(i, sr, C))                    # (B, MR, S, R)
        return jnp.sum(gb) + jnp.sum(r)
    bench(f"D grouped G={G} broadcast + {MR} rescue",
          grouped, cells, idx_grp, idx_resc,
          rows_per_iter=B * (M // G + MR) * S)

    # E: the sort a real dedup needs (keys + idx payload), M per sequence
    keys = jnp.asarray(slot_rand.astype(np.int32))
    pay = jnp.asarray(rng.normal(size=(4, B, M)).astype(np.float32))

    def sortit(i, k, p):
        # lax.sort sorts the last axis, batched over leading dims
        out = jax.lax.sort((rot(i, k, C), p[0], p[1], p[2], p[3]),
                           num_keys=1)
        return out[1]
    bench("E lax.sort (M,) keys + 4 payloads",
          sortit, keys, pay, rows_per_iter=B * M)

    print("done", flush=True)


if __name__ == "__main__":
    main()
