"""TPU microbenchmark: (16, 75, 75) SPD solve alternatives for the LM step.

The LM inner loop pays one damped normal-equation solve per iteration
(solver._damped_solve); the profiler shows the jnp.linalg.solve LU
custom-calls cost ~0.44 ms per call on v5e (~6 ms/step at ~14 iterations)
— LAPACK-shaped factorizations are latency-bound on TPU.  Candidates:

  A. jnp.linalg.solve            (LU custom-call, current production)
  B. jnp.linalg.cholesky + st    (SPD; triangular-solve custom-calls)
  C. block-tridiagonal Thomas    (W=5 15x15 blocks, jnp solve per block)
  D. block-Thomas via 15x15 explicit Gauss-Jordan (fori, fused VPU)
  E. dense 75x75 Cholesky-free: jax.scipy cho_solve
  F. Thomas with 15x15 solve via cholesky

Timing per CLAUDE.md: loop N inside jit, perturb per iteration, diff two N.
"""
import os, sys, time
from functools import partial
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

B, W, D = 16, 5, 15
N_LO, N_HI = 4, 24


def make_spd(rng, n):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    H = A @ A.transpose(0, 2, 1) + 10.0 * np.eye(n, dtype=np.float32)
    return H


def block_tridiag(H):
    """Zero out blocks beyond the first off-diagonal (keeps SPD via ridge)."""
    Hb = H.copy()
    for i in range(W):
        for j in range(W):
            if abs(i - j) > 1:
                Hb[:, i*D:(i+1)*D, j*D:(j+1)*D] = 0.0
    return Hb + 40.0 * np.eye(W*D, dtype=np.float32)


def thomas(H, b, solve15):
    """Block-Thomas forward elimination + back substitution."""
    diag = [H[:, i*D:(i+1)*D, i*D:(i+1)*D] for i in range(W)]
    off = [H[:, (i+1)*D:(i+2)*D, i*D:(i+1)*D] for i in range(W-1)]  # sub
    up = [H[:, i*D:(i+1)*D, (i+1)*D:(i+2)*D] for i in range(W-1)]
    rhs = [b[:, i*D:(i+1)*D] for i in range(W)]
    Dm = diag[0]; y = rhs[0]
    Ds, ys = [Dm], [y]
    for i in range(1, W):
        L = jax.vmap(solve15)(jnp.swapaxes(Ds[-1], 1, 2),
                              jnp.swapaxes(off[i-1], 1, 2))
        L = jnp.swapaxes(L, 1, 2)          # off @ inv(D_{i-1})
        Ds.append(diag[i] - L @ up[i-1])
        ys.append(rhs[i] - jnp.einsum("bij,bj->bi", L, ys[-1]))
    x = [None]*W
    x[W-1] = jnp.einsum("bij,bj->bi",
                        jax.vmap(solve15)(Ds[W-1], jnp.eye(D)[None].repeat(B,0)),
                        ys[W-1])
    for i in range(W-2, -1, -1):
        r = ys[i] - jnp.einsum("bij,bj->bi", up[i], x[i+1])
        x[i] = jnp.einsum("bij,bj->bi",
                          jax.vmap(solve15)(Ds[i], jnp.eye(D)[None].repeat(B,0)),
                          r)
    return jnp.concatenate(x, axis=-1)


def gj_inv15(A):
    """15x15 inverse by Gauss-Jordan with partial-free pivoting (SPD-safe),
    written as a fori over columns on an augmented (15, 30) tableau."""
    n = A.shape[-1]
    aug = jnp.concatenate([A, jnp.eye(n, dtype=A.dtype)], axis=-1)
    def body(k, aug):
        piv = aug[k] / aug[k, k]
        col = aug[:, k]
        aug = aug - col[:, None] * piv[None, :]
        return aug.at[k].set(piv)
    aug = jax.lax.fori_loop(0, n, body, aug)
    return aug[:, n:]


def bench(name, f, *args):
    @partial(jax.jit, static_argnums=0)
    def red(n, H, b):
        def it(i, acc):
            Hp = H + (1e-6 * (i + 1)) * jnp.eye(H.shape[-1], dtype=H.dtype)
            return acc + jnp.sum(f(Hp, b + acc * 1e-20))
        return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))
    H, b = args
    np.asarray(red(N_LO, H, b))
    ts_lo = []; ts_hi = []
    for r in range(3):
        Hr = H + np.float32(1e-5*(r+1)) * np.eye(H.shape[-1], dtype=np.float32)
        t0 = time.perf_counter(); np.asarray(red(N_LO, Hr, b)); ts_lo.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); np.asarray(red(N_HI, Hr, b)); ts_hi.append(time.perf_counter()-t0)
    per = (min(ts_hi) - min(ts_lo)) / (N_HI - N_LO)
    print(f"{name:40s} {per*1e3:8.3f} ms/solve", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    H = jnp.asarray(block_tridiag(make_spd(rng, W*D)))
    b = jnp.asarray(rng.normal(size=(B, W*D)).astype(np.float32))

    ref = np.asarray(jnp.linalg.solve(H, b[..., None])[..., 0])

    def check(name, x):
        err = np.abs(np.asarray(x) - ref).max() / np.abs(ref).max()
        print(f"  {name} rel err {err:.2e}", flush=True)

    A = lambda H, b: jnp.linalg.solve(H, b[..., None])[..., 0]
    Bf = lambda H, b: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(H), True), b[..., None])[..., 0]
    C = lambda H, b: thomas(H, b, lambda Ai, Bi: jnp.linalg.solve(Ai, Bi))
    Df = lambda H, b: thomas(H, b, lambda Ai, Bi: gj_inv15(Ai) @ Bi)
    E = lambda H, b: jnp.einsum("bij,bj->bi", jax.vmap(gj_inv15)(H), b)

    check("A", A(H, b)); check("B", Bf(H, b)); check("C", C(H, b))
    check("D", Df(H, b)); check("E75", E(H, b))
    bench("A jnp.linalg.solve 75", A, H, b)
    bench("B cholesky+cho_solve 75", Bf, H, b)
    bench("C thomas 15x15 lu-solve", C, H, b)
    bench("D thomas 15x15 gauss-jordan", Df, H, b)
    bench("E gauss-jordan inv 75 dense", E, H, b)
    print("done", flush=True)


if __name__ == "__main__":
    main()
