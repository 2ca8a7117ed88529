"""ReducedFactor correctness: the moment-compressed quadratic must equal a
per-point residual/Jacobian sweep exactly (same frozen weights).

This is the guard for the TPU solver redesign (estimator/reduced.py): the
LM loop consumes only the compressed forms, so any mismatch here corrupts
every solve silently.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mmloam_tpu import lie
from mmloam_tpu.estimator import reduced


def _random_factors(seed, K=40, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.normal(0, 5, (K, 3)), dtype)
    S = jnp.asarray(rng.normal(0, 1, (K, 3, 3)), dtype)
    valid = jnp.asarray(rng.random(K) > 0.3)
    phi0 = jnp.asarray([0.1, -0.2, 0.3], dtype)
    P0 = jnp.asarray([100.0, -50.0, 3.0], dtype)   # far from origin
    R0 = lie.exp_matrix(phi0)
    q = (a @ R0.T + P0[None, :]) + jnp.asarray(
        rng.normal(0, 0.01, (K, 3)), dtype)
    return a, S, valid, phi0, P0, R0, q


def _make_rf(a, S, valid, phi0, P0, R0, q):
    o = P0
    Q, g0, c0 = reduced._accumulate(a, q - o[None, :], S, valid, R0, P0 - o)
    return reduced.ReducedFactor(
        Q=Q, g0=g0, c0=c0, z0=reduced._zvec(R0, P0, o), o=o,
        NtN=jnp.zeros((3, 3), a.dtype), n_line=jnp.int32(0),
        n_plane=jnp.int32(0), n_normal=jnp.int32(0))


def test_eval_reduced_matches_perpoint_oracle():
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        a, S, valid, phi0, P0, R0, q = _random_factors(0)
        rf = _make_rf(a, S, valid, phi0, P0, R0, q)

        def resid(x6):
            R = lie.exp_matrix(x6[3:6])
            P = x6[0:3]
            r = jnp.einsum("kij,kj->ki", S, (a @ R.T + P[None, :] - q))
            return (r * valid[:, None]).reshape(-1)

        for dx in [np.zeros(6),
                   np.array([0.05, -0.02, 0.01, 0.03, -0.01, 0.02]),
                   np.array([-0.2, 0.1, 0.05, -0.08, 0.06, -0.04])]:
            x6 = jnp.concatenate([P0, phi0]) + jnp.asarray(dx)
            H_r, b_r, c_r = reduced.eval_reduced(x6, rf)
            r = resid(x6)
            J = jax.jacfwd(resid)(x6)
            H_o, b_o = J.T @ J, J.T @ r
            c_o = 0.5 * jnp.sum(r * r)
            np.testing.assert_allclose(float(c_r), float(c_o), rtol=1e-10)
            np.testing.assert_allclose(np.asarray(H_r), np.asarray(H_o),
                                       rtol=0, atol=2e-7 * float(jnp.max(jnp.abs(H_o))))
            np.testing.assert_allclose(np.asarray(b_r), np.asarray(b_o),
                                       rtol=0, atol=2e-7 * max(1e-9, float(jnp.max(jnp.abs(b_o)))))
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_eval_reduced_f32_far_from_origin():
    """The recentered expansion must stay accurate in f32 at world
    coordinates hundreds of meters out (the cancellation the z0-expansion
    exists to prevent)."""
    a, S, valid, phi0, P0, R0, q = _random_factors(1, dtype=jnp.float64)
    P0 = P0 + jnp.asarray([300.0, -200.0, 10.0])
    q = (a @ R0.T + P0[None, :]) + 0.01
    rf64 = _make_rf(a, S, valid, phi0, P0, R0, q)
    rf32 = jax.tree.map(lambda x: (x.astype(jnp.float32)
                                   if x.dtype == jnp.float64 else x), rf64)

    dx = jnp.asarray([0.02, -0.01, 0.005, 0.01, -0.005, 0.008])
    x64 = jnp.concatenate([P0, phi0]) + dx
    H64, b64, c64 = reduced.eval_reduced(x64, rf64)
    H32, b32, c32 = reduced.eval_reduced(x64.astype(jnp.float32), rf32)
    assert abs(float(c32) - float(c64)) < 1e-3 * (1.0 + abs(float(c64)))
    np.testing.assert_allclose(np.asarray(b32), np.asarray(b64), rtol=0,
                               atol=1e-3 * float(jnp.max(jnp.abs(b64))))
