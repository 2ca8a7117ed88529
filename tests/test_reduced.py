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


def _plane_scene_map(dense_bf16=False):
    """Floor + wall sampled on grids -> surf voxel map + query cloud."""
    import dataclasses

    from mmloam_tpu.config import tiny_config
    from mmloam_tpu.ops import voxelmap as vx

    cfg = tiny_config()
    cfg = cfg.replace(map=dataclasses.replace(cfg.map,
                                              dense_bf16=dense_bf16),
                      use_local_map=False)
    g = np.arange(-5.0, 5.0, 0.12, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    floor = np.stack([xx.ravel(), yy.ravel(),
                      np.full(xx.size, -1.0, np.float32)], -1)
    zz, yy2 = np.meshgrid(np.arange(-1.0, 1.6, 0.12, np.float32), g)
    wall = np.stack([np.full(zz.size, 4.8, np.float32),
                     yy2.ravel(), zz.ravel()], -1)
    pts = np.concatenate([floor, wall]).astype(np.float32)
    vm = vx.insert(vx.empty_map(cfg.map), jnp.asarray(pts),
                   jnp.ones(pts.shape[0], bool), cfg.map)
    rng = np.random.default_rng(11)
    q = pts[rng.choice(pts.shape[0], 300, replace=False)]
    q = q + rng.normal(0, 0.01, q.shape).astype(np.float32)
    return cfg, vm, q


def test_associate_planes_cached_blocks():
    """Gather-free re-association from cached StackBlocks: identical to a
    fresh gather at the caching pose, and equivalent to a fresh gather
    after an outer-round-scale pose correction (the reuse contract of
    estimate.py's round_fn/reassociate)."""
    from mmloam_tpu.estimator import factors

    cfg, vm, q = _plane_scene_map(dense_bf16=False)
    P0 = np.array([0.4, -0.2, 0.1], np.float32)
    x0 = jnp.asarray(np.concatenate([P0, np.zeros(3, np.float32)]))
    p_l = jnp.asarray(q - P0)
    mask = jnp.ones(q.shape[0], bool)
    I3, z3 = jnp.eye(3, dtype=x0.dtype), jnp.zeros(3, x0.dtype)

    pt0, om0, v0, blocks = factors.associate_planes(
        x0, p_l, mask, vm, I3, z3, cfg, 1.0, 0.0, with_blocks=True)
    # same pose, cached: bit-identical selection -> same fits
    pt0c, om0c, v0c = factors.associate_planes(
        x0, p_l, mask, vm, I3, z3, cfg, 1.0, 0.0, cached=blocks)
    np.testing.assert_array_equal(np.asarray(v0c), np.asarray(v0))
    np.testing.assert_allclose(np.asarray(pt0c.proj), np.asarray(pt0.proj),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(om0c), np.asarray(om0),
                               rtol=0, atol=1e-4)

    # outer-round-scale pose correction (mm): cached re-selection matches
    # a fresh gather except where the 3 mm stencil displacement crosses a
    # voxel boundary for a 5-NN member (rare at leaf 0.4)
    dx = np.array([3e-3, -2e-3, 1e-3, 2e-3, -1e-3, 1e-3], np.float32)
    x1 = x0 + jnp.asarray(dx)
    pt1c, _, v1c = factors.associate_planes(
        x1, p_l, mask, vm, I3, z3, cfg, 1.0, 0.0, cached=blocks)
    pt1f, _, v1f = factors.associate_planes(
        x1, p_l, mask, vm, I3, z3, cfg, 1.0, 0.0)
    v1c, v1f = np.asarray(v1c), np.asarray(v1f)
    agree = (v1c == v1f).mean()
    assert agree >= 0.95, agree
    both = v1c & v1f
    dproj = np.abs(np.asarray(pt1c.proj) - np.asarray(pt1f.proj))[both]
    frac_tight = (dproj.max(-1) < 1e-3).mean()
    assert frac_tight >= 0.95, frac_tight
    assert both.sum() > 0.5 * q.shape[0]


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
