"""Archived Pallas association kernel == the XLA association path.

The kernel family lives in scripts/pallas_assoc.py (archived round 4: the
pure-XLA association engine measured faster end-to-end on v5e, see
PARITY.md).  This single interpret-mode equivalence test keeps the
archived single-tier kernel honest as a reference implementation: its
per-point selection (t_k, n), moments (mu) and fits (plane normal / line
direction + gates) must match what `voxelmap.query_candidates` +
`select_k_smallest` + the production fit math produce.
"""

import importlib.util
import pathlib

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
from mmloam_tpu.ops import linalg3, voxelmap as vx

_SPEC = importlib.util.spec_from_file_location(
    "pallas_assoc_archive",
    pathlib.Path(__file__).resolve().parent.parent / "scripts"
    / "pallas_assoc.py")
pallas_assoc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pallas_assoc)


def _build(seed=0, n_scans=4):
    cfg = tiny_config()
    rng = np.random.default_rng(seed)
    world = synthetic.default_world()
    vm = vx.empty_map(cfg.map)
    az = np.linspace(-np.pi, np.pi, 720, endpoint=False)
    elevs = np.deg2rad([-15.0, -5.0, 5.0, 15.0])
    A, E = np.meshgrid(az, elevs)
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], -1).reshape(-1, 3)
    for i in range(n_scans):
        o = np.array([0.4 * i, 0.2 * i, 0.1 * np.sin(i)])
        r = world.raycast(o, dirs)
        ok = np.isfinite(r)
        r = r + rng.normal(scale=0.004, size=r.shape)
        pts = o + dirs * np.where(ok, r, 0.0)[:, None]
        vm = vx.insert(vm, jnp.asarray(pts, jnp.float32), jnp.asarray(ok),
                       cfg.map)
    return cfg, vm, world, rng


def _queries(world, rng, M=256, origin=(0.9, 0.5, 0.05)):
    az = rng.uniform(-np.pi, np.pi, M)
    el = rng.uniform(-0.3, 0.3, M)
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], -1)
    o = np.asarray(origin)
    r = world.raycast(o, dirs)
    ok = np.isfinite(r)
    pw = o + dirs * np.where(ok, r, 0.0)[:, None]
    # a few poisoned + masked entries
    ok[:3] = False
    pw[1] = np.nan
    return jnp.asarray(pw, jnp.float32), jnp.asarray(ok)


def _xla_reference(vm, pw, mask, cfg, k):
    dx, dy, dz, d2, ok = vx.query_candidates(vm, pw, mask, cfg.map)
    t_k, n, w = vx.select_k_smallest(d2, ok, k)
    wf = w.astype(jnp.float32)
    red = lambda a: jnp.sum(a * wf, axis=(1, 2))
    s1 = jnp.stack([red(dx), red(dy), red(dz)], axis=-1)
    s2 = jnp.stack([red(dx * dx), red(dx * dy), red(dx * dz),
                    red(dy * dy), red(dy * dz), red(dz * dz)], axis=-1)
    return t_k, n, s1, s2, (dx, dy, dz, w)


def _sym3(s2m):
    S = np.zeros((len(s2m), 3, 3), np.float32)
    S[:, 0, 0], S[:, 0, 1], S[:, 0, 2] = s2m[:, 0], s2m[:, 1], s2m[:, 2]
    S[:, 1, 0], S[:, 1, 1], S[:, 1, 2] = s2m[:, 1], s2m[:, 3], s2m[:, 4]
    S[:, 2, 0], S[:, 2, 1], S[:, 2, 2] = s2m[:, 2], s2m[:, 4], s2m[:, 5]
    return S


def test_archived_kernel_matches_xla():
    """Plane AND line mode of the archived kernel vs the XLA pipeline."""
    # ---- plane mode ----
    cfg, vm, world, rng = _build()
    pw, mask = _queries(world, rng)
    k = cfg.map.knn

    mu, vec, valid, t_k, n = pallas_assoc.assoc_batched(
        vm.cells[None], pw[None], mask[None], jnp.float32(1.0), cfg.map,
        mode=0, k=k, scatter_ratio=cfg.solver.plane_scatter_ratio,
        interpret=True)
    mu, vec, valid = mu[0], vec[0], valid[0]
    t_k, n = t_k[0], n[0]

    t_r, n_r, s1_r, s2_r, blk = _xla_reference(vm, pw, mask, cfg, k)
    t_r, n_r = np.asarray(t_r), np.asarray(n_r)
    have = (n_r >= k) & (t_r < 1.0) & np.asarray(mask)
    assert have.sum() > 50, have.sum()

    np.testing.assert_array_equal(np.asarray(n)[have], n_r[have])
    np.testing.assert_allclose(np.asarray(t_k)[have], t_r[have],
                               rtol=1e-5, atol=1e-7)
    nf = np.maximum(n_r, 1.0)
    mu_r = np.asarray(s1_r) / nf[:, None]
    np.testing.assert_allclose(np.asarray(mu)[have], mu_r[have],
                               rtol=1e-4, atol=1e-5)

    scov = _sym3(np.asarray(s2_r)) \
        - nf[:, None, None] * mu_r[:, :, None] * mu_r[:, None, :]
    ev_r = np.asarray(linalg3.eigvalsh3(jnp.asarray(scov)))
    om_r = np.asarray(linalg3.smallest_eigvec3(jnp.asarray(scov),
                                               jnp.asarray(ev_r)))
    cond = have & ((ev_r[:, 1] - ev_r[:, 0]) > 0.1 * ev_r[:, 2])
    assert cond.sum() > 40, cond.sum()
    dots = np.abs(np.sum(np.asarray(vec)[cond] * om_r[cond], axis=-1))
    assert (dots > 0.999).all(), dots.min()

    dx, dy, dz, w = blk
    dev = ((np.asarray(dx) - mu_r[:, 0, None, None]) * om_r[:, 0, None, None]
           + (np.asarray(dy) - mu_r[:, 1, None, None]) * om_r[:, 1, None, None]
           + (np.asarray(dz) - mu_r[:, 2, None, None]) * om_r[:, 2, None, None])
    planar_r = np.all(np.where(np.asarray(w), np.abs(dev) <= 0.2, True),
                      axis=(1, 2))
    sr = cfg.solver.plane_scatter_ratio
    scatter_r = ev_r[:, 1] > sr * ev_r[:, 2] if sr > 0 else True
    dist_r = -np.sum(om_r * mu_r, axis=-1)
    valid_r = (have & planar_r & scatter_r & (np.abs(dist_r) > 1e-5)
               & np.asarray(mask))
    agree = (np.asarray(valid)[cond] == valid_r[cond])
    assert agree.mean() > 0.98, agree.mean()

    # ---- line mode ----
    cfg, vm, world, rng = _build(seed=5)
    pw, mask = _queries(world, rng, origin=(0.3, -0.4, 0.0))

    mu, vec, valid, t_k, n = pallas_assoc.assoc_batched(
        vm.cells[None], pw[None], mask[None], jnp.float32(1.0), cfg.map,
        mode=1, k=k, interpret=True)
    mu, vec, valid, t_k, n = mu[0], vec[0], valid[0], t_k[0], n[0]

    t_r, n_r, s1_r, s2_r, _ = _xla_reference(vm, pw, mask, cfg, k)
    t_r, n_r = np.asarray(t_r), np.asarray(n_r)
    have = (n_r >= k) & (t_r < 1.0) & np.asarray(mask)
    assert have.sum() > 50

    np.testing.assert_array_equal(np.asarray(n)[have], n_r[have])
    nf = np.maximum(n_r, 1.0)
    mu_r = np.asarray(s1_r) / nf[:, None]
    cov = _sym3(np.asarray(s2_r)) / nf[:, None, None] \
        - mu_r[:, :, None] * mu_r[:, None, :]
    ev_r = np.asarray(linalg3.eigvalsh3(jnp.asarray(cov)))
    line_like = ev_r[:, 2] > 3.0 * ev_r[:, 1]
    u_r = np.asarray(linalg3.principal_eigvec3(jnp.asarray(cov),
                                               jnp.asarray(ev_r)))
    sel = have & line_like
    if sel.sum():
        dots = np.abs(np.sum(np.asarray(vec)[sel] * u_r[sel], axis=-1))
        assert (dots > 0.999).mean() > 0.95, dots.min()
    v_np = np.asarray(valid)
    assert ((~line_like[have]) <= (~v_np[have])).all()
