"""The factors-level kernel dispatch path == the XLA association path.

tests/test_pallas_assoc.py verifies the kernel against the raw XLA
primitives; THIS file verifies the integration layer the pipeline actually
calls — factors._plane_from_kernel / _line_from_kernel and their gates —
by monkeypatching the backend dispatch on CPU (interpret mode).
"""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu.estimator import factors
from tests.test_pallas_assoc import _build, _queries
import pytest


def _run_both(monkeypatch, assoc_fn, *args, **kwargs):
    outs = {}
    for use_kernel in (False, True):
        monkeypatch.setattr(factors, "_kernel_ok",
                            lambda mcfg, m, u=use_kernel: u)
        outs[use_kernel] = assoc_fn(*args, **kwargs)
    return outs[False], outs[True]


@pytest.mark.smoke
def test_plane_dispatch_matches(monkeypatch):
    cfg, vm, world, rng = _build()
    pw, mask = _queries(world, rng, M=256)
    x6 = jnp.zeros(6, jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    # pw are world points; with identity pose p_l == pw
    (pt_x, om_x, nv_x), (pt_k, om_k, nv_k) = _run_both(
        monkeypatch, factors.associate_planes, x6, pw, mask, vm, I3, z3,
        cfg, 1.0, 0.0)
    vx_, vk = np.asarray(pt_x.valid), np.asarray(pt_k.valid)
    agree = (vx_ == vk).mean()
    assert agree > 0.97, agree           # gate flips only on fit-noise edge
    both = vx_ & vk
    assert both.sum() > 50
    np.testing.assert_allclose(np.asarray(pt_x.proj)[both],
                               np.asarray(pt_k.proj)[both],
                               rtol=1e-3, atol=1e-4)
    dots = np.abs(np.sum(np.asarray(om_x)[both] * np.asarray(om_k)[both],
                         axis=-1))
    assert (dots > 0.995).mean() > 0.97, dots.min()


def test_line_dispatch_matches(monkeypatch):
    cfg, vm, world, rng = _build(seed=5)
    pw, mask = _queries(world, rng, M=256, origin=(0.3, -0.4, 0.0))
    x6 = jnp.zeros(6, jnp.float32)
    I3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    lt_x, lt_k = _run_both(
        monkeypatch, factors.associate_lines, x6, pw, mask, vm, I3, z3,
        cfg, 1.0)
    vx_, vk = np.asarray(lt_x.valid), np.asarray(lt_k.valid)
    assert (vx_ == vk).mean() > 0.97
    both = vx_ & vk
    if both.sum():
        np.testing.assert_allclose(np.asarray(lt_x.c)[both],
                                   np.asarray(lt_k.c)[both],
                                   rtol=1e-3, atol=1e-4)
        dots = np.abs(np.sum(np.asarray(lt_x.u)[both]
                             * np.asarray(lt_k.u)[both], axis=-1))
        assert (dots > 0.995).mean() > 0.95


def test_dual_dispatch_matches(monkeypatch):
    """associate_planes with vm_local: the single-launch dual kernel path
    == the XLA global+local fallback path."""
    from mmloam_tpu.ops import voxelmap as vx

    cfg, vm, world, rng = _build(seed=2, n_scans=2)
    vm_l = vx.empty_map(cfg.local_map)
    az = np.linspace(-np.pi, np.pi, 720, endpoint=False)
    elevs = np.deg2rad([-12.0, -4.0, 4.0, 12.0])
    A, E = np.meshgrid(az, elevs)
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], -1).reshape(-1, 3)
    for i in range(3):
        o = np.array([0.3 * i, 0.1 * i, 0.0])
        r = world.raycast(o, dirs)
        ok = np.isfinite(r)
        pts = o + dirs * np.where(ok, r, 0.0)[:, None]
        vm_l = vx.insert(vm_l, jnp.asarray(pts, jnp.float32),
                         jnp.asarray(ok), cfg.local_map)
    pw, mask = _queries(world, rng, M=256)
    x6 = jnp.zeros(6, jnp.float32)
    I3, z3 = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)

    (pt_x, om_x, _), (pt_k, om_k, _) = _run_both(
        monkeypatch, factors.associate_planes, x6, pw, mask, vm, I3, z3,
        cfg, 1.0, 0.0, vm_local=vm_l)
    vx_, vk = np.asarray(pt_x.valid), np.asarray(pt_k.valid)
    assert (vx_ == vk).mean() > 0.97
    both = vx_ & vk
    assert both.sum() > 50
    np.testing.assert_allclose(np.asarray(pt_x.proj)[both],
                               np.asarray(pt_k.proj)[both],
                               rtol=1e-3, atol=2e-4)

    lt_x, lt_k = _run_both(
        monkeypatch, factors.associate_lines, x6, pw, mask, vm, I3, z3,
        cfg, 1.0, vm_local=vm_l)
    vx_, vk = np.asarray(lt_x.valid), np.asarray(lt_k.valid)
    assert (vx_ == vk).mean() > 0.96, (vx_ == vk).mean()
