"""Pallas insert kernel == XLA voxelmap.insert (interpreter mode on CPU).

The TPU replay driver applies map insertions through
ops/pallas_insert.insert_batched; any semantic drift from voxelmap.insert
(the XLA path the rest of the suite exercises) would corrupt the map
silently, so equivalence is asserted here — including stale-key eviction
and count capping.  Small shapes: the Pallas interpreter executes the DMA
loops op-by-op.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mmloam_tpu.config import MapConfig
from mmloam_tpu.ops import pallas_insert, voxelmap

MCFG = MapConfig(dim_x=16, dim_y=16, dim_z=8, voxel_size=0.4, count_cap=10.0)


def _xla(cells, pts, mask):
    return jax.vmap(lambda c, p, m: voxelmap.insert(
        voxelmap.VoxelMap(c), p, m, MCFG).cells)(cells, pts, mask)


def test_insert_batched_matches_xla():
    B, N = 2, 128
    rng = np.random.default_rng(0)
    span = 8 * 0.4 * 0.45
    pts = rng.uniform(-span, span, (B, N, 3)).astype(np.float32)
    mask = jnp.asarray(rng.random((B, N)) > 0.15)
    cells0 = jnp.stack([voxelmap.empty_map(MCFG).cells] * B)

    # two consecutive batches: second exercises accumulate-into-existing
    # and the count cap (cap 10 with repeated hits)
    c_ref = _xla(cells0, jnp.asarray(pts), mask)
    c_ref = _xla(c_ref, jnp.asarray(pts * 0.98), mask)

    c_pal = pallas_insert.insert_batched(cells0, jnp.asarray(pts), mask,
                                         MCFG, interpret=True)
    c_pal = pallas_insert.insert_batched(c_pal, jnp.asarray(pts * 0.98),
                                         mask, MCFG, interpret=True)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               atol=1e-4)


def test_insert_batched_evicts_stale_epochs():
    """Points a full torus period away must evict the old cells (MapMove)."""
    B, N = 1, 128
    period = np.array([MCFG.dim_x, MCFG.dim_y, MCFG.dim_z]) * MCFG.voxel_size
    pts0 = np.tile(np.array([[0.5, 0.5, 0.5]], np.float32), (N, 1))[None]
    pts1 = (pts0 + period.astype(np.float32)[None, None, :])
    mask = jnp.ones((B, N), bool)
    cells0 = jnp.stack([voxelmap.empty_map(MCFG).cells] * B)

    c_ref = _xla(cells0, jnp.asarray(pts0), mask)
    c_ref = _xla(c_ref, jnp.asarray(pts1), mask)
    c_pal = pallas_insert.insert_batched(cells0, jnp.asarray(pts0), mask,
                                         MCFG, interpret=True)
    c_pal = pallas_insert.insert_batched(c_pal, jnp.asarray(pts1), mask,
                                         MCFG, interpret=True)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               atol=1e-4)
    # the aliasing cell now carries the NEW epoch's key
    vm = voxelmap.VoxelMap(c_pal[0])
    q = jnp.asarray(pts1[0, :1])
    _, _, d2 = voxelmap.query_knn(vm, q, jnp.ones(1, bool), MCFG)
    assert np.isfinite(np.asarray(d2[0, 0]))
