"""Voxel-map tests: insert/centroid math, k-NN vs brute force, torus eviction."""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu.ops import voxelmap as vx
import pytest

CFG = tiny_config().map  # 64x64x32 cells, 0.4 m leaf


def ins(vm, pts, mask=None):
    pts = jnp.asarray(np.asarray(pts, np.float32))
    if mask is None:
        mask = jnp.ones(pts.shape[0], bool)
    return vx.insert(vm, pts, mask, CFG)


def test_insert_centroid():
    vm = vx.empty_map(CFG)
    # three points in one voxel [0,0.4)^3
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [0.2, 0.4 - 1e-3, 0.1]])
    vm = ins(vm, pts)
    nbr, valid, d2 = vx.query_knn(vm, jnp.asarray(pts[:1], jnp.float32),
                                  jnp.ones(1, bool), CFG)
    assert bool(valid[0, 0])
    np.testing.assert_allclose(np.array(nbr[0, 0]), pts.mean(0), atol=1e-5)
    # only one cell occupied
    assert int((np.array(vm.count) > 0).sum()) == 1
    assert float(vm.count.sum()) == 3.0


def test_masked_points_dropped():
    vm = vx.empty_map(CFG)
    pts = np.array([[0.1, 0.1, 0.1], [5.0, 5.0, 5.0]])
    vm = ins(vm, pts, jnp.array([True, False]))
    assert float(vm.count.sum()) == 1.0


@pytest.mark.smoke
def test_knn_matches_bruteforce():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (400, 3)).astype(np.float32)
    vm = ins(vx.empty_map(CFG), pts)
    cents, cvalid = vx.cell_centroids(vm, CFG)
    cents = np.array(cents)[np.array(cvalid)]
    q = rng.uniform(-4, 4, (30, 3)).astype(np.float32)
    nbr, valid, d2 = vx.query_knn(vm, jnp.asarray(q), jnp.ones(30, bool), CFG)
    nbr, valid, d2 = np.array(nbr), np.array(valid), np.array(d2)
    stencil_r = 0.4  # within one leaf of the query, the stencil is exhaustive
    for i in range(30):
        bf = np.sort(((cents - q[i]) ** 2).sum(-1))
        got = d2[i][valid[i]]
        # every brute-force neighbor within one leaf must be found, in order
        expect = bf[bf < stencil_r**2][: CFG.knn]
        np.testing.assert_allclose(got[: len(expect)], expect, rtol=1e-4)
        assert (np.diff(got) >= -1e-6).all(), "results sorted by distance"


def test_torus_eviction():
    vm = vx.empty_map(CFG)
    vm = ins(vm, np.array([[0.2, 0.2, 0.2]]))
    q = jnp.asarray(np.array([[0.2, 0.2, 0.2]], np.float32))
    _, valid, _ = vx.query_knn(vm, q, jnp.ones(1, bool), CFG)
    assert bool(valid[0, 0])
    # a point one torus period away in x aliases to the same slot
    period = CFG.dim_x * CFG.voxel_size
    far = np.array([[0.2 + period, 0.2, 0.2]], np.float32)
    vm2 = ins(vm, far)
    # old cell is evicted: query at origin finds nothing...
    _, valid0, _ = vx.query_knn(vm2, q, jnp.ones(1, bool), CFG)
    assert not bool(valid0.any())
    # ...and the new location answers correctly
    nbr, valid1, _ = vx.query_knn(vm2, jnp.asarray(far), jnp.ones(1, bool), CFG)
    assert bool(valid1[0, 0])
    np.testing.assert_allclose(np.array(nbr[0, 0]), far[0], atol=1e-4)
    # stale-aliased cell must NOT answer for the old coordinate even before
    # eviction: fresh map with only the far point
    vm3 = ins(vx.empty_map(CFG), far)
    _, valid2, _ = vx.query_knn(vm3, q, jnp.ones(1, bool), CFG)
    assert not bool(valid2.any())


def test_negative_coords():
    vm = vx.empty_map(CFG)
    pts = np.array([[-3.33, -7.77, -1.11]], np.float32)
    vm = ins(vm, pts)
    nbr, valid, d2 = vx.query_knn(vm, jnp.asarray(pts), jnp.ones(1, bool), CFG)
    assert bool(valid[0, 0]) and float(d2[0, 0]) < 1e-8


def test_shift_dense_blocks():
    """Cached dense candidate blocks re-expressed at a moved query equal a
    fresh gather while the query stays in its round-0 voxel (the exactness
    contract the estimator's gather-free outer-round re-association rests
    on — estimate.py reuses the round-0 StackBlocks across rounds)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, dense_bf16=False)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-5, 5, (600, 3)).astype(np.float32)
    vm = vx.insert(vx.empty_map(cfg), jnp.asarray(pts),
                   jnp.ones(pts.shape[0], bool), cfg)
    # queries at voxel centers: a |delta| < half-leaf move never crosses a
    # voxel boundary, so the fresh gather sees the identical stencil window
    M = 40
    q0 = (np.floor(rng.uniform(-4, 4, (M, 3)) / cfg.voxel_size)
          * cfg.voxel_size + 0.5 * cfg.voxel_size).astype(np.float32)
    mask = jnp.ones(M, bool)
    d0 = vx.query_candidates_dense(vm, jnp.asarray(q0), mask, cfg)

    # delta = 0: the shift is the identity (same f32 expressions)
    s0 = vx.shift_dense_blocks(d0, jnp.zeros((M, 3), jnp.float32), cfg)
    ok0 = np.isfinite(np.asarray(d0[3]))
    np.testing.assert_array_equal(np.isfinite(np.asarray(s0[3])), ok0)
    for a, b in zip(s0, d0):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a[ok0], b[ok0], rtol=0, atol=1e-6)

    # in-voxel move: matches a fresh dense query at the new position
    delta = rng.uniform(-0.15, 0.15, (M, 3)).astype(np.float32)
    s1 = vx.shift_dense_blocks(d0, jnp.asarray(delta), cfg)
    f1 = vx.query_candidates_dense(vm, jnp.asarray(q0 + delta), mask, cfg)
    ok1 = np.isfinite(np.asarray(f1[3]))
    np.testing.assert_array_equal(np.isfinite(np.asarray(s1[3])), ok1)
    for a, b in zip(s1, f1):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a[ok1], b[ok1], rtol=0, atol=1e-4)


def test_incremental_matches_batch():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    vm_a = ins(vx.empty_map(CFG), pts)
    vm_b = ins(ins(vx.empty_map(CFG), pts[:100]), pts[100:])
    np.testing.assert_allclose(np.array(vm_a.count), np.array(vm_b.count))
    np.testing.assert_allclose(np.array(vm_a.sum_rel), np.array(vm_b.sum_rel),
                               atol=1e-5)


def test_dedup_gather_equivalence():
    """dedup_gather=True (two-level unique-row gather) returns IDENTICAL
    candidate blocks to the baseline big-table gather when the compact
    capacity holds all unique superrows (clustered queries, the
    production pattern — ~5% unique at flagship shapes, BASELINE.md r5)."""
    import dataclasses

    rng = np.random.default_rng(3)
    pts = rng.uniform(-3, 3, (800, 3)).astype(np.float32)
    vm = ins(vx.empty_map(CFG), pts)
    q = jnp.asarray(rng.uniform(-2, 2, (128, 3)).astype(np.float32))
    mask = jnp.ones(128, bool)
    cfg_on = dataclasses.replace(CFG, dedup_gather=True, dedup_capacity=4)
    base = vx.query_candidates_dense(vm, q, mask, CFG)
    dd = vx.query_candidates_dense(vm, q, mask, cfg_on)
    for a, b in zip(base, dd):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_dedup_gather_overflow_drops_never_corrupts():
    """With a deliberately tiny compact capacity and SPREAD queries
    (unique rows >> capacity), overflow positions drop their candidates
    (d2 = inf) but every candidate the dedup path does return is
    bit-identical to the baseline — wrong data is impossible by
    construction (uid[rank] == id for rank < capacity)."""
    import dataclasses

    rng = np.random.default_rng(4)
    pts = rng.uniform(-17, 17, (2000, 3)).astype(np.float32)
    vm = ins(vx.empty_map(CFG), pts)
    q = jnp.asarray(rng.uniform(-16, 16, (128, 3)).astype(np.float32))
    mask = jnp.ones(128, bool)
    cfg_on = dataclasses.replace(CFG, dedup_gather=True, dedup_capacity=1)
    b_dx, b_dy, b_dz, b_d2 = [np.asarray(a, np.float32) for a in
                              vx.query_candidates_dense(vm, q, mask, CFG)]
    d_dx, d_dy, d_dz, d_d2 = [np.asarray(a, np.float32) for a in
                              vx.query_candidates_dense(vm, q, mask, cfg_on)]
    fin = np.isfinite(d_d2)
    assert fin.sum() > 0
    assert (~np.isfinite(b_d2[fin])).sum() == 0
    np.testing.assert_array_equal(d_d2[fin], b_d2[fin])
    np.testing.assert_array_equal(d_dx[fin], b_dx[fin])
    np.testing.assert_array_equal(d_dy[fin], b_dy[fin])
    np.testing.assert_array_equal(d_dz[fin], b_dz[fin])
    # and overflow actually happened (otherwise this test tests nothing)
    assert fin.sum() < np.isfinite(b_d2).sum()
