"""Unit tests for ops/downsample (voxel-grid stack downsampling).

The reference behavior being matched is PCL VoxelGrid per feature stack
(Estimator.cpp:76-80, :1012-1026): one centroid per occupied leaf.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mmloam_tpu.ops import downsample


def _ref_voxelgrid(pts, mask, leaf):
    """Exact per-voxel centroids (numpy oracle)."""
    pts = np.asarray(pts)[np.asarray(mask)]
    v = np.floor(pts / leaf).astype(np.int64)
    cents = {}
    for p, vi in zip(pts, map(tuple, v)):
        cents.setdefault(vi, []).append(p)
    return {k: np.mean(np.stack(ps), axis=0) for k, ps in cents.items()}


def _as_set(out, mask, decimals=4):
    out = np.asarray(out)[np.asarray(mask)]
    return {tuple(np.round(p, decimals)) for p in out}


@pytest.mark.smoke
def test_single_class_matches_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    mask = rng.uniform(size=500) < 0.8
    leaf = 0.4
    out, omask, n = downsample.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), leaf, 512)
    ref = _ref_voxelgrid(pts, mask, leaf)
    got = _as_set(out, omask)
    want = {tuple(np.round(c, 4)) for c in ref.values()}
    # the sort path keys on exact voxel coordinates — no collisions, so
    # the output is exactly the oracle's centroid set
    assert got == want
    assert int(n) == len(want)


def test_multi_matches_single_calls():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-8, 8, (2000, 3)).astype(np.float32))
    labels = rng.integers(0, 3, 2000)
    masks = [jnp.asarray(labels == 1), jnp.asarray(labels == 2)]
    leaves = [0.4, 0.2]
    caps = [256, 1024]
    multi = downsample.voxel_downsample_multi(pts, masks, leaves, caps)
    for (mo, mm, mn), mask, leaf, cap in zip(multi, masks, leaves, caps):
        so, sm, sn = downsample.voxel_downsample(pts, mask, leaf, cap)
        assert int(mn) == int(sn)
        assert np.array_equal(np.asarray(mm), np.asarray(sm))
        np.testing.assert_allclose(np.asarray(mo), np.asarray(so))


def test_masked_points_never_contribute():
    pts = jnp.asarray(np.array([[0.1, 0.1, 0.1], [1e6, 1e6, 1e6]],
                               np.float32))
    mask = jnp.asarray([True, False])
    out, omask, n = downsample.voxel_downsample(pts, mask, 0.4, 8)
    assert int(n) == 1
    np.testing.assert_allclose(np.asarray(out)[0], [0.1, 0.1, 0.1],
                               rtol=1e-6)


def test_distinct_voxels_never_averaged():
    """Two distinct voxels must yield two exact centroids, never a phantom
    average.  (The earlier scatter-table design could only guarantee this
    by DROPPING hash-colliding slots; the sort path keys on the exact
    voxel coordinates, so both must survive — `table` is ignored.)"""
    pts = jnp.asarray(np.array([[0.1, 0.0, 0.0], [3.0, 0.0, 0.0]],
                               np.float32))
    mask = jnp.asarray([True, True])
    out, omask, n = downsample.voxel_downsample(pts, mask, 0.4, 4, table=1)
    assert int(n) == 2
    got = {tuple(round(float(x), 4) for x in p)
           for p in _as_set(out, omask)}
    assert got == {(0.1, 0.0, 0.0), (3.0, 0.0, 0.0)}


def test_capacity_overflow_reports_n():
    rng = np.random.default_rng(2)
    # 200 well-separated points -> 200 unique voxels, capacity 64
    pts = jnp.asarray((np.arange(200)[:, None] * np.array([1.0, 0, 0])
                       ).astype(np.float32))
    mask = jnp.ones((200,), bool)
    out, omask, n = downsample.voxel_downsample(pts, mask, 0.4, 64)
    assert int(n) == 200          # true unique count reported
    assert int(np.asarray(omask).sum()) == 64
