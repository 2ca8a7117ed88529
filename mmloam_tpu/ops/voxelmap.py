"""Torus voxel-grid map: fixed-shape scatter insert + stencil k-NN gather.

TPU-native replacement for the reference's global map (Map_Manager.cpp):
a 21x11x21 grid of 50 m cubes, each holding a point cloud that is
voxel-grid downsampled past 300 points and indexed by a per-cube KD-tree
(Map_Manager.h:117-120, Map_Manager.cpp:125-286), with `MapMove` scrolling
the grid to keep the pose away from the edge (:288-581) and `nearestKSearch`
5-NN queries during factor building (Estimator.cpp:160,380,585).

Design here (no trees, no scrolling copies):
  * One cell per `voxel_size` leaf — equivalent to the reference's
    VoxelGrid-downsampled map at the same leaf, since a downsampled cloud
    has exactly one point (the centroid) per leaf.
  * Cells are addressed modulo the grid dims (a 3-D torus).  Two voxels
    collide only when they are `dim * voxel_size` apart (~100 m at the
    defaults), far beyond matching range; the cell stores its true voxel
    coordinate's per-axis period quotient, so stale cells from a previous
    pass of the torus are detected at query time and overwritten at insert
    time.  This reproduces `MapMove`'s drop-far-cubes semantics with zero
    data movement.
  * The per-cell payload lives in ONE (C, 8) f32 row
    [sum_x, sum_y, sum_z, count, key, pad...]: the k-NN stencil gather
    fetches one vector-width row per candidate cell instead of several
    scalar gathers (random gathers run on the TPU sparse core / scalar
    path, so bytes-per-index is the throughput lever).  The key is the
    packed quotient, biased into [0, 2^18) so it is exact in f32
    (empty = -1); coverage is +-32 torus periods (~3 km at defaults) before
    quotients saturate.
  * Insert is a masked scatter-add of (point - voxel corner, 1); centroids
    are reconstructed as `corner + sum/count`.  Corner-relative sums keep
    f32 exact regardless of world coordinates.

The reference's triple-buffered map snapshots (Map_Manager.cpp:132-146,
Estimator.cpp:1170-1184) existed to let matching run against a consistent
map while a background thread appends; a pure-functional map value makes
that machinery unnecessary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EMPTY_KEY = -1.0
_PAY = 8       # payload floats per cell


class VoxelMap(NamedTuple):
    """One feature class's map (corner, surf, or non-feature)."""

    cells: jnp.ndarray   # (C, 8) f32 rows [sum_xyz, count, key, pad]

    @property
    def sum_rel(self):
        return self.cells[:, 0:3]

    @property
    def count(self):
        return self.cells[:, 3]

    @property
    def key(self):
        return self.cells[:, 4]


def empty_map(cfg) -> VoxelMap:
    c = cfg.dim_x * cfg.dim_y * cfg.dim_z
    cells = jnp.zeros((c, _PAY), jnp.float32).at[:, 4].set(_EMPTY_KEY)
    return VoxelMap(cells=cells)


def _voxel_coords(pts, cfg):
    """Integer voxel coordinates (floor) of points."""
    return jnp.floor(pts / cfg.voxel_size).astype(jnp.int32)


def _slot_and_key(v, cfg):
    """Torus slot index and packed-quotient key (exact in f32) for voxel
    coords v (..., 3)."""
    dx, dy, dz = cfg.dim_x, cfg.dim_y, cfg.dim_z
    mx, my, mz = v[..., 0] % dx, v[..., 1] % dy, v[..., 2] % dz
    slot = (mx * dy + my) * dz + mz
    qx = jnp.clip((v[..., 0] - mx) // dx + 32, 0, 63)
    qy = jnp.clip((v[..., 1] - my) // dy + 32, 0, 63)
    qz = jnp.clip((v[..., 2] - mz) // dz + 32, 0, 63)
    key = ((qx << 12) | (qy << 6) | qz).astype(jnp.float32)
    return slot, key


def insert(vm: VoxelMap, pts, mask, cfg) -> VoxelMap:
    """Masked scatter of world-frame points into the map.

    Cells whose stored key differs from the incoming one (stale aliases
    from a previous torus pass, or empty) are reset before accumulation —
    the MapMove-equivalent eviction.  Within one batch all points hitting
    a slot share a key (they would have to be a torus period apart to
    differ, beyond lidar range), so the reset scatter is idempotent.
    """
    pts = pts.astype(vm.cells.dtype)
    v = _voxel_coords(pts, cfg)
    slot, key = _slot_and_key(v, cfg)
    c = vm.cells.shape[0]
    maskf = mask.astype(vm.cells.dtype)
    # masked-out points scatter out of bounds and are dropped
    slot = jnp.where(mask, slot, c)

    stored_key = vm.cells.at[slot, 4].get(mode="fill", fill_value=_EMPTY_KEY)
    stale = (stored_key != key) & mask
    reset_slot = jnp.where(stale, slot, c)
    cells = vm.cells.at[reset_slot].set(0.0, mode="drop")
    cells = cells.at[slot, 4].set(key, mode="drop")

    rel = pts - v.astype(pts.dtype) * cfg.voxel_size
    payload = jnp.concatenate(
        [rel * maskf[:, None], maskf[:, None],
         jnp.zeros((pts.shape[0], _PAY - 4), pts.dtype)], axis=-1)
    cells = cells.at[slot].add(payload, mode="drop")
    return VoxelMap(cells=cells)


def insert_guard(pts, center, cfg):
    """Mask of points safe to insert: within half a torus period of
    `center` on every axis.  Inserting beyond would alias onto (and evict)
    valid cells near the robot — the reference's scrolling grid drops
    far cubes the same way (MapMove keeps the pose >=8 cubes from the edge,
    Map_Manager.cpp:288-581)."""
    lim = jnp.asarray([cfg.dim_x, cfg.dim_y, cfg.dim_z],
                      pts.dtype) * (0.48 * cfg.voxel_size)
    return jnp.all(jnp.abs(pts - center[None, :]) < lim[None, :], axis=-1)


def _stencil_offsets(cfg):
    sx, sy, sz = cfg.stencil_x, cfg.stencil_y, cfg.stencil_z
    ox, oy, oz = jnp.meshgrid(
        jnp.arange(-sx, sx + 1), jnp.arange(-sy, sy + 1),
        jnp.arange(-sz, sz + 1), indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)  # (S,3)


def query_knn(vm: VoxelMap, q, mask, cfg):
    """k nearest map centroids for each query point.

    q: (M, 3) world-frame queries, mask: (M,) validity.
    Returns (neighbors (M,K,3), valid (M,K) bool, dist2 (M,K)) with
    neighbors sorted by ascending distance; invalid entries have dist2=inf.
    Replaces `nearestKSearch(5)` over the matched cube's KD-tree.
    """
    off = _stencil_offsets(cfg).astype(jnp.int32)          # (S,3)
    v = _voxel_coords(q, cfg)                              # (M,3)
    cells = v[:, None, :] + off[None, :, :]                # (M,S,3)
    slot, key = _slot_and_key(cells, cfg)                  # (M,S)
    rows = vm.cells[slot]                                  # (M,S,8) one gather
    cnt = rows[..., 3]
    ok = (rows[..., 4] == key) & (cnt > 0) & mask[:, None]
    corner = cells.astype(q.dtype) * cfg.voxel_size
    centroid = corner + rows[..., 0:3] / jnp.maximum(cnt, 1.0)[..., None]
    d2 = jnp.sum((q[:, None, :] - centroid) ** 2, axis=-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, cfg.knn)                 # (M,K)
    nbr = jnp.take_along_axis(centroid, idx[..., None], axis=1)
    valid = jnp.take_along_axis(ok, idx, axis=1)
    return nbr, valid, -neg


def cell_centroids(vm: VoxelMap, cfg):
    """All valid cell centroids — for map export / visualization.

    Returns (C,3) centroids and a (C,) validity mask; the voxel corner is
    reconstructed from the slot index and the packed quotient key.
    """
    dx, dy, dz = cfg.dim_x, cfg.dim_y, cfg.dim_z
    c = dx * dy * dz
    idx = jnp.arange(c, dtype=jnp.int32)
    mz = idx % dz
    my = (idx // dz) % dy
    mx = idx // (dz * dy)
    keyi = vm.cells[:, 4].astype(jnp.int32)
    qz = (keyi & 63) - 32
    qy = ((keyi >> 6) & 63) - 32
    qx = ((keyi >> 12) & 63) - 32
    v = jnp.stack([qx * dx + mx, qy * dy + my, qz * dz + mz], axis=-1)
    cnt = vm.cells[:, 3]
    valid = (vm.cells[:, 4] >= 0) & (cnt > 0)
    centroid = (v.astype(jnp.float32) * cfg.voxel_size
                + vm.cells[:, 0:3] / jnp.maximum(cnt, 1.0)[:, None])
    return centroid, valid
