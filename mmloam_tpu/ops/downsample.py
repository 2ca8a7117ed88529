"""Masked voxel-grid downsample to a fixed-capacity point stack.

Replaces the reference's per-frame PCL `VoxelGrid` downsampling of the
corner/surf/non-feature stacks (Estimator.cpp:76-80 leaf setup from
`filter_parameter_corner/surf`, :1012-1026 per-frame filtering) with a
fixed-shape sort-free scatter:

  * each valid point is hashed to a voxel slot in a scratch table sized
    `table` (power of two >= expected unique voxels),
  * per-slot centroid = scatter-add mean (PCL VoxelGrid semantics),
  * slots are compacted to the first `capacity` entries by prefix-sum.

Output order is slot order (deterministic); the reference's output order
(PCL's internal hash order) is likewise arbitrary, and nothing downstream
is order-sensitive.
"""

from __future__ import annotations

import jax.numpy as jnp


def voxel_downsample(pts, mask, leaf: float, capacity: int, table: int = 8192):
    """Downsample `pts (N,3)` with validity `mask (N,)` to <= `capacity` points.

    Returns (out (capacity,3), out_mask (capacity,), n ()).  If more than
    `capacity` unique voxels exist, the overflow is dropped (the reference
    has no cap; capacity must be sized generously — overflow is reported
    via n > capacity for callers that want to assert).
    """
    v = jnp.floor(pts / leaf).astype(jnp.int32)
    # mix the three coordinates into a table slot (Fibonacci-ish hashing)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
    slot = (h & (table - 1)).astype(jnp.int32)
    slot = jnp.where(mask, slot, table)  # masked points scatter out of bounds

    cnt = jnp.zeros((table,), pts.dtype).at[slot].add(
        mask.astype(pts.dtype), mode="drop")
    ssum = jnp.zeros((table, 3), pts.dtype).at[slot].add(
        pts * mask[:, None].astype(pts.dtype), mode="drop")
    # collision rejection: two DIFFERENT voxels hashing to one slot would
    # average into a phantom point between them (measured: ~2% of a 2k-pt
    # scan, and the phantoms cluster near the sensor where they corrupt
    # plane fits AND fake localizability in corridors).  Detect by also
    # reducing a packed voxel id with min and max: mismatched ids in one
    # slot -> drop the slot entirely (PCL's VoxelGrid, which this
    # replaces, is exact).
    pid = (((v[:, 0] + 1024) << 20) | ((v[:, 1] + 1024) << 10)
           | (v[:, 2] + 1024))
    pid_hi = jnp.full((table,), -2 ** 31, jnp.int32).at[slot].max(
        jnp.where(mask, pid, -2 ** 31), mode="drop")
    pid_lo = jnp.full((table,), 2 ** 31 - 1, jnp.int32).at[slot].min(
        jnp.where(mask, pid, 2 ** 31 - 1), mode="drop")
    occupied = (cnt > 0) & (pid_hi == pid_lo)
    centroid = ssum / jnp.maximum(cnt, 1.0)[:, None]

    # compact occupied slots into the first `capacity` rows
    pos = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    out_idx = jnp.where(occupied, pos, capacity)
    out = jnp.zeros((capacity, 3), pts.dtype).at[out_idx].set(
        centroid, mode="drop")
    n = jnp.sum(occupied.astype(jnp.int32))
    out_mask = jnp.arange(capacity) < n
    return out, out_mask, n
