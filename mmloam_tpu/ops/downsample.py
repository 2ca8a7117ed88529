"""Masked voxel-grid downsample to fixed-capacity point stacks.

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

TPU cost model: scatters serialize per update (~7 ns each), so the cost is
(number of scatter passes) x (number of points), regardless of how few
points actually land.  `voxel_downsample_multi` therefore downsamples ALL
feature classes of one scan in exactly TWO scatter passes over the points
(one f32 add of [x y z 1], one s32 min of [pid, ~pid] — min of the
bit-complement is max), using a per-class slot offset into one shared
table; the per-class masks are disjoint (a point has one label), so each
point contributes to exactly one class.  Profiled on v5e at flagship
shapes this replaced 10 scatter passes per scan (~35 ms/step, the single
largest block in the step program) with 2.
"""

from __future__ import annotations

import jax.numpy as jnp

_I32_MAX = 2 ** 31 - 1


def voxel_downsample_multi(pts, masks, leaves, capacities, table: int = 8192):
    """Downsample disjoint point classes of one scan in 2 scatter passes.

    pts: (N, 3); masks: sequence of (N,) bool, mutually disjoint (a point
    belongs to at most one class); leaves/capacities: per-class leaf sizes
    and output stack capacities.  Returns a list of (out (capacity, 3),
    out_mask (capacity,), n ()) per class — identical per class to
    `voxel_downsample(pts, mask_c, leaf_c, capacity_c, table)`.
    """
    n_cls = len(masks)
    N = pts.shape[0]
    total = table * n_cls
    dtype = pts.dtype

    slot_all = jnp.full((N,), total, jnp.int32)    # default: out of bounds
    pid_all = jnp.zeros((N,), jnp.int32)
    any_m = jnp.zeros((N,), bool)
    for c, (mask, leaf) in enumerate(zip(masks, leaves)):
        v = jnp.floor(pts / leaf).astype(jnp.int32)
        # mix the three coordinates into a table slot (Fibonacci-ish hash)
        h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
        slot = (h & (table - 1)) + c * table
        # packed voxel id for collision rejection (see below)
        pid = (((v[:, 0] + 1024) << 20) | ((v[:, 1] + 1024) << 10)
               | (v[:, 2] + 1024))
        slot_all = jnp.where(mask, slot, slot_all)
        pid_all = jnp.where(mask, pid, pid_all)
        any_m = any_m | mask

    # pass 1: sums + count in one 4-wide scatter-add
    mf = any_m.astype(dtype)
    payload = jnp.concatenate([pts * mf[:, None], mf[:, None]], axis=-1)
    acc = jnp.zeros((total, 4), dtype).at[slot_all].add(payload, mode="drop")
    ssum, cnt = acc[:, 0:3], acc[:, 3]

    # pass 2: collision rejection.  Two DIFFERENT voxels hashing to one
    # slot would average into a phantom point between them (measured: ~2%
    # of a 2k-pt scan, and the phantoms cluster near the sensor where they
    # corrupt plane fits AND fake localizability in corridors).  Detect by
    # reducing the packed voxel id with min AND max in one scatter-min
    # (min of the bit-complement is the max): mismatched ids in one slot
    # -> drop the slot entirely (PCL's VoxelGrid, which this replaces, is
    # exact).
    pp = jnp.stack([jnp.where(any_m, pid_all, _I32_MAX),
                    jnp.where(any_m, ~pid_all, _I32_MAX)], axis=-1)
    pmin = jnp.full((total, 2), _I32_MAX, jnp.int32).at[slot_all].min(
        pp, mode="drop")
    pid_lo, pid_hi = pmin[:, 0], ~pmin[:, 1]

    occupied = (cnt > 0) & (pid_hi == pid_lo)
    centroid = ssum / jnp.maximum(cnt, 1.0)[:, None]

    outs = []
    for c, capacity in enumerate(capacities):
        occ = occupied[c * table:(c + 1) * table]
        cen = centroid[c * table:(c + 1) * table]
        pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
        out_idx = jnp.where(occ, pos, capacity)
        out = jnp.zeros((capacity, 3), dtype).at[out_idx].set(
            cen, mode="drop")
        n = jnp.sum(occ.astype(jnp.int32))
        outs.append((out, jnp.arange(capacity) < n, n))
    return outs


def voxel_downsample(pts, mask, leaf: float, capacity: int, table: int = 8192):
    """Downsample `pts (N,3)` with validity `mask (N,)` to <= `capacity` points.

    Returns (out (capacity,3), out_mask (capacity,), n ()).  If more than
    `capacity` unique voxels exist, the overflow is dropped (the reference
    has no cap; capacity must be sized generously — overflow is reported
    via n > capacity for callers that want to assert).
    """
    return voxel_downsample_multi(pts, [mask], [leaf], [capacity], table)[0]
