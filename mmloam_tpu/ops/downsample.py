"""Masked voxel-grid downsample to fixed-capacity point stacks.

Replaces the reference's per-frame PCL `VoxelGrid` downsampling of the
corner/surf/non-feature stacks (Estimator.cpp:76-80 leaf setup from
`filter_parameter_corner/surf`, :1012-1026 per-frame filtering) with a
fixed-shape sort + segmented-scan (no scatters, no hash table):

  * every valid point gets a lexicographic (class, voxel) sort key built
    from its EXACT integer voxel coordinates — one multi-operand
    `lax.sort` groups points of the same voxel into contiguous segments
    (classes are the primary key, so each class's voxels also end up
    contiguous),
  * per-voxel centroid = segmented inclusive scan of [rel_x rel_y rel_z 1]
    read at segment ends (PCL VoxelGrid semantics, exact: the scan's
    combiner never mixes segments, and sums are voxel-corner-relative so
    every term is O(leaf)),
  * a second tiny sort compacts the segment-end centroids to the front in
    (class, voxel-key) order; per-class outputs are dynamic slices.

Output order is deterministic (voxel-key order); the reference's output
order (PCL's internal hash order) is likewise arbitrary, and nothing
downstream is order-sensitive.

TPU cost model: scatters serialize per update (~7-12 ns each, shape-driven
— masked-off updates still pay), so the previous scatter-table design cost
2 full passes x N points x ~12 ns regardless of occupancy, and its 8192-slot
hash dropped ~2% of voxels to birthday collisions.  The bitonic `lax.sort`
is a fused vector pipeline (~0.4 ms for 458k s32 keys measured on v5e), the
segmented scan is O(log N) vector passes, and there is no collision loss at
all — exact PCL semantics at ~5x less device time at flagship shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_I32_BIG = jnp.int32(2 ** 30)


def _seg_scan_sum(vals, starts):
    """Segmented INCLUSIVE prefix sum along axis 0.

    vals (N, K) f32, starts (N,) bool (True at each segment's first row).
    The combiner is the standard segmented-sum monoid — a combine whose
    right operand contains a segment start discards the left partial, so
    sums never cross segments (this also keeps f32 error at SEGMENT
    magnitude, not prefix magnitude).
    """
    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf[:, None], bv, av + bv), af | bf

    out, _ = jax.lax.associative_scan(comb, (vals, starts), axis=0)
    return out


def voxel_downsample_multi(pts, masks, leaves, capacities, table: int = 8192,
                           extra=None):
    """Downsample disjoint point classes of one scan in one sorted sweep.

    pts: (N, 3); masks: sequence of (N,) bool, mutually disjoint (a point
    belongs to at most one class); leaves/capacities: per-class leaf sizes
    and output stack capacities.  Returns a list of (out (capacity, 3),
    out_mask (capacity,), n ()) per class — identical per class to
    `voxel_downsample(pts, mask_c, leaf_c, capacity_c)`.  `table` is kept
    for API compatibility and ignored (the sort path has no hash table).

    `extra` (N,) optional per-point scalar payload (e.g. the intra-scan
    relative measurement time): voxel-MEAN-reduced alongside the centroid
    and returned as a 4th tuple element (capacity,) per class.

    Key packing: key1 = class * 2^27 + (v_x + 2^26)  (invalid -> 2^30,
    sorts last), key2 = (v_y + 2^15) << 16 | (v_z + 2^15) as a raw i32 bit
    pattern.  key2 is compared as a SIGNED int, which permutes the v_y
    order (bit 31 flips sign) — harmless: segmentation only needs a total
    order that groups equal voxels, and class/v_x remain the primary key,
    so per-class blocks stay contiguous for the output slices.

    Packing limits (silent wrap beyond them — distinct voxels would merge
    into a phantom averaged centroid): |v_y|, |v_z| < 2^15 and
    |v_x| < 2^26 voxel units (~6.5 km from the origin at the 0.2 m leaf,
    far beyond lidar range around any insert_guard-bounded trajectory),
    and at most 8 classes (class * 2^27 + 2^27 must stay below the 2^30
    invalid sentinel; asserted below).
    """
    n_cls = len(masks)
    assert n_cls <= 8, "key packing supports at most 8 classes"
    N = pts.shape[0]
    dtype = pts.dtype

    key1 = jnp.full((N,), _I32_BIG, jnp.int32)
    key2 = jnp.zeros((N,), jnp.int32)
    rel = jnp.zeros((N, 3), dtype)
    corner = jnp.zeros((N, 3), dtype)
    for c, (mask, leaf) in enumerate(zip(masks, leaves)):
        v = jnp.floor(pts / leaf).astype(jnp.int32)
        k1 = jnp.int32(c * (1 << 27)) + (v[:, 0] + (1 << 26))
        k2 = ((v[:, 1] + (1 << 15)) << 16) | (v[:, 2] + (1 << 15))
        key1 = jnp.where(mask, k1, key1)
        key2 = jnp.where(mask, k2, key2)
        cornr = v.astype(dtype) * leaf
        rel = jnp.where(mask[:, None], pts - cornr, rel)
        corner = jnp.where(mask[:, None], cornr, corner)

    ops = [key1, key2, rel[:, 0], rel[:, 1], rel[:, 2],
           corner[:, 0], corner[:, 1], corner[:, 2]]
    if extra is not None:
        ops.append(extra.astype(dtype))
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=2)
    k1s, k2s, rxs, rys, rzs, cxs, cys, czs = sorted_ops[:8]
    exs = sorted_ops[8] if extra is not None else None

    valid_s = k1s < _I32_BIG
    starts = jnp.concatenate(
        [jnp.ones((1,), bool),
         (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])])
    ends = jnp.concatenate(
        [(k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1]),
         jnp.ones((1,), bool)])
    cols = [rxs, rys, rzs]
    if exs is not None:
        cols.append(exs)
    pay = jnp.stack(cols + [jnp.ones((N,), dtype)], axis=-1)
    seg = _seg_scan_sum(pay, starts)

    ok_end = ends & valid_s
    cls_s = jnp.where(valid_s, k1s >> 27, n_cls)
    cnt = jnp.maximum(seg[:, -1:], 1.0)
    centroid = jnp.stack([cxs, cys, czs], axis=-1) + seg[:, 0:3] / cnt
    emean = seg[:, 3] / cnt[:, 0] if exs is not None else None

    # compact ok segment-ends to the front, preserving (class, voxel) order
    grank = jnp.cumsum(ok_end.astype(jnp.int32)) - 1
    key3 = jnp.where(ok_end, grank, _I32_BIG)
    sort_ops = [key3, centroid[:, 0], centroid[:, 1], centroid[:, 2]]
    if emean is not None:
        sort_ops.append(emean)
    sorted2 = jax.lax.sort(tuple(sort_ops), num_keys=1)
    ocx, ocy, ocz = sorted2[1:4]
    oce = sorted2[4] if emean is not None else None

    max_cap = max(capacities)
    padz = jnp.zeros((max_cap,), dtype)
    ocx = jnp.concatenate([ocx, padz])
    ocy = jnp.concatenate([ocy, padz])
    ocz = jnp.concatenate([ocz, padz])
    if oce is not None:
        oce = jnp.concatenate([oce, padz])

    okf = ok_end.astype(jnp.int32)
    outs = []
    for c, capacity in enumerate(capacities):
        n_before = jnp.sum(okf * (cls_s < c))
        n = jnp.sum(okf * (cls_s == c))
        sl = lambda a: jax.lax.dynamic_slice(a, (n_before,), (capacity,))
        out_mask = jnp.arange(capacity) < n
        out = jnp.where(out_mask[:, None],
                        jnp.stack([sl(ocx), sl(ocy), sl(ocz)], axis=-1), 0.0)
        if oce is not None:
            outs.append((out, out_mask, n, jnp.where(out_mask, sl(oce), 0.0)))
        else:
            outs.append((out, out_mask, n))
    return outs


def voxel_downsample(pts, mask, leaf: float, capacity: int, table: int = 8192):
    """Downsample `pts (N,3)` with validity `mask (N,)` to <= `capacity` points.

    Returns (out (capacity,3), out_mask (capacity,), n_voxels ()).  One
    centroid per occupied voxel, like PCL VoxelGrid (which has no cap;
    capacity must be sized generously — overflow is reported via
    n > capacity for callers that want to assert).
    """
    return voxel_downsample_multi(pts, [mask], [leaf], [capacity], table)[0]
