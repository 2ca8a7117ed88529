"""Pallas TPU kernel: batched voxel-map insertion (row-RMW by DMA).

Why this exists: the XLA lowering of the map-insert scatters is the single
most expensive block of the flagship step program.  `jnp.ndarray.at[...]`
scatters serialize at ~1.7 us per scatter ITEM on TPU (shape-driven — the
cost is paid even when the move gate masks every update), and `vmap` of a
scatter can additionally lower to a per-batch-element loop that
dynamic-slices and rewrites the ENTIRE 64 MB map array per sequence
(measured: ~1.1 s of a 3.4 s 20-scan batched replay).

This kernel replaces all of that with direct row DMA:

  1. (XLA, vectorized) points are bucketed to cells, sorted by superrow,
     and aggregated into per-unique-row 128-lane update vectors via a
     cumsative-sum/segment-difference (no scatter anywhere);
  2. (Pallas) a grid over (batch, row-groups) DMAs each touched 512-byte
     row HBM->VMEM, applies the eviction/accumulate/cap logic vectorized
     over the group's (G, 128) block, and DMAs the rows back.  Rows within
     one insert are unique by construction, so group pipelining cannot
     read-modify-write conflict; padding entries point at row 0 with a
     zero update (RMW no-op).

Cell/row semantics are identical to voxelmap.insert (stale-key eviction ==
MapMove, count capping by sum rescale — Map_Manager.cpp:125-286); a
shared unit test asserts bit-level-equivalent maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import voxelmap

_META_MOD = voxelmap._META_MOD
G = 128          # rows RMW'd per grid step


def aggregate_updates(pts, mask, cfg):
    """Bucket + sort + segment-aggregate points into per-row updates.

    pts: (B, N, 3) world points, mask: (B, N).  Returns
    (row_slot (B, N) int32, row_key (B, N) f32, row_upd (B, N, 128) f32,
    row_valid (B, N) bool): entry u is the u-th UNIQUE touched superrow
    of that batch element (invalid entries: slot 0, zero update).
    The 128-lane update is [sum_x(32) | sum_y(32) | sum_z(32) | cnt(32)]
    with sums relative to each cell's fine-voxel corner — exactly the
    accumulation voxelmap.insert applies.
    """
    B, N = pts.shape[:2]
    dtype = pts.dtype
    cpr = voxelmap._cpr(cfg)
    assert cpr == 32, "kernel assumes 32 cells per 128-lane row"

    def one(p, m):
        v = voxelmap._voxel_coords(p, cfg)
        slot, sub, key = voxelmap._cell_addr(v, cfg)
        big = jnp.int32(2 ** 30)
        slot_m = jnp.where(m, slot, big)
        # ONE multi-operand sort carries every payload column through the
        # bitonic network; the previous argsort + five x[order] gathers
        # paid ~10 ns PER ELEMENT on the minor-dim index (measured
        # ~0.8 ms/exec each at flagship shapes, scripts/fusion_bw.py r5)
        rel0 = p - v.astype(dtype) * cfg.voxel_size
        slot_s, sub_s, key_s, m_i, rel_x, rel_y, rel_z = jax.lax.sort(
            (slot_m, sub, key, m.astype(jnp.int32),
             rel0[:, 0], rel0[:, 1], rel0[:, 2]), num_keys=1)
        m_s = m_i.astype(bool)
        rel = jnp.stack([rel_x, rel_y, rel_z], axis=-1)
        mf = m_s.astype(dtype)

        lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        sub_b = sub_s[:, None]
        pay = (jnp.where(lane == sub_b, rel[:, 0:1] * mf[:, None], 0.0)
               + jnp.where(lane == sub_b + 32, rel[:, 1:2] * mf[:, None], 0.0)
               + jnp.where(lane == sub_b + 64, rel[:, 2:3] * mf[:, None], 0.0)
               + jnp.where(lane == sub_b + 96, mf[:, None], 0.0))

        start = jnp.concatenate([jnp.ones((1,), bool),
                                 slot_s[1:] != slot_s[:-1]])
        is_end = jnp.concatenate([slot_s[1:] != slot_s[:-1],
                                  jnp.ones((1,), bool)])
        # segmented inclusive scan (same monoid as downsample): at each
        # segment's END row this is exactly the segment sum.  Replaces a
        # global cumsum + a per-row gather of cum[segment_start - 1]
        # (~2.4 ms/exec unattributed fusion, scripts/fusion_bw.py r5);
        # also keeps f32 error at segment magnitude, not prefix magnitude
        from .downsample import _seg_scan_sum
        seg_sum_at_end = _seg_scan_sum(pay, start)
        # NOTE: insert_batched compacts valid entries to the front (its
        # argsort keys invalids last) and sizes the kernel's group loop by
        # ceil(n_valid / G) — that dynamic bound is only correct because
        # valids are front-packed before the kernel runs
        end_ok = is_end & m_s
        vf = end_ok.astype(dtype)
        row_upd = seg_sum_at_end * vf[:, None]
        row_slot = jnp.where(end_ok, slot_s, 0)
        row_key = jnp.where(end_ok, key_s, 0.0)
        return row_slot, row_key, row_upd, end_ok

    return jax.vmap(one)(pts, mask)


def _rmw_kernel(nv_ref, slot_ref, vld_ref, key_ref, upd_ref, cells_ref,
                out_ref, scratch, sems, *, cap, n_groups, seed_copy):
    """One grid step: RMW one batch element's touched rows, G at a time.

    nv_ref: (B, 1) SMEM (full array, indexed by program_id) — count of
    valid (compacted-to-front) entries;
    the group loop bound is ceil(nv / G), so the all-invalid trailing
    groups cost nothing (the scalar fori overhead of visiting every
    padded entry slot was most of this kernel's time — unique touched
    rows are typically ~4x fewer than the padded stack size).
    slot_ref/vld_ref: (1, n_groups, G) SMEM; key_ref: (1, n_groups, G)
    VMEM; upd_ref: (1, n_groups*G, 128) VMEM; cells/out: (B, Cs, 128) ANY
    (aliased).  Rows within one insert are unique; INVALID (tail padding)
    entries skip their DMAs entirely — an unconditional no-op RMW on a
    shared dummy row would race the real update of that row inside the
    same group (group reads all happen before group writes, so the
    stale no-op write could land last and erase it).
    """
    b = pl.program_id(0)
    capf = jnp.float32(cap)

    if seed_copy:
        # interpret mode does not honor input_output_aliases: seed the
        # output with the input so untouched rows survive (compiled mode
        # aliases the buffers and skips this)
        cpy = pltpu.make_async_copy(cells_ref.at[b], out_ref.at[b],
                                    sems.at[0])
        cpy.start()
        cpy.wait()

    def group(g, _):
        def issue(i, _):
            row = slot_ref[0, g, i]

            @pl.when(vld_ref[0, g, i] > 0)
            def _():
                pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[i],
                                      sems.at[i]).start()
            return 0

        jax.lax.fori_loop(0, G, issue, 0)

        def wait_read(i, _):
            row = slot_ref[0, g, i]

            @pl.when(vld_ref[0, g, i] > 0)
            def _():
                pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[i],
                                      sems.at[i]).wait()
            return 0

        jax.lax.fori_loop(0, G, wait_read, 0)

        old = scratch[:]                               # (G, 128)
        upd = upd_ref[0, pl.ds(g * G, G)]              # (G, 128)
        keyf = key_ref[0, g].reshape(G, 1)             # (G, 1)

        ometa = old[:, 96:128]
        okey = jnp.floor(ometa * (1.0 / _META_MOD))
        ocnt = ometa - okey * _META_MOD
        # float masks throughout — Mosaic cannot broadcast/tile i1 vectors
        keep = ((okey == keyf) & (ocnt > 0.0)).astype(jnp.float32)  # ~fresh
        addcnt = upd[:, 96:128]
        cnt1 = keep * ocnt + addcnt
        scale = jnp.minimum(1.0, capf / jnp.maximum(cnt1, 1.0))
        keep3 = jnp.concatenate([keep, keep, keep], axis=1)
        scale3 = jnp.concatenate([scale, scale, scale], axis=1)
        sums = (keep3 * old[:, 0:96] + upd[:, 0:96]) * scale3
        meta1 = keyf * _META_MOD + jnp.minimum(cnt1, capf)
        t = (addcnt > 0.0).astype(jnp.float32)
        t3 = jnp.concatenate([t, t, t], axis=1)
        new = jnp.concatenate(
            [t3 * sums + (1.0 - t3) * old[:, 0:96],
             t * meta1 + (1.0 - t) * ometa], axis=1)
        scratch[:] = new

        def write(i, _):
            row = slot_ref[0, g, i]

            @pl.when(vld_ref[0, g, i] > 0)
            def _():
                pltpu.make_async_copy(scratch.at[i], out_ref.at[b, row],
                                      sems.at[i]).start()
            return 0

        jax.lax.fori_loop(0, G, write, 0)

        def wait_write(i, _):
            row = slot_ref[0, g, i]

            @pl.when(vld_ref[0, g, i] > 0)
            def _():
                pltpu.make_async_copy(scratch.at[i], out_ref.at[b, row],
                                      sems.at[i]).wait()
            return 0

        jax.lax.fori_loop(0, G, wait_write, 0)
        return 0

    ngd = jnp.minimum((nv_ref[b, 0] + G - 1) // G, n_groups)
    jax.lax.fori_loop(0, ngd, group, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def insert_batched(cells, pts, mask, cfg, interpret=False):
    """Batched map insertion: cells (B, Cs, 128), pts (B, N, 3), mask (B, N).

    Returns the updated cells.  Semantics == vmap(voxelmap.insert) with the
    same cfg (asserted by tests/test_pallas_insert.py); callers gate points
    with insert_guard beforehand exactly as for the XLA path.
    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests).
    """
    B, N = pts.shape[:2]
    row_slot, row_key, row_upd, row_valid = aggregate_updates(pts, mask, cfg)
    # compact valid entries to the front (slot order preserved: the sort
    # key is the original position, biased +N for invalid entries) so the
    # kernel's dynamic group bound skips the all-invalid tail — unique
    # touched rows are typically ~4x fewer than the padded stack size,
    # and the kernel cost is per visited ENTRY SLOT (scalar fori), not
    # per valid row
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    ckey = jnp.where(row_valid, iota, N + iota)
    # multi-operand sort compacts the (B, N) payload columns without
    # per-element minor-dim gathers (each take_along_axis cost
    # ~0.8 ms/exec at flagship shapes, scripts/fusion_bw.py r5); row_upd
    # keeps a 512 B-row take_along_axis, which gathers whole rows
    _, row_slot, row_key, rv_i, perm = jax.lax.sort(
        (ckey, row_slot, row_key, row_valid.astype(jnp.int32), iota),
        num_keys=1)
    row_valid = rv_i.astype(bool)
    row_upd = jnp.take_along_axis(row_upd, perm[..., None], axis=1)
    nv = jnp.sum(row_valid, axis=1, dtype=jnp.int32)[:, None]   # (B, 1)
    # pad the row count to a multiple of G; padding rows -> slot 0, zero upd
    n_pad = (-N) % G
    if n_pad:
        row_slot = jnp.pad(row_slot, ((0, 0), (0, n_pad)))
        row_key = jnp.pad(row_key, ((0, 0), (0, n_pad)))
        row_upd = jnp.pad(row_upd, ((0, 0), (0, n_pad), (0, 0)))
    if n_pad:
        row_valid = jnp.pad(row_valid, ((0, 0), (0, n_pad)))
    Np = row_slot.shape[1]
    n_groups = Np // G
    row_slot = row_slot.reshape(B, n_groups, G)
    row_vld = row_valid.astype(jnp.int32).reshape(B, n_groups, G)
    row_key = row_key.reshape(B, n_groups, G)

    out = pl.pallas_call(
        functools.partial(_rmw_kernel, cap=float(cfg.count_cap),
                          n_groups=n_groups, seed_copy=interpret),
        out_shape=jax.ShapeDtypeStruct(cells.shape, cells.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),   # nv: full (B,1) array

            pl.BlockSpec((1, n_groups, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_groups, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_groups, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # cells (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((G,))],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nv, row_slot, row_vld, row_key, row_upd, cells)
    return out
