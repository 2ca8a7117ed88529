"""Bisect Mosaic/XLA-TPU compile failures in the association kernels.

Each stage compiles (AOT lower+compile, no execution) one slice of the
kernel body as a standalone pallas_call.  Stages run in SUBPROCESSES so a
compiler Check-failure abort doesn't kill the driver.

    python scripts/bisect_mosaic.py            # run all stages
    python scripts/bisect_mosaic.py <stage>    # run one stage inline
"""

import functools
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    "dma_only",          # row DMA loop + zero output
    "select",            # + candidate distances and k-th smallest loop
    "moments",           # + masked moment reductions (1D outputs)
    "eig",               # + closed-form eigenvalues/vector
    "stack_out",         # + jnp.stack of 16 (GP,) lanes into out_ref
    "single_full",       # full single-tier kernel via assoc_batched
    "need_store",        # the dual kernel's scalar SMEM flag-store loop
]


def _run_stage(stage):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mmloam_tpu.config import tiny_config
    from scripts import pallas_assoc as pa  # archived kernel (round 4)

    GP = pa.GP
    cfg = tiny_config()
    mcfg = cfg.map
    import mmloam_tpu.ops.voxelmap as vx
    n_rows = vx.empty_map(mcfg).cells.shape[0]
    B, M = 1, 2 * GP
    f32 = jnp.float32

    cells_s = jax.ShapeDtypeStruct((B, n_rows, 128), f32)
    slot_s = jax.ShapeDtypeStruct((B, M, 8), jnp.int32)
    meta_s = jax.ShapeDtypeStruct((B, M, 8, 8), f32)
    thres_s = jax.ShapeDtypeStruct((B, 1), f32)
    bmap_s = jax.ShapeDtypeStruct((B, 1), jnp.int32)

    params = dict(packs=vx._pack(mcfg), voxel=float(mcfg.voxel_size),
                  stencil=(float(mcfg.stencil_x), float(mcfg.stencil_y),
                           float(mcfg.stencil_z)))

    if stage == "single_full":
        pw_s = jax.ShapeDtypeStruct((B, M, 3), f32)
        mask_s = jax.ShapeDtypeStruct((B, M), jnp.bool_)
        t_s = jax.ShapeDtypeStruct((), f32)
        pa.assoc_batched.lower(cells_s, pw_s, mask_s, t_s, cfg=mcfg,
                               mode=0, k=5, scatter_ratio=0.05).compile()
        return

    def kern(slot_ref, meta_ref, thres_ref, bmap_ref, cells_ref, out_ref,
             scratch, sems, need_smem):
        bq = pl.program_id(0)
        b = bmap_ref[bq, 0]
        thres = thres_ref[bq, 0]

        def issue(i, _):
            row = slot_ref[0, i // 8, i % 8]
            pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[i],
                                  sems.at[i]).start()
            return 0

        jax.lax.fori_loop(0, GP * 8, issue, 0)

        def wait(i, _):
            row = slot_ref[0, i // 8, i % 8]
            pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[i],
                                  sems.at[i]).wait()
            return 0

        jax.lax.fori_loop(0, GP * 8, wait, 0)

        rows = scratch[:].reshape(GP, 8, 128)
        mq = meta_ref[0]
        z1 = jnp.zeros((GP,), f32)

        if stage == "dma_only":
            s = jnp.sum(rows, axis=(1, 2)) * 0.0 + thres * 0.0
            out_ref[0] = jnp.stack([s] * 16, axis=-1)
            return

        if stage == "need_store":
            s = jnp.sum(rows, axis=(1, 2))
            valid_g = s > thres
            need_f = jnp.where(valid_g, 0.0, 1.0).reshape(1, GP)
            lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, GP), 1)

            def write_need(i, _):
                need_smem[0, i] = jnp.sum(
                    jnp.where(lane_id == i, need_f, 0.0)).astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, GP, write_need, 0)

            def rd(i, acc):
                return acc + need_smem[0, i]

            tot = jax.lax.fori_loop(0, GP, rd, 0)
            out_ref[0] = jnp.stack([s + tot.astype(f32)] * 16, axis=-1)
            return

        # pieces of _fit_rows, progressively
        px, py, pz = params["packs"]
        voxel = params["voxel"]
        stx, sty, stz = params["stencil"]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)
        scz = (lane % pz).astype(f32)
        scy = ((lane // pz) % py).astype(f32)
        scx = (lane // (py * pz)).astype(f32)
        smx, smy, smz = scx * voxel, scy * voxel, scz * voxel
        sx = rows[:, :, 0:32]
        sy = rows[:, :, 32:64]
        sz = rows[:, :, 64:96]
        meta = rows[:, :, 96:128]
        base_x = mq[:, :, 0:1]
        base_y = mq[:, :, 1:2]
        base_z = mq[:, :, 2:3]
        ov_x = mq[:, :, 3:4]
        ov_y = mq[:, :, 4:5]
        ov_z = mq[:, :, 5:6]
        keyq = mq[:, :, 6:7]
        key_st = jnp.floor(meta * (1.0 / pa._META_MOD))
        cnt = meta - key_st * pa._META_MOD
        okf = ((key_st == keyq) & (cnt > 0.0)).astype(f32)
        okf = okf * (jnp.abs(ov_x + scx) <= stx)
        okf = okf * (jnp.abs(ov_y + scy) <= sty)
        okf = okf * (jnp.abs(ov_z + scz) <= stz)
        inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
        dx = base_x + smx + sx * inv_cnt
        dy = base_y + smy + sy * inv_cnt
        dz = base_z + smz + sz * inv_cnt
        d2 = dx * dx + dy * dy + dz * dz
        big = jnp.float32(3.0e38)
        d2m = jnp.where(okf > 0.0, d2, big)

        k = 5
        t = jnp.full((GP, 1, 1), big)
        nsel = jnp.zeros((GP, 1, 1), f32)
        done = jnp.zeros((GP, 1, 1), f32)
        cur = d2m
        for _ in range(k):
            m = jnp.min(cur, axis=(1, 2), keepdims=True)
            c = jnp.sum((cur <= m).astype(f32), axis=(1, 2), keepdims=True)
            fin = (m < big).astype(f32)
            take = (1.0 - done) * fin
            t = jnp.where(take > 0.0, m, t)
            nsel = nsel + take * c
            done = jnp.maximum(done, (nsel >= k).astype(f32))
            done = jnp.maximum(done, 1.0 - fin)
            cur = jnp.where(cur <= m, big, cur)

        if stage == "select":
            s = t[:, 0, 0] + nsel[:, 0, 0] + thres * 0.0
            out_ref[0] = jnp.stack([s] * 16, axis=-1)
            return

        w = ((okf > 0.0) & (d2 <= t)).astype(f32)
        n = jnp.sum(w, axis=(1, 2))
        nf = jnp.maximum(n, 1.0)
        s1x = jnp.sum(dx * w, axis=(1, 2))
        s1y = jnp.sum(dy * w, axis=(1, 2))
        s1z = jnp.sum(dz * w, axis=(1, 2))
        sxx = jnp.sum(dx * dx * w, axis=(1, 2))
        syy = jnp.sum(dy * dy * w, axis=(1, 2))
        szz = jnp.sum(dz * dz * w, axis=(1, 2))
        sxy = jnp.sum(dx * dy * w, axis=(1, 2))
        sxz = jnp.sum(dx * dz * w, axis=(1, 2))
        syz = jnp.sum(dy * dz * w, axis=(1, 2))
        mux, muy, muz = s1x / nf, s1y / nf, s1z / nf

        if stage == "moments":
            s = mux + muy + muz + sxy + sxz + syz + sxx + syy + szz
            out_ref[0] = jnp.stack([s + thres * 0.0] * 16, axis=-1)
            return

        a00 = sxx - nf * mux * mux
        a11 = syy - nf * muy * muy
        a22 = szz - nf * muz * muz
        a01 = sxy - nf * mux * muy
        a02 = sxz - nf * mux * muz
        a12 = syz - nf * muy * muz
        e_lo, e_mid, e_hi = pa._eigvalsh3_lanes(a00, a01, a02, a11, a12, a22)
        vxc, vyc, vzc = pa._eigvec_lanes(a00, a01, a02, a11, a12, a22,
                                         e_mid, e_hi, (0.0, 0.0, 1.0))
        if stage == "eig":
            s = e_lo + e_mid + e_hi + vxc + vyc + vzc
            out_ref[0] = jnp.stack([s + thres * 0.0] * 16, axis=-1)
            return

        if stage == "stack_out":
            t_out = jnp.where(t[:, 0, 0] >= big, jnp.float32(jnp.inf),
                              t[:, 0, 0])
            valid = ((n >= k) & (t_out < thres)).astype(f32)
            out_ref[0] = jnp.stack([mux, muy, muz, vxc, vyc, vzc, valid,
                                    t_out, n, z1, z1, z1, z1, z1, z1, z1],
                                   axis=-1)
            return

        raise ValueError(stage)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, M, 16), f32),
        grid=(B, M // GP),
        in_specs=[
            pl.BlockSpec((1, GP, 8), lambda b, g: (b, g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, GP, 8, 8), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, GP, 16), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((GP * 8, 128), f32),
                        pltpu.SemaphoreType.DMA((GP * 8,)),
                        pltpu.SMEM((1, GP), jnp.int32)],
    )
    jax.jit(call).lower(slot_s, meta_s, thres_s, bmap_s, cells_s).compile()


def main():
    if len(sys.argv) > 1:
        _run_stage(sys.argv[1])
        print(f"PASS {sys.argv[1]}", flush=True)
        return
    here = os.path.abspath(__file__)
    for stage in STAGES:
        r = subprocess.run([sys.executable, here, stage],
                           capture_output=True, text=True, timeout=900)
        status = "PASS" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        print(f"{status:12s} {stage}", flush=True)
        if r.returncode != 0:
            tail = (r.stderr or r.stdout).strip().splitlines()[-12:]
            for ln in tail:
                print(f"    {ln}", flush=True)


if __name__ == "__main__":
    main()
