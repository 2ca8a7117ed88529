"""Micro-bisect of the assoc kernel's STRUCTURE on the TPU compiler.

Variants add one structural element at a time on top of a trivial kernel.
Run each in a subprocess (compiler aborts kill the worker, not the driver).

    python scripts/bisect_mosaic2.py          # all variants
    python scripts/bisect_mosaic2.py <name>   # one variant inline
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    "out128",       # (1, GP, 128) VMEM out block over a 2D grid, no inputs
    "out16",        # (1, GP, 16) VMEM out block (the kernel's real shape)
    "stack16",      # 1D (GP,) compute + jnp.stack -> (GP, 16) store
    "smem_slot",    # + (1, GP, 8) SMEM block windowed over the grid
    "smem_scalars", # + (B, 1) SMEM thres/bmap full arrays
    "meta_vmem",    # + (1, GP, 8, 8) VMEM block  <- FAILS: 4D VMEM block
    "any_dma",      # + ANY cells input, scratch, semaphores, one DMA
    "dma_loop",     # + the full GP*8 fori_loop DMA issue/wait
]

# standalone variants (not cumulative): test specific hypotheses
SOLO = [
    "meta3d",         # meta as (B, M*8, 8) with (1, GP*8, 8) 3D block
                      # + in-kernel sublane-major reshape to (GP, 8, 8)
    "dma_loop_nometa",  # the DMA machinery alone (no meta operand)
    "sum3d",          # jnp.sum(ones(GP,8,32), axis=(1,2)) -> (GP,)
    "sum3d_seq",      # two-step: sum axis=2 then axis=1
    "sum2d",          # jnp.sum(ones(GP,256), axis=1) -> (GP,)
    "reshape_major",  # ones(GP*8,128).reshape(GP,8,128), sum -> (GP,)
    "iota31",         # (1,1,32) broadcasted_iota arithmetic
    "meta4d_seq",     # original (1, GP, 8, 8) 4D VMEM block, seq reduce
    "minkeep3d",      # jnp.min(x, axis=(1,2), keepdims=True) 3D
    "minkeep3d_seq",  # sequential keepdims min
]

GPc = 128


def _run_variant(name):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    GP = GPc
    B, M = 1, 2 * GP
    f32 = jnp.float32
    OUTW = 128 if name == "out128" else 16

    if name in SOLO:
        _run_solo(name, jax, jnp, pl, pltpu, GP, B, M, f32)
        return

    lvl = VARIANTS.index(name)

    def kern(*refs):
        i = 0
        slot_ref = meta_ref = thres_ref = bmap_ref = cells_ref = None
        if lvl >= VARIANTS.index("smem_slot"):
            slot_ref = refs[i]; i += 1
        if lvl >= VARIANTS.index("smem_scalars"):
            thres_ref = refs[i]; bmap_ref = refs[i + 1]; i += 2
        if lvl >= VARIANTS.index("meta_vmem"):
            meta_ref = refs[i]; i += 1
        if lvl >= VARIANTS.index("any_dma"):
            cells_ref = refs[i]; i += 1
        out_ref = refs[i]; i += 1
        scratch = sems = None
        if lvl >= VARIANTS.index("any_dma"):
            scratch = refs[i]; sems = refs[i + 1]; i += 2

        acc = jnp.zeros((GP,), f32)
        if slot_ref is not None:
            acc = acc + slot_ref[0, 0, 0].astype(f32)
        if thres_ref is not None:
            acc = acc + thres_ref[pl.program_id(0), 0]
        if bmap_ref is not None:
            acc = acc + bmap_ref[pl.program_id(0), 0].astype(f32)
        if meta_ref is not None:
            acc = acc + jnp.sum(meta_ref[0], axis=(1, 2))
        if name == "any_dma":
            b = 0 if bmap_ref is None else bmap_ref[pl.program_id(0), 0]
            cp = pltpu.make_async_copy(cells_ref.at[b, 0], scratch.at[0],
                                       sems.at[0])
            cp.start()
            cp.wait()
            acc = acc + jnp.sum(scratch[:], axis=1)[:GP]
        if name == "dma_loop":
            b = bmap_ref[pl.program_id(0), 0]

            def issue(j, _):
                row = slot_ref[0, j // 8, j % 8]
                pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[j],
                                      sems.at[j]).start()
                return 0

            jax.lax.fori_loop(0, GP * 8, issue, 0)

            def wait(j, _):
                row = slot_ref[0, j // 8, j % 8]
                pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[j],
                                      sems.at[j]).wait()
                return 0

            jax.lax.fori_loop(0, GP * 8, wait, 0)
            rows = scratch[:].reshape(GP, 8, 128)
            acc = acc + jnp.sum(rows, axis=(1, 2))

        if name == "out128":
            out_ref[0] = jnp.broadcast_to(acc[:, None], (GP, 128))
        else:
            out_ref[0] = jnp.stack([acc] * 16, axis=-1)

    in_specs = []
    args = []
    if lvl >= VARIANTS.index("smem_slot"):
        in_specs.append(pl.BlockSpec((1, GP, 8), lambda b, g: (b, g, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jax.ShapeDtypeStruct((B, M, 8), jnp.int32))
    if lvl >= VARIANTS.index("smem_scalars"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jax.ShapeDtypeStruct((B, 1), f32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jax.ShapeDtypeStruct((B, 1), jnp.int32))
    if lvl >= VARIANTS.index("meta_vmem"):
        in_specs.append(pl.BlockSpec((1, GP, 8, 8), lambda b, g: (b, g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jax.ShapeDtypeStruct((B, M, 8, 8), f32))
    if lvl >= VARIANTS.index("any_dma"):
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(jax.ShapeDtypeStruct((B, 4096, 128), f32))

    scratch_shapes = []
    if lvl >= VARIANTS.index("any_dma"):
        scratch_shapes = [pltpu.VMEM((GP * 8, 128), f32),
                          pltpu.SemaphoreType.DMA((GP * 8,))]

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, M, OUTW), f32),
        grid=(B, M // GPc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, GPc, OUTW), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    jax.jit(call).lower(*args).compile()


def _run_solo(name, jax, jnp, pl, pltpu, GP, B, M, f32):
    if name == "meta3d":
        def kern(meta_ref, out_ref):
            mq = meta_ref[0].reshape(GP, 8, 8)
            s = jnp.sum(jnp.sum(mq, axis=2), axis=1)
            base_x = mq[:, :, 0:1]
            s = s + jnp.sum(jnp.sum(base_x * jnp.ones((GP, 8, 32), f32),
                                    axis=2), axis=1)
            out_ref[0] = jnp.stack([s] * 16, axis=-1)

        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, M, 16), f32),
            grid=(B, M // GP),
            in_specs=[pl.BlockSpec((1, GP * 8, 8), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, GP, 16), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
        )
        jax.jit(call).lower(
            jax.ShapeDtypeStruct((B, M * 8, 8), f32)).compile()
        return

    if name == "dma_loop_nometa":
        def kern(slot_ref, bmap_ref, cells_ref, out_ref, scratch, sems):
            b = bmap_ref[pl.program_id(0), 0]

            def issue(j, _):
                row = slot_ref[0, j // 8, j % 8]
                pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[j],
                                      sems.at[j]).start()
                return 0

            jax.lax.fori_loop(0, GP * 8, issue, 0)

            def wait(j, _):
                row = slot_ref[0, j // 8, j % 8]
                pltpu.make_async_copy(cells_ref.at[b, row], scratch.at[j],
                                      sems.at[j]).wait()
                return 0

            jax.lax.fori_loop(0, GP * 8, wait, 0)
            rows = scratch[:].reshape(GP, 8, 128)
            s = jnp.sum(jnp.sum(rows, axis=2), axis=1)
            out_ref[0] = jnp.stack([s] * 16, axis=-1)

        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, M, 16), f32),
            grid=(B, M // GP),
            in_specs=[
                pl.BlockSpec((1, GP, 8), lambda b, g: (b, g, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, GP, 16), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((GP * 8, 128), f32),
                            pltpu.SemaphoreType.DMA((GP * 8,))],
        )
        jax.jit(call).lower(
            jax.ShapeDtypeStruct((B, M, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 4096, 128), f32)).compile()
        return

    # trivial compute-only kernels: one dummy VMEM input, (1, GP, 16) out
    def compute_kernel(body):
        def kern(x_ref, out_ref):
            s = body(x_ref)
            out_ref[0] = jnp.stack([s] * 16, axis=-1)

        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, M, 16), f32),
            grid=(B, M // GP),
            in_specs=[pl.BlockSpec((1, GP, 128), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, GP, 16), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
        )
        jax.jit(call).lower(
            jax.ShapeDtypeStruct((B, M, 128), f32)).compile()

    if name == "sum3d":
        compute_kernel(lambda x_ref: jnp.sum(
            jnp.broadcast_to(x_ref[0, :, :32][:, None, :], (GP, 8, 32)),
            axis=(1, 2)))
        return
    if name == "sum3d_seq":
        compute_kernel(lambda x_ref: jnp.sum(jnp.sum(
            jnp.broadcast_to(x_ref[0, :, :32][:, None, :], (GP, 8, 32)),
            axis=2), axis=1))
        return
    if name == "sum2d":
        compute_kernel(lambda x_ref: jnp.sum(x_ref[0], axis=1))
        return
    if name == "reshape_major":
        def body(x_ref):
            r = jnp.broadcast_to(x_ref[0], (8, GP, 128)).reshape(
                GP * 8, 128) * 1.0
            rows = r.reshape(GP, 8, 128)
            return jnp.sum(jnp.sum(rows, axis=2), axis=1)

        compute_kernel(body)
        return
    if name == "iota31":
        def body(x_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)
            scz = (lane % 2).astype(f32)
            v = x_ref[0, :, :32][:, None, :] * (scz + 1.0)
            return jnp.sum(jnp.sum(v, axis=2), axis=1)

        compute_kernel(body)
        return

    if name == "meta4d_seq":
        def kern(meta_ref, out_ref):
            mq = meta_ref[0]
            s = jnp.sum(jnp.sum(mq, axis=2), axis=1)
            base_x = mq[:, :, 0:1]
            s = s + jnp.sum(jnp.sum(base_x * jnp.ones((GP, 8, 32), f32),
                                    axis=2), axis=1)
            out_ref[0] = jnp.stack([s] * 16, axis=-1)

        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, M, 16), f32),
            grid=(B, M // GP),
            in_specs=[pl.BlockSpec((1, GP, 8, 8), lambda b, g: (b, g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, GP, 16), lambda b, g: (b, g, 0),
                                   memory_space=pltpu.VMEM),
        )
        jax.jit(call).lower(
            jax.ShapeDtypeStruct((B, M, 8, 8), f32)).compile()
        return

    if name == "minkeep3d":
        def body(x_ref):
            v = jnp.broadcast_to(x_ref[0, :, :32][:, None, :], (GP, 8, 32))
            m = jnp.min(v, axis=(1, 2), keepdims=True)
            return jnp.sum(jnp.sum(v + m, axis=2), axis=1)

        compute_kernel(body)
        return

    if name == "minkeep3d_seq":
        def body(x_ref):
            v = jnp.broadcast_to(x_ref[0, :, :32][:, None, :], (GP, 8, 32))
            m = jnp.min(jnp.min(v, axis=2, keepdims=True),
                        axis=1, keepdims=True)
            return jnp.sum(jnp.sum(v + m, axis=2), axis=1)

        compute_kernel(body)
        return

    raise ValueError(name)


def main():
    if len(sys.argv) > 1:
        _run_variant(sys.argv[1])
        print(f"PASS {sys.argv[1]}", flush=True)
        return
    here = os.path.abspath(__file__)
    for v in VARIANTS + SOLO:
        r = subprocess.run([sys.executable, here, v],
                           capture_output=True, text=True, timeout=900)
        status = "PASS" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        print(f"{status:12s} {v}", flush=True)
        if r.returncode != 0:
            for ln in (r.stderr or r.stdout).strip().splitlines()[-6:]:
                print(f"    {ln}", flush=True)


if __name__ == "__main__":
    main()
