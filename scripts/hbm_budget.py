"""Per-subsystem HBM byte budget of the flagship step (compile-only).

ROOFLINE.json shows the program is HBM-bound (2.15 GB/scan vs an 819 GB/s
chip = 380 scans/sec ceiling); this script attributes those bytes by
DIFFERENCING XLA `cost_analysis()` across config variants (each variant
removes one subsystem), plus direct sub-program measurements of one
association pass.  Compile-only — no execution, so it works whenever the
remote compile server is reachable.

    python scripts/hbm_budget.py          # needs the TPU backend
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16
N_SCANS = 2


def analyze(fn, *args):
    import jax

    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return (float(ca.get("bytes accessed", 0.0)),
            float(ca.get("flops", 0.0)))


def replay_bytes(cfg):
    import bench
    from mmloam_tpu import replay

    state, scans = bench.build_inputs(BATCH, N_SCANS, cfg, seed0=0)
    by, fl = analyze(lambda st, sc: replay.replay_batch(st, sc, cfg),
                     state, scans)
    n = BATCH * N_SCANS
    return by / n, fl / n


def main():
    import jax
    import jax.numpy as jnp

    from mmloam_tpu.config import LIOConfig
    from mmloam_tpu.estimator import factors
    from mmloam_tpu.ops import voxelmap

    out = {}

    base = LIOConfig()
    variants = {
        "flagship": base,
        "no_local_map": dataclasses.replace(base, use_local_map=False),
        "one_outer_round": dataclasses.replace(
            base, solver=dataclasses.replace(base.solver,
                                             max_outer_iters=1)),
        "no_old_refresh": dataclasses.replace(
            base, solver=dataclasses.replace(base.solver,
                                             refresh_old_frames=0)),
        "no_newest_reassoc": dataclasses.replace(
            base, solver=dataclasses.replace(base.solver,
                                             full_reassoc_rounds=0)),
    }
    for name, cfg in variants.items():
        by, fl = replay_bytes(cfg)
        out[name] = {"hbm_bytes_per_scan": by, "flops_per_scan": fl}
        if name != "flagship":
            out[name]["bytes_delta_vs_flagship"] = (
                out["flagship"]["hbm_bytes_per_scan"] - by)
        print(f"{name}: {by/1e6:.1f} MB/scan", flush=True)

    # one standalone association pass (surf stack, global+local tier),
    # counted per CALL — multiply by the per-scan cadence to cross-check
    cfg = base
    vm = voxelmap.empty_map(cfg.map)
    vm_l = voxelmap.empty_map(cfg.local_map)
    M = cfg.scan.max_surf
    x6 = jnp.zeros((6,), jnp.float32)
    p_l = jnp.zeros((M, 3), jnp.float32)
    mask = jnp.ones((M,), bool)
    Rbl = jnp.eye(3, dtype=jnp.float32)
    tbl = jnp.zeros((3,), jnp.float32)

    def assoc(x6, p_l, mask, cells_g, cells_l):
        vmg = dataclasses.replace(vm, cells=cells_g)
        vml = dataclasses.replace(vm_l, cells=cells_l)
        return factors.associate_planes(
            x6, p_l, mask, vmg, Rbl, tbl, cfg,
            jnp.float32(cfg.solver.thres_dist),
            jnp.float32(cfg.solver.plan_weight_tan), vm_local=vml)

    by, fl = analyze(assoc, x6, p_l, mask, vm.cells, vm_l.cells)
    out["assoc_surf_one_pass_dual_tier"] = {
        "hbm_bytes_per_call": by, "flops_per_call": fl}
    print(f"assoc surf one pass (dual tier, M={M}): {by/1e6:.1f} MB/call",
          flush=True)

    def assoc_g(x6, p_l, mask, cells_g):
        vmg = dataclasses.replace(vm, cells=cells_g)
        return factors.associate_planes(
            x6, p_l, mask, vmg, Rbl, tbl, cfg,
            jnp.float32(cfg.solver.thres_dist),
            jnp.float32(cfg.solver.plan_weight_tan))

    by, fl = analyze(assoc_g, x6, p_l, mask, vm.cells)
    out["assoc_surf_one_pass_global_only"] = {
        "hbm_bytes_per_call": by, "flops_per_call": fl}
    print(f"assoc surf one pass (global only): {by/1e6:.1f} MB/call",
          flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
