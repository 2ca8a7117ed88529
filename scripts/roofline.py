"""Roofline accounting for the flagship step program on TPU v5e.

Answers "where does the 200 scans/sec/chip target actually sit?" with
XLA's own cost model: lower the jitted batched-replay step at flagship
shapes, compile it, and read `cost_analysis()` — XLA's post-fusion count
of executed FLOPs and HBM bytes accessed.  Dividing by the v5e peaks
gives two per-scan time lower bounds; the binding one is the roofline.

    python scripts/roofline.py [batch]      # needs the real TPU backend

The reference has no analogue (its throughput story is 6 Ceres threads +
a background map thread, unionPoseEstimation.cpp:1318-1327); this is the
TPU-native accounting VERDICT r02 asked for.

v5e (TPU v5 lite) peaks (public spec): 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  f32 matmul runs the MXU at half rate (98.5 TFLOP/s);
vector-unit (VPU) f32 is ~4.9 TFLOP/s — elementwise-heavy programs hit
the VPU ceiling long before the MXU one, so we report both bounds.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_MXU_F32 = 98.5e12     # f32 on the MXU (half of bf16 197 TF)
PEAK_VPU_F32 = 4.9e12      # 8 MiB/cycle-ish vector f32 ceiling
PEAK_HBM = 819e9           # bytes/s


def main(batch=16):
    import jax

    import bench
    from mmloam_tpu import replay
    from mmloam_tpu.config import LIOConfig

    cfg = LIOConfig()
    n_scans = 2    # per-scan costs scale linearly in the scan axis
    state, scans = bench.build_inputs(batch, n_scans, cfg, seed0=0)

    fn = jax.jit(lambda st, sc: replay.replay_batch(st, sc, cfg))
    lowered = fn.lower(state, scans)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    n_total = batch * n_scans
    fl_scan = flops / n_total
    by_scan = bytes_acc / n_total

    t_mxu = fl_scan / PEAK_MXU_F32
    t_vpu = fl_scan / PEAK_VPU_F32
    t_hbm = by_scan / PEAK_HBM
    bound = max(t_hbm, t_mxu)

    out = {
        "batch": batch,
        "flops_per_scan": fl_scan,
        "hbm_bytes_per_scan": by_scan,
        "arithmetic_intensity_flop_per_byte": fl_scan / max(by_scan, 1.0),
        "bound_scans_per_sec": {
            "hbm_819GBps": 1.0 / t_hbm,
            "mxu_f32_98.5TF": 1.0 / t_mxu,
            "vpu_f32_4.9TF": 1.0 / t_vpu,
            "roofline_max(hbm,mxu)": 1.0 / bound,
        },
        "note": "XLA cost_analysis counts post-fusion executed flops and "
                "HBM bytes; vector-heavy programs land between the VPU "
                "and MXU bounds.",
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:] if not a.startswith("-")][:1]
    main(*args)
