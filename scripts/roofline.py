"""Roofline accounting for the flagship step program on TPU v5e.

Answers "where does the 200 scans/sec/chip target actually sit?" with
XLA's own cost model, CORRECTED for a known accounting artifact: XLA's
`cost_analysis()` bills every gather/scatter at the FULL operand size
(measured here: a 100-row gather from a 64 MB table reports 134.8 MB
"bytes accessed"), so a map-gather-heavy program's raw byte count is
dominated by phantom traffic — each association pass is billed the whole
64 MB persistent map although it touches ~20k x 512 B rows.

Method: compile the flagship program twice — once at flagship map dims
(raw upper bound) and once with TINY maps (32x32x16 / 24x24x8; the
gather/scatter billing shrinks to noise while every other byte stays
identical) — and add back the ANALYTIC real map traffic (stencil rows
actually fetched per association pass + insert RMW rows, from config
cadence).  The corrected bound is what the hardware actually sees.

    python scripts/roofline.py [batch]      # needs the real TPU backend

The reference has no analogue (its throughput story is 6 Ceres threads +
a background map thread, unionPoseEstimation.cpp:1318-1327); this is the
TPU-native accounting VERDICT r02 asked for.

v5e (TPU v5 lite) peaks (public spec): 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  f32 matmul runs the MXU at half rate (98.5 TFLOP/s);
vector-unit (VPU) f32 is ~4.9 TFLOP/s — elementwise-heavy programs hit
the VPU ceiling long before the MXU one, so we report both bounds.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_MXU_F32 = 98.5e12     # f32 on the MXU (half of bf16 197 TF)
PEAK_VPU_F32 = 4.9e12      # 8 MiB/cycle-ish vector f32 ceiling
PEAK_HBM = 819e9           # bytes/s


def _cost(cfg, batch, n_scans):
    import jax

    import bench
    from mmloam_tpu import replay

    state, scans = bench.build_inputs(batch, n_scans, cfg, seed0=0)
    fn = jax.jit(lambda st, sc: replay.replay_batch(st, sc, cfg))
    ca = fn.lower(state, scans).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    n = batch * n_scans
    return (float(ca.get("bytes accessed", 0.0)) / n,
            float(ca.get("flops", 0.0)) / n)


def _real_map_traffic(cfg):
    """Analytic HBM bytes/scan the voxel maps actually move.

    Association: each pass gathers 8 superrows (512 B) per query.  Per
    scan the engine runs 3 frame-association passes (newest entry +
    the round-1 refresh, which executes for every lane because
    short-window lanes always take it + `refresh_old_frames` old slots),
    each over the surf + corner stacks on the global tier, plus the
    compacted local-tier rescue buffer.  Insert: both maps RMW one 512 B
    row per touched superrow (read + write), bounded by the stack sizes.
    """
    row = 128 * 4                                   # 512 B superrow
    m_q = cfg.scan.max_surf + cfg.scan.max_corner
    n_assoc = 1 + 1 + cfg.solver.refresh_old_frames
    gather = n_assoc * m_q * 8 * row                # global tier
    rescue = int(cfg.solver.local_rescue_frac * m_q)
    gather += n_assoc * rescue * 8 * row            # local-tier rescue
    insert = 2 * 2 * m_q * row                      # RMW both maps
    return gather + insert


def main(batch=16):
    from mmloam_tpu.config import LIOConfig

    n_scans = 2    # per-scan costs scale linearly in the scan axis
    base = LIOConfig()
    tiny_maps = dataclasses.replace(
        base,
        map=dataclasses.replace(base.map, dim_x=32, dim_y=32, dim_z=16),
        local_map=dataclasses.replace(base.local_map, dim_x=24, dim_y=24,
                                      dim_z=8))

    by_raw, fl = _cost(base, batch, n_scans)
    by_tiny, _ = _cost(tiny_maps, batch, n_scans)
    by_maps = _real_map_traffic(base)
    by_corr = by_tiny + by_maps

    def bounds(by_scan):
        t_mxu = fl / PEAK_MXU_F32
        t_vpu = fl / PEAK_VPU_F32
        t_hbm = by_scan / PEAK_HBM
        return {
            "hbm_819GBps": 1.0 / t_hbm,
            "mxu_f32_98.5TF": 1.0 / t_mxu,
            "vpu_f32_4.9TF": 1.0 / t_vpu,
            "roofline_max(hbm,mxu)": 1.0 / max(t_hbm, t_mxu),
        }

    out = {
        "batch": batch,
        "flops_per_scan": fl,
        "hbm_bytes_per_scan_raw_costmodel": by_raw,
        "hbm_bytes_per_scan_tiny_maps": by_tiny,
        "hbm_bytes_per_scan_real_map_traffic_analytic": by_maps,
        "hbm_bytes_per_scan_corrected": by_corr,
        "arithmetic_intensity_flop_per_byte": fl / max(by_corr, 1.0),
        "bound_scans_per_sec_corrected": bounds(by_corr),
        "bound_scans_per_sec_raw": bounds(by_raw),
        "note": "raw cost_analysis bills gathers/scatters at FULL operand "
                "size (measured: 100-row gather from 64 MB -> 134.8 MB "
                "billed); corrected = tiny-map compile + analytic stencil "
                "row / insert RMW traffic.  The corrected HBM bound is "
                "the honest one; the program may still be gather "
                "ISSUE-RATE bound (~10 ns/row, CLAUDE.md) before it is "
                "bandwidth bound.",
    }
    # gather issue-rate bound: rows/scan x 10 ns
    rows_scan = _real_map_traffic(base) / (128 * 4)
    out["gather_issue_bound_scans_per_sec"] = 1.0 / (rows_scan * 10e-9)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:] if not a.startswith("-")][:1]
    main(*args)
