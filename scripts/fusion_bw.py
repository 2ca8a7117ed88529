"""Per-fusion ACHIEVED-BANDWIDTH report for the flagship replay.

ROOFLINE.json says the program should be HBM-bound at ~666 scans/sec,
yet it runs at ~232 (35%), and the batch-16-vs-32 null result proves the
gap is per-fusion inefficiency, not serial latency.  This tool names the
offenders: it crosses the compiled HLO (exact operand/output bytes per
MATERIALIZED instruction) with the device trace (duration + execution
count per instruction) and ranks fusions by total time with their
achieved GB/s — fusions far below streaming bandwidth are the r6 work
list.

    python scripts/fusion_bw.py [batch] [n_scans]   # real TPU backend

Bytes come in two flavors: RAW (out + full operands, like
cost_analysis — overstates gather-containing fusions) and CORRECTED
(gather/dynamic-slice table operands are re-billed at the bytes those
ops actually produce, i.e. their output shapes).  The corrected GB/s
column is the honest achieved bandwidth; fusions where raw >> corrected
are gather-dominated and their ceiling is issue rate, not bytes.
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*(.+?)\s+([\w\-]+)\((.*)$")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_META_RE = re.compile(r'source_file="([^"]+)".*?source_line=(\d+)')
_COMP_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{\s*$")


def _shape_bytes(type_str):
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_hlo(txt):
    """-> ({name: (out_bytes, opcode, operand_names, src, computation)},
           {computation: {param_ordinal: gathered_out_bytes}})

    The second map carries, per fused computation, how many bytes its
    internal gather/dynamic-slice ops actually PRODUCE from each
    parameter — used to re-bill gather-table operands at real traffic.
    """
    insts = {}
    gather_param_bytes = {}
    calls_of = {}
    comp = None
    for line in txt.splitlines():
        mc = _COMP_RE.match(line)
        if mc and line.rstrip().endswith("{"):
            comp = mc.group(1)
            continue
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, type_str, opcode, rest = m.groups()
        ops = re.findall(r"%([\w.\-]+)", rest.split("metadata=")[0])
        sm = _META_RE.search(line)
        src = f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else "?"
        out_b = _shape_bytes(type_str)
        insts[name] = (out_b, opcode, ops, src, comp)
        if opcode == "fusion":
            cm = re.search(r"calls=%?([\w.\-]+)", rest)
            if cm:
                calls_of[name] = cm.group(1)
        if opcode in ("gather", "dynamic-slice") and ops and comp:
            pm = re.match(r"param_(\d+)", ops[0])
            if pm:
                d = gather_param_bytes.setdefault(comp, {})
                k = int(pm.group(1))
                d[k] = d.get(k, 0) + out_b
    return insts, gather_param_bytes, calls_of


def main(batch=16, n_scans=30):
    import jax

    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import LIOConfig
    from flagship_bench import build_inputs

    cfg = LIOConfig()
    batch_state, batch_scans = build_inputs(batch, n_scans, cfg,
                                            cache_tag="v1")
    st, outs = replay.replay_batch(batch_state, batch_scans, cfg)
    np.asarray(outs.pose_p)

    key = (cfg, None, jax.default_backend() != "cpu")
    run = replay._BATCH_RUNNERS[key]
    txt = run.lower(batch_state, batch_scans).compile().as_text()
    insts, gpb, calls_of = parse_hlo(txt)
    print(f"HLO instructions parsed: {len(insts)}", flush=True)

    trace_dir = "/tmp/mmloam_bw_trace"
    os.system(f"rm -rf {trace_dir}")
    timed = batch_scans._replace(pts=batch_scans.pts + np.float32(1e-5))
    bs = replay.stack_states([pipeline.init_state(cfg)
                              for _ in range(batch)])
    jax.block_until_ready(bs.vm_surf.cells)
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        st, outs = replay.replay_batch(bs, timed, cfg)
        np.asarray(outs.pose_p)
        dt = time.perf_counter() - t0
    print(f"wall: {dt*1e3:.1f} ms -> {batch*n_scans/dt:.1f} scans/s",
          flush=True)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or float(ev.get("dur", 0)) <= 0:
            continue
        name = ev.get("name", "")
        if name in insts or name.lstrip("%") in insts:
            nm = name.lstrip("%")
            dur[nm] += float(ev["dur"])
            cnt[nm] += 1

    rows = []
    for nm, d_us in dur.items():
        out_b, opcode, ops, src, _ = insts[nm]
        op_b = sum(insts[o][0] for o in ops if o in insts)
        # corrected operand bytes: re-bill gather/dyn-slice table params
        # of this fusion at the bytes those ops actually produce
        corr_b = op_b
        g = gpb.get(calls_of.get(nm, ""), {})
        for ordinal, real in g.items():
            if ordinal < len(ops) and ops[ordinal] in insts:
                corr_b += min(real, insts[ops[ordinal]][0]) \
                    - insts[ops[ordinal]][0]
        if opcode in ("gather", "dynamic-slice") and ops \
                and ops[0] in insts:
            corr_b = op_b - insts[ops[0]][0] + min(out_b, insts[ops[0]][0])
        raw = (out_b + op_b) * cnt[nm]
        corr = (out_b + corr_b) * cnt[nm]
        rows.append((d_us, corr / (d_us * 1e-6) / 1e9 if d_us else 0.0,
                     raw / (d_us * 1e-6) / 1e9 if d_us else 0.0,
                     (out_b + corr_b) / 2**20, cnt[nm], opcode, src, nm))
    rows.sort(reverse=True)
    matched = sum(r[0] for r in rows)
    print(f"matched device time: {matched/1e3:.1f} ms over {len(rows)} "
          f"instructions\n")
    print(f"{'ms':>9} {'GB/s':>7} {'raw':>7} {'MB/exec':>8} {'n':>5}  "
          "op/source  (GB/s = gather-corrected)")
    for d_us, gbps, gbps_raw, mb, n, opcode, src, nm in rows[:40]:
        print(f"{d_us/1e3:9.2f} {gbps:7.1f} {gbps_raw:7.1f} {mb:8.2f} "
              f"{n:5d}  {opcode:<12s} {src}  [{nm}]")

    # aggregate achieved bandwidth by source line for the big picture
    agg = defaultdict(lambda: [0.0, 0.0])
    for d_us, gbps, gbps_raw, mb, n, opcode, src, nm in rows:
        agg[src][0] += d_us
        agg[src][1] += mb * n
    print("\n== by source line (ms, corrected GB/s) ==")
    for src, (d_us, mb) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{d_us/1e3:9.2f} ms {mb/1024/(d_us*1e-6+1e-12):7.1f} GB/s  "
              f"{src}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]][:2]
    main(*args)
