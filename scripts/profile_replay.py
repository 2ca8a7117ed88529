"""Profile the batched replay on the real TPU and aggregate fusion costs.

Runs the bench workload under jax.profiler.trace, then parses the
.trace.json.gz: aggregates leaf fusions by their `args.source` (skipping
names starting with jit_/cond/while/body wrappers), prints the top-N.

    python scripts/profile_replay.py [batch] [n_scans]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(batch=8, n_scans=8, flagship=False):
    import jax

    from mmloam_tpu import pipeline, replay
    from mmloam_tpu.config import tiny_config, LIOConfig
    from mmloam_tpu.data import synthetic

    if flagship:
        from flagship_bench import build_inputs

        cfg = LIOConfig()
        batch_state, batch_scans = build_inputs(batch, n_scans, cfg,
                                                cache_tag="v1")
    else:
        cfg = tiny_config()
        world = synthetic.default_world()
        seqs = []
        for b in range(batch):
            traj = synthetic.Trajectory(speed=0.6 + 0.05 * b, z_amp=0.1,
                                        yaw_rate=0.2 + 0.02 * b)
            scans, _, _ = replay.make_sequence(world, traj, 0.0, n_scans, cfg,
                                               n_az=720, seed=b,
                                               range_noise=0.003,
                                               dtype=np.float32)
            seqs.append(scans)
        batch_scans = replay.stack_sequences(seqs)
        batch_state = replay.stack_states(
            [pipeline.init_state(cfg) for _ in range(batch)])

    # warm up (compile)
    from mmloam_tpu import pipeline as _pl
    batch = batch_scans.t.shape[1]
    def fresh_state():
        # replay_batch donates the state — rebuild per call
        s = replay.stack_states([_pl.init_state(cfg)
                                 for _ in range(batch)])
        jax.block_until_ready(s.vm_surf.cells)
        return s
    st, outs = replay.replay_batch(batch_state, batch_scans, cfg)
    np.asarray(outs.pose_p)

    trace_dir = "/tmp/mmloam_trace"
    os.system(f"rm -rf {trace_dir}")
    timed = batch_scans._replace(pts=batch_scans.pts + np.float32(1e-5))
    batch_state = fresh_state()
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        st, outs = replay.replay_batch(batch_state, timed, cfg)
        np.asarray(outs.pose_p)
        dt = time.perf_counter() - t0
    print(f"wall: {dt*1e3:.1f} ms for {batch}x{n_scans} scans "
          f"-> {batch*n_scans/dt:.1f} scans/s", flush=True)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found"); return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)

    # find device-side complete events (ph == 'X') on TPU tracks
    by_src = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        # device ops carry 'run_id'/'correlation_id' or live on /device:
        if "device_duration_ps" not in str(args) and "source" not in args \
                and "long_name" not in args:
            # fall back: use tid/pid mapping-free heuristic below
            pass
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        low = name.lower()
        if low.startswith(("jit_", "cond", "while", "body",
                           "xlamodule", "thread", "program", "step")):
            continue
        src = args.get("source") or args.get("long_name") or ""
        pidname = ev.get("pid")
        key = src if src else name
        by_src[key] += dur
        by_name[name.split(".")[0]] += dur
        total += dur

    # (family, source) pairs for the big op families
    by_fam_src = defaultdict(float)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        low = name.lower()
        if low.startswith(("jit_", "cond", "while", "body", "xlamodule",
                           "thread", "program", "step")):
            continue
        fam = name.split(".")[0].split("(")[0]
        if fam in ("dynamic-update-slice", "fusion", "copy", "sort",
                   "dynamic-slice", "custom-call", "pad", "reshape"):
            src = args.get("source") or args.get("long_name") or "?"
            by_fam_src[(fam, src[:90])] += dur
    print("\n== top by (family, source) ==")
    for (f, k), v in sorted(by_fam_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/1e3:9.2f} ms  {f:24s} {k}")

    print(f"\n== total leaf-op time: {total/1e3:.2f} ms (sum over events)")
    print("\n== top by source ==")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1e3:9.2f} ms  {k[:140]}")
    print("\n== top by op family ==")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1e3:9.2f} ms  {k[:100]}")

    # per-stage breakdown artifact (VERDICT round-1 item 1): attribute
    # device time to pipeline stages by source file, write JSON next to
    # the bench outputs so the breakdown is checked in with each round
    stage_of = {
        "ops/features.py": "feature_extraction",
        "ops/voxelmap.py": "map_query_assoc",
        "scripts/pallas_assoc.py": "map_query_assoc",  # archived
        "ops/pallas_insert.py": "map_insert",
        "ops/preintegration.py": "imu_preintegration",
        "ops/downsample.py": "stack_downsample",
        "ops/linalg3.py": "fit_eigensolvers",
        "estimator/solver.py": "lm_solver",
        "estimator/factors.py": "factor_eval",
        "estimator/reduced.py": "factor_eval",
        "estimator/estimate.py": "estimate_glue",
        "estimator/initializer.py": "initializer",
        "mmloam_tpu/pipeline.py": "pipeline_glue",
        "mmloam_tpu/replay.py": "replay_glue",
        "ops/undistort.py": "undistortion",
    }
    stages = defaultdict(float)
    dev_total = 0.0
    for k, v in by_src.items():
        if not k.startswith("/") and "mmloam" not in k:
            continue
        dev_total += v
        for frag, st_name in stage_of.items():
            if frag in k:
                stages[st_name] += v
                break
        else:
            stages["other"] += v
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
        art = {
            "wall_ms": round(dt * 1e3, 1),
            "scans_per_sec": round(batch * n_scans / dt, 2),
            "batch": batch, "n_scans": n_scans,
            "flagship": flagship,
            "stage_ms": {k: round(v / 1e3, 2) for k, v in
                         sorted(stages.items(), key=lambda kv: -kv[1])},
            "attributed_ms": round(dev_total / 1e3, 2),
        }
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
        print(f"\nwrote {out_path}")


if __name__ == "__main__":
    flagship = "--flagship" in sys.argv
    argv = sys.argv[1:]
    if "--json" in argv:
        j = argv.index("--json")
        argv = argv[:j] + argv[j + 2:]
    args = [int(a) for a in argv if not a.startswith("--")][:2]
    main(*args, flagship=flagship)
