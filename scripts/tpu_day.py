"""One-shot TPU validation + measurement sweep (run when the tunnel is up).

    python scripts/tpu_day.py            # full sweep, ~15-25 min with compiles

Order matters: cheap correctness gates first (so a broken kernel fails in
seconds, not after a 10-minute flagship compile), then throughput, then
the profile artifact.

  0. kernel lowering smoke (compile-only AOT of both assoc kernels at
     flagship shapes — catches Mosaic/jellyfish rejections in ~1 min;
     the auto-fallback probes in estimator/factors.py would route the
     engine to the XLA path on failure, this step makes it LOUD)
  1. device probe
  2. pallas insert kernel check        (scripts/pallas_insert_test.py)
  3. archived assoc kernel check + bench (scripts/pallas_assoc_test.py)
  4. tiny-config replay smoke (accuracy unchanged on TPU)
  5. flagship bench                    (bench.py, 3-rep median)
  6. per-stage profile artifact        (PROFILE_r03.json)
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag, cmd, timeout=2400):
    print(f"\n===== {tag} =====", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, timeout=timeout)
    print(f"===== {tag}: exit {r.returncode} in {time.time()-t0:.0f}s =====",
          flush=True)
    return r.returncode


def main():
    rc = run("device probe", [
        sys.executable, "-c",
        "import jax; print(jax.devices())"], timeout=120)
    if rc != 0:
        print("TPU not reachable; aborting")
        return 1
    steps = [
        ("insert kernel", [sys.executable, "scripts/pallas_insert_test.py"]),
        ("archived assoc kernel",
         [sys.executable, "scripts/pallas_assoc_test.py"]),
        ("tiny replay smoke", [sys.executable, "scripts/smoke_ate.py", "20"]),
        ("flagship bench", [sys.executable, "bench.py"]),
        ("profile artifact", [sys.executable, "scripts/profile_replay.py",
                              "16", "20", "--flagship", "--json",
                              "PROFILE_r03.json"]),
    ]
    failed = []
    for tag, cmd in steps:
        if run(tag, cmd) != 0:
            failed.append(tag)
            if tag in ("kernel lowering smoke", "insert kernel",
                       "assoc kernel"):
                print(f"{tag} FAILED — fix before measuring throughput")
                return 1
    print("\nsweep complete; failed:", failed or "none")
    return 0


if __name__ == "__main__":
    sys.exit(main())
