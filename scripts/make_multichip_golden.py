"""Regenerate the multichip phase-1 golden (unsharded reference poses).

Runs the UNSHARDED batch replay of __graft_entry__.phase1_inputs under the
exact dryrun CPU config (same backend, same fast-compile mode) and commits
the resulting poses to tests/golden/multichip_phase1.npz.  The driver's
dryrun_multichip then needs only ONE XLA:CPU compile (the sharded program)
to prove sharded == unsharded — the second compile used to blow the
driver's wall budget on this 1-core box (MULTICHIP_r03.json rc:124).

RUN THIS whenever pipeline/estimator/map sources change, then commit the
npz together with the change.  tests/test_batch_replay.py::test_multichip_
golden_fresh fails if the golden drifts from the live unsharded replay.

    python scripts/make_multichip_golden.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def main():
    t0 = time.monotonic()
    ge.dryrun_cpu_config(8)

    import jax

    from mmloam_tpu import replay
    from mmloam_tpu.config import tiny_config

    cfg = tiny_config()
    batch_state, batch_scans = ge.phase1_inputs(cfg)
    _, outs = replay.replay_batch(batch_state, batch_scans, cfg)
    pose_p = np.asarray(outs.pose_p)
    assert np.isfinite(pose_p).all()
    inited = np.asarray(outs.inited)
    assert inited[-1].all(), f"golden run must init all lanes: {inited[-1]}"

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden",
        "multichip_phase1.npz")
    if "--check" in sys.argv:
        # freshness mode (tests/test_batch_replay.py): recompute under the
        # EXACT generation config and compare to the committed npz.  Same
        # mode + same inputs + XLA:CPU determinism => matches to f32
        # exactness; any real source-behavior change shows up full-size
        # (the default-mode vs disable-most-optimizations delta is ~3e-2
        # at these shapes, so cross-mode comparison can't distinguish
        # drift from noise — measured r5).
        golden = np.load(out)
        err = np.abs(pose_p - golden["pose_p"]).max()
        print(f"check: divergence {err:.2e}  wall "
              f"{time.monotonic() - t0:.1f}s")
        assert err < 1e-5, (
            f"multichip golden is stale (divergence {err}); regenerate "
            "with scripts/make_multichip_golden.py")
        return
    np.savez(out, pose_p=pose_p, n_scans=ge.PHASE1_SCANS, B=ge.PHASE1_B)
    print(f"wrote {out}  shape {pose_p.shape}  "
          f"final x {pose_p[-1, :, 0].round(3).tolist()}  "
          f"wall {time.monotonic() - t0:.1f}s")


if __name__ == "__main__":
    main()
