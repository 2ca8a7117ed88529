"""Batched + mesh-sharded replay on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import export, synthetic
from mmloam_tpu.ops import voxelmap
import pytest

CFG = tiny_config()


def make_batch(B, n=8):
    world = synthetic.default_world()
    seqs, states = [], []
    for b in range(B):
        traj = synthetic.Trajectory(speed=0.5 + 0.1 * b, yaw_rate=0.1 * b)
        scans, _, _ = replay.make_sequence(world, traj, 0.0, n, CFG,
                                           n_az=360, seed=b)
        seqs.append(scans)
        states.append(pipeline.init_state(CFG))
    return replay.stack_states(states), replay.stack_sequences(seqs), seqs


@pytest.mark.slow
def test_batched_matches_individual():
    bs, bsc, seqs = make_batch(2, n=6)
    _, bouts = replay.replay_batch(bs, bsc, CFG)
    for b in range(2):
        _, o = replay.replay(pipeline.init_state(CFG), seqs[b], CFG)
        # vmapped programs reassociate f32 reductions, and a sub-ulp cost
        # difference can flip an LM accept decision, so agreement is
        # qualitative (mm on a ~0.3 m path), not bitwise
        np.testing.assert_allclose(np.array(bouts.pose_p[:, b]),
                                   np.array(o.pose_p), atol=1e-2)


@pytest.mark.slow
def test_sharded_over_mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    mesh = Mesh(np.array(jax.devices()), ("seq",))
    bs, bsc, seqs = make_batch(8, n=5)
    st, bouts = replay.replay_batch(bs, bsc, CFG, mesh=mesh)
    assert bouts.pose_p.shape == (5, 8, 3)
    assert bool(jnp.isfinite(bouts.pose_p).all())
    # result actually sharded across devices
    assert len(bouts.pose_p.sharding.device_set) == 8


def test_multichip_golden_exists():
    """UNMARKED (fast) tripwire: the committed multichip golden must exist
    and carry the workload metadata the driver's dryrun expects — so a
    missing or metadata-stale golden fails every default test run in
    seconds, not only the slow-marked numeric freshness check below
    (which is exactly the failure that shipped in round 4)."""
    import os
    import __graft_entry__ as ge

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "multichip_phase1.npz")
    assert os.path.exists(path), (
        "tests/golden/multichip_phase1.npz missing — regenerate with "
        "scripts/make_multichip_golden.py and commit it")
    golden = np.load(path)
    assert int(golden["n_scans"]) == ge.PHASE1_SCANS
    assert int(golden["B"]) == ge.PHASE1_B
    assert golden["pose_p"].shape == (ge.PHASE1_SCANS, ge.PHASE1_B, 3)
    assert np.isfinite(golden["pose_p"]).all()


@pytest.mark.slow
def test_multichip_golden_fresh():
    """The committed multichip phase-1 golden matches the LIVE unsharded
    replay — so the driver's dryrun (which compares its SHARDED run to
    the golden, one compile instead of two) can't silently pass on a
    stale file after source changes.  Runs scripts/make_multichip_golden
    --check in a SUBPROCESS so the comparison happens under the exact
    generation mode (jax_disable_most_optimizations): same-mode XLA:CPU
    replay is deterministic, so the tolerance is 1e-5 and any real
    source-behavior change shows up full-size.  (An in-process
    cross-mode comparison has a ~3e-2 noise floor — measured r5 — which
    would drown real drift.)"""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "make_multichip_golden.py"),
         "--check"], cwd=root, env=env, capture_output=True, text=True,
        timeout=1500)
    assert r.returncode == 0, (
        f"golden freshness check failed:\n{r.stdout[-2000:]}\n"
        f"{r.stderr[-2000:]}")


@pytest.mark.slow
def test_sharded_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume at the scale §2.4 advertises: a MESH-SHARDED
    batch replay state survives save -> restore -> reshard bitwise, and
    the restored state steps again under the same mesh (the realistic
    long-replay resume case — the reference loses everything on a crash,
    SURVEY.md §5.4).  Uses the same shapes as test_sharded_over_mesh so
    the replay program compile is shared within a suite run."""
    from jax.sharding import NamedSharding, PartitionSpec
    from mmloam_tpu import checkpoint

    mesh = Mesh(np.array(jax.devices()), ("seq",))
    bs, bsc, _ = make_batch(8, n=5)
    st, _ = replay.replay_batch(bs, bsc, CFG, mesh=mesh)
    assert len(st.vm_surf.cells.sharding.device_set) == 8

    path = tmp_path / "sharded.npz"
    checkpoint.save(path, st)                 # gathers across the mesh
    template = replay.stack_states([pipeline.init_state(CFG)
                                    for _ in range(8)])
    restored = checkpoint.restore(path, template)

    # reshard each leaf exactly as the live state was sharded
    restored = jax.tree.map(
        lambda r, live: jax.device_put(r, live.sharding), restored, st)
    assert len(restored.vm_surf.cells.sharding.device_set) == 8
    mismatch = jax.tree.map(
        lambda a, b: float(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32)).max())
        if a.size else 0.0, restored, st)
    assert max(jax.tree.leaves(mismatch)) == 0.0, mismatch

    # the restored sharded state must actually STEP (cached program)
    _, bsc2, _ = make_batch(8, n=5)
    st2, outs2 = replay.replay_batch(restored, bsc2, CFG, mesh=mesh)
    assert bool(jnp.isfinite(outs2.pose_p).all())
    assert len(st2.vm_surf.cells.sharding.device_set) == 8


def test_map_and_trajectory_export(tmp_path):
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 6, CFG, n_az=360)
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, scans, CFG)

    n = export.save_map_pcd(tmp_path / "map.pcd", state.vm_surf, CFG.map)
    assert n > 100
    head = (tmp_path / "map.pcd").read_text().splitlines()
    assert head[0].startswith("# .PCD")
    assert f"POINTS {n}" in "\n".join(head[:11])

    export.save_trajectory_tum(tmp_path / "traj.tum", np.array(outs.t),
                               np.array(outs.pose_p), np.array(outs.pose_q))
    ts, pos, q = export.load_trajectory_tum(tmp_path / "traj.tum")
    np.testing.assert_allclose(pos, np.array(outs.pose_p), atol=1e-5)
    np.testing.assert_allclose(np.abs((q * np.array(outs.pose_q)).sum(1)),
                               1.0, atol=1e-5)
