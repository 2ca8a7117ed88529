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


@pytest.mark.slow
def test_multichip_golden_fresh():
    """The committed multichip phase-1 golden matches the LIVE unsharded
    replay — so the driver's dryrun (which compares its SHARDED run to the
    golden, one compile instead of two) can't silently pass on a stale
    file after source changes.  Regenerate with
    scripts/make_multichip_golden.py.  Tolerance 3e-3: the golden is
    produced under jax_disable_most_optimizations (the dryrun's
    fast-compile mode), which reorders f32 reductions vs this suite's
    default mode (~1e-3 observed on meter-scale poses); real behavior
    changes move poses well past this."""
    import os
    import __graft_entry__ as ge

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "multichip_phase1.npz"))
    assert int(golden["n_scans"]) == ge.PHASE1_SCANS
    assert int(golden["B"]) == ge.PHASE1_B
    bs, bsc = ge.phase1_inputs(CFG)
    _, outs = replay.replay_batch(bs, bsc, CFG)
    err = np.abs(np.asarray(outs.pose_p) - golden["pose_p"]).max()
    assert err < 3e-3, (
        f"multichip golden is stale (divergence {err}); regenerate with "
        "scripts/make_multichip_golden.py")


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
