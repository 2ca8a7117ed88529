"""Checkpoint round-trip: save mid-sequence, restore, identical continuation."""

import numpy as np
import jax
import pytest

from mmloam_tpu import checkpoint, metrics, pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic

CFG = tiny_config()


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.15)
    scans, gt_R, gt_p = replay.make_sequence(world, traj, 0.0, 12, CFG,
                                             n_az=360, dtype=np.float32)
    first = jax.tree.map(lambda a: a[:6], scans)
    rest = jax.tree.map(lambda a: a[6:], scans)

    state = pipeline.init_state(CFG)
    state, _ = replay.replay(state, first, CFG)

    path = tmp_path / "ckpt.npz"
    checkpoint.save(path, state)
    restored = checkpoint.restore(path, pipeline.init_state(CFG))

    s1, o1 = replay.replay(state, rest, CFG)
    s2, o2 = replay.replay(restored, rest, CFG)
    np.testing.assert_allclose(np.array(o1.pose_p), np.array(o2.pose_p),
                               atol=1e-6)
    np.testing.assert_array_equal(np.array(o1.inited), np.array(o2.inited))

    # metrics over the full run work on the outputs
    m = metrics.ate(np.array(o2.pose_p), np.array(o2.t),
                    gt_p, gt_R, 0.1 + 0.1 * np.arange(12))
    assert np.isfinite(m.ate_rmse)
    tel = metrics.run_telemetry(o2)
    assert tel["n_scans"] == 6


def test_restore_rejects_wrong_config(tmp_path):
    import dataclasses
    import pytest

    state = pipeline.init_state(CFG)
    path = tmp_path / "c.npz"
    checkpoint.save(path, state)
    other = CFG.replace(solver=dataclasses.replace(CFG.solver, window=4))
    with pytest.raises((ValueError, KeyError)):
        checkpoint.restore(path, pipeline.init_state(other))
