"""Reference-faithful settings still track (VERDICT round-1 item 3).

The engine's defaults include deliberate, individually-justified
improvements over the reference (full-kinematic prediction, bounded
marginalization sigma, scatter-rank gate, online gravity refinement, weak
gravity prior, association refresh).  `config.faithful_config` flips every
one back to the reference's exact behavior (citations there); this test
replays the hall fixture in that mode end-to-end and asserts it still
initializes and tracks — demonstrating the improvements are opt-in
refinements, not load-bearing crutches.
"""

import numpy as np

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import faithful_config, tiny_config
from mmloam_tpu.data import synthetic
import pytest


@pytest.mark.slow
def test_faithful_mode_tracks():
    cfg = faithful_config(tiny_config())
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8)
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, t0=0.0, n_scans=25, cfg=cfg, n_az=360,
        dtype=np.float32)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)

    assert bool(outs.inited[-1]), "faithful mode must still initialize"
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    rmse = float(np.sqrt((err ** 2).sum(1).mean()))
    print(f"faithful-mode ATE RMSE {rmse:.3f} m")
    # looser bound than the default-mode 0.15 m: the faithful settings
    # reintroduce the reference's prediction bias and frozen associations
    assert rmse < 0.5, f"faithful-mode ATE RMSE {rmse}"
    assert np.isfinite(p).all()
