"""Dual-lidar fusion: Horizon merge gates and rotation failsafes."""

import dataclasses

import numpy as np

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
import pytest

BASE = tiny_config()
# the synthetic hall yields fewer Horizon corners than a real scene; scale
# the merge gate accordingly
CFG = BASE.replace(solver=dataclasses.replace(BASE.solver,
                                              corner_cnt_gate_hori=5))


def run(traj, n=10, cfg=CFG, **kw):
    world = synthetic.default_world()
    scans, gt_R, gt_p = replay.make_sequence(world, traj, 0.0, n, cfg,
                                             n_az=360, with_hori=True,
                                             hori_n_az=512, **kw)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)
    return outs, gt_R, gt_p


@pytest.mark.slow
def test_hori_merges_when_slow():
    outs, gt_R, gt_p = run(synthetic.Trajectory(speed=0.8, yaw_rate=0.05))
    merged = np.array(outs.hori_merged)
    assert merged[1:].mean() > 0.7, f"merge rate {merged}"
    assert not np.array(outs.fast_rotation).any()
    # trajectory still tracked with the fused cloud
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    assert np.sqrt((err ** 2).sum(1).mean()) < 0.3


@pytest.mark.slow
def test_fast_rotation_gates():
    # constant 2 rad/s spin > velo_rotate_th (1.5): fast-rotation flag set
    # and the Horizon merge suppressed
    class Spinner(synthetic.Trajectory):
        def yaw(self, t):
            return 2.0 * np.asarray(t, np.float64)

        def yaw_dot(self, t):
            return np.full(np.shape(np.asarray(t)), 2.0)

    outs, _, _ = run(Spinner(speed=0.3), n=8)
    fr = np.array(outs.fast_rotation)
    merged = np.array(outs.hori_merged)
    assert fr.any(), "fast rotation should be detected"
    # scans flagged fast must never merge (hori_rotate_th << velo_rotate_th)
    assert not (merged & fr).any()


@pytest.mark.slow
def test_velo_only_mode_ignores_hori():
    cfg = CFG.replace(velo_only_mode=True)
    outs, _, _ = run(synthetic.Trajectory(speed=0.8, yaw_rate=0.05), cfg=cfg)
    assert not np.array(outs.hori_merged).any()
