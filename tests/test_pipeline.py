"""End-to-end pipeline tests on short synthetic sequences (CPU, tiny cfg)."""

import numpy as np
import jax
import jax.numpy as jnp

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
import pytest

CFG = tiny_config()


def run_sequence(n_scans=20, speed=0.8, **kw):
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=speed)
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, t0=0.0, n_scans=n_scans, cfg=CFG, n_az=360,
        dtype=np.float32, **kw)
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, scans, CFG)
    return state, outs, gt_R, gt_p


@pytest.mark.slow
def test_lio_tracks_trajectory():
    state, outs, gt_R, gt_p = run_sequence(n_scans=25)
    # init must have happened (keyframes every 3 scans, 3 keyframes + solve)
    assert bool(outs.inited[-1]), "IMU init should succeed within 25 scans"
    # stamp-matched ATE (published poses are the smoothed front frame, so
    # stamps repeat during warmup; match each publication to its stamp)
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    rmse = float(np.sqrt((err ** 2).sum(1).mean()))
    assert rmse < 0.15, f"ATE RMSE {rmse}"
    assert np.isfinite(p).all()


@pytest.mark.slow
def test_pipeline_is_scan_invariant():
    """Replaying via lax.scan must match step-by-step Python iteration."""
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 6, CFG, n_az=360)
    s1 = pipeline.init_state(CFG)
    _, outs_scan = replay.replay(s1, scans, CFG)

    s2 = pipeline.init_state(CFG)
    step = jax.jit(lambda s, sc: pipeline.step(s, sc, CFG))
    ps = []
    for i in range(6):
        sc = jax.tree.map(lambda a: a[i], scans)
        s2, o = step(s2, sc)
        ps.append(np.array(o.pose_p))
    np.testing.assert_allclose(np.array(outs_scan.pose_p), np.stack(ps),
                               atol=1e-5)


@pytest.mark.slow
def test_static_scans_stay_put():
    """Zero motion + clean IMU -> pose stays at origin."""
    world = synthetic.default_world()

    class Still(synthetic.Trajectory):
        def pos(self, t):
            return np.zeros(np.shape(np.asarray(t)) + (3,))

        def vel(self, t):
            return np.zeros(np.shape(np.asarray(t)) + (3,))

        def acc(self, t):
            return np.zeros(np.shape(np.asarray(t)) + (3,))

        def yaw(self, t):
            return np.zeros(np.shape(np.asarray(t)))

        def yaw_dot(self, t):
            return np.zeros(np.shape(np.asarray(t)))

    scans, gt_R, gt_p = replay.make_sequence(world, Still(), 0.0, 14, CFG,
                                             n_az=360)
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, scans, CFG)
    drift = np.linalg.norm(np.array(outs.pose_p), axis=1)
    # warmup (short-window, thres 25 round) jitters at the cm level — the
    # same accuracy class as the reference's short-window mode; once the
    # full window + marginalization engage the pose must lock down
    assert drift.max() < 0.12, f"warmup drift {drift}"
    assert bool(outs.inited[-1])
    assert drift[10:].max() < 0.05, f"steady static drift {drift}"


@pytest.mark.slow
def test_nonfeature_path():
    """cfg.use_nonfeature maintains the non-feature map and solves with the
    extra 1-dim plane factors (processNonFeatureICP parity)."""
    cfg = CFG.replace(use_nonfeature=True)
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 8, cfg, n_az=360)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)
    assert np.isfinite(np.array(outs.pose_p)).all()
    # the non-feature map accumulated cells (one move-gated insertion of
    # the 64-cap tiny-config stack over this short path)
    assert float(state.vm_non.count.sum()) >= 50
    # trajectory quality comparable to the default path
    drift = np.linalg.norm(np.array(outs.pose_p)[-1]
                           - np.array(outs.pose_p)[0])
    assert drift < 2.0
