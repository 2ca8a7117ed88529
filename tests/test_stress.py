"""Stress suite covering BASELINE.json's four config classes.

VERDICT round-1 item 8: the round-1 worlds were all clean boxes.  Here:
* forest-like feature churn (Forest): randomized clutter world of thin
  pillars — corner features appear/disappear as trunks occlude each other;
* rotation-heavy motion (fast sustained yaw, below the velo_rotate_th 1.5
  publishing gate);
* IMU-noise sweep at datasheet level (BMI088-class, the Horizon's built-in
  IMU) and at the reference's own inflated noise-model level
  (IMUIntegrator.h:79-82 densities x sqrt(200 Hz));
* corridor degeneracy and map growth live in test_degenerate.py /
  test_long_trajectory.py (Corridor / Street classes).
All sequences share tiny-config shapes and scan counts so XLA compiles the
replay program once per process.
"""

import numpy as np

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
import pytest

CFG = tiny_config()
N_SCANS = 25


def _ate(outs, gt_R, gt_p):
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    return float(np.sqrt((err ** 2).sum(1).mean()))


def _replay(world, traj, **kw):
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, 0.0, N_SCANS, CFG, n_az=360, dtype=np.float32, **kw)
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, scans, CFG)
    return outs, _ate(outs, gt_R, gt_p)


def clutter_world(seed=3, n_pillars=40):
    """Forest-like: thin random pillars in a large room."""
    rng = np.random.default_rng(seed)
    pillars = []
    for _ in range(n_pillars):
        cx, cy = rng.uniform(-13, 13), rng.uniform(-9, 9)
        if abs(cx) < 8.5 and abs(cy) < 5.5:
            continue  # keep the trajectory's envelope clear
        r = rng.uniform(0.1, 0.3)
        pillars.append(((cx - r, cy - r, -1.3), (cx + r, cy + r, 1.7)))
    return synthetic.BoxWorld(room_min=(-15.0, -11.0, -1.3),
                              room_max=(15.0, 11.0, 1.7), pillars=pillars)


class Spin(synthetic.Trajectory):
    """Constant fast yaw rate on top of the figure-eight translation."""

    def __init__(self, rate, **kw):
        super().__init__(**kw)
        self._rate = rate

    def yaw(self, t):
        return self._rate * np.asarray(t, np.float64)

    def yaw_dot(self, t):
        return np.full(np.shape(np.asarray(t)), self._rate)


@pytest.mark.slow
def test_forest_feature_churn():
    outs, rmse = _replay(clutter_world(), synthetic.Trajectory(speed=0.8),
                         range_noise=0.003, seed=11)
    assert bool(outs.inited[-1])
    print(f"forest ATE RMSE {rmse:.3f} m")
    assert rmse < 0.25, f"forest ATE RMSE {rmse}"


def test_rotation_heavy():
    # 0.8 rad/s sustained yaw: ~4.6 deg per scan line sweep — hard on
    # undistortion and association, below the 1.5 rad/s failsafe gate
    outs, rmse = _replay(synthetic.default_world(),
                         Spin(0.8, speed=0.6), seed=12)
    assert bool(outs.inited[-1])
    print(f"rotation-heavy ATE RMSE {rmse:.3f} m")
    assert rmse < 0.3, f"rotation-heavy ATE RMSE {rmse}"


def test_imu_noise_sweep():
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8)
    # (gyr sigma rad/s, acc sigma g) per 200 Hz sample: datasheet
    # BMI088-class (the Horizon's built-in IMU), then a harsh 10x level
    # beyond the solver's assumed noise model (IMUIntegrator.h:79-82)
    levels = {"clean": (0.0, 0.0),
              "datasheet": (0.004, 0.003),
              "harsh": (0.04, 0.03)}
    rmses = {}
    for name, (gn, an) in levels.items():
        outs, rmse = _replay(world, traj, imu_noise=(gn, an),
                             range_noise=0.005, seed=13)
        assert bool(outs.inited[-1]), f"{name}: init failed"
        rmses[name] = rmse
    print("noise sweep ATE:", {k: round(v, 3) for k, v in rmses.items()})
    assert rmses["clean"] < 0.2
    assert rmses["datasheet"] < 0.25
    # well beyond the solver's assumed noise; tracking must survive
    # (bounded, not necessarily tight)
    assert rmses["harsh"] < 0.6
