"""Long-trajectory map scrolling: drive past a full torus period.

The reference survives arbitrarily long trajectories (Street 27.7 GB /
Forest 44 GB bags) by scrolling its cube grid (MapMove,
Map_Manager.cpp:288-581).  Here the torus's modular addressing + key
eviction must do the same: after driving further than one torus period,
old cells alias away and matching must keep working against fresh map
content with bounded memory.
"""

import numpy as np

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic


class Cruise(synthetic.Trajectory):
    """Straight line ramping 0 -> v m/s over `ramp` seconds, then cruising.

    Real logs start gently (the reference's datasets begin near-stationary
    while the IMU initializes); a cold start at full speed against 1 m-
    periodic pillar structure is an association-aliasing trap for any
    LOAM-family scan matcher.
    """

    def __init__(self, v, ramp=2.0):
        super().__init__()
        self.v = v
        self.ramp = ramp

    def _s(self, t):   # distance traveled
        t = np.asarray(t, np.float64)
        a = self.v / self.ramp
        return np.where(t < self.ramp, 0.5 * a * t * t,
                        0.5 * self.v * self.ramp + self.v * (t - self.ramp))

    def pos(self, t):
        s = self._s(t)
        return np.stack([s, np.zeros_like(s), np.zeros_like(s)], axis=-1)

    def vel(self, t):
        t = np.asarray(t, np.float64)
        vx = np.where(t < self.ramp, self.v * t / self.ramp, self.v)
        return np.stack([vx, np.zeros_like(vx), np.zeros_like(vx)], axis=-1)

    def acc(self, t):
        t = np.asarray(t, np.float64)
        ax = np.where(t < self.ramp, self.v / self.ramp, 0.0)
        return np.stack([ax, np.zeros_like(ax), np.zeros_like(ax)], axis=-1)

    def yaw(self, t):
        return np.zeros(np.shape(np.asarray(t)))

    def yaw_dot(self, t):
        return np.zeros(np.shape(np.asarray(t)))


def test_drive_past_torus_period():
    CFG = tiny_config()
    period_x = CFG.map.dim_x * CFG.map.voxel_size      # 38.4 m
    v = 3.0
    n = 160                                            # ~45 m > one period
    # long hall with chunky staggered pillars so every scan sees enough
    # x-facing surface to stay localizable (sv gate needs ~9 x-normals)
    pillars = []
    for k, x in enumerate(range(-5, 66, 5)):
        y0 = -4.5 if k % 2 == 0 else 2.5
        pillars.append(((x - 1.0, y0, -1.3), (x + 1.0, y0 + 2.0, 1.7)))
    world = synthetic.BoxWorld(room_min=(-20.0, -8.0, -1.3),
                               room_max=(70.0, 8.0, 1.7), pillars=pillars)
    scans, gt_R, gt_p = replay.make_sequence(world, Cruise(v), 0.0, n, CFG,
                                             n_az=360)
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, scans, CFG)

    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    assert np.isfinite(p).all()
    assert float(p[-1, 0]) > period_x, "drove past one torus period"

    # stamp-matched ATE: tracking must survive the map wrap-around
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(n)])
    d = np.linalg.norm(err, axis=1)
    rmse = float(np.sqrt((d ** 2).mean()))
    assert rmse < 0.8, f"long-run ATE {rmse}; tail {d[-10:]}"

    # memory truly bounded: the map never exceeds its fixed cell count,
    # and cells near the START have been evicted by the wrap
    occ = float((np.asarray(state.vm_surf.count) > 0).mean())
    assert occ < 1.0
    from mmloam_tpu.ops import voxelmap
    cents, valid = voxelmap.cell_centroids(state.vm_surf, CFG.map)
    cents = np.asarray(cents)[np.asarray(valid)]
    assert cents[:, 0].min() > p[-1, 0] - period_x, \
        "stale cells from before the wrap must be gone"
