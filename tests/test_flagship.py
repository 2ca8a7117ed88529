"""Flagship-config end-to-end replay (VERDICT round-1 item 5).

Everything else in the suite runs `tiny_config()`; this test replays a
full-scale `LIOConfig()` sequence — 256x256x64 map, 512/2048 stacks,
16x1024 velo + 6x2048 hori dual-lidar scans — end-to-end on CPU, so the
flagship shapes are compile- and accuracy-guarded in CI, not just on the
TPU bench.
"""

import numpy as np
import pytest

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import LIOConfig
from mmloam_tpu.data import synthetic


@pytest.mark.slow
def test_flagship_dual_lidar_replay():
    cfg = LIOConfig()
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.1)
    n_scans = 40
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, 0.0, n_scans, cfg, n_az=cfg.scan.max_pts_per_line,
        seed=7, range_noise=0.003, dtype=np.float32, with_hori=True,
        hori_n_az=cfg.scan.hori_max_pts_per_line)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)

    assert bool(outs.inited[-1]), "flagship config must initialize"
    p = np.array(outs.pose_p)
    assert np.isfinite(p).all()
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    rmse = float(np.sqrt((err ** 2).sum(1).mean()))
    print(f"flagship ATE RMSE {rmse:.3f} m over {n_scans} scans")
    assert rmse < 0.15, f"flagship ATE RMSE {rmse}"

    # bounded, populated maps: the torus holds the hall's surfaces (a few
    # thousand 0.4 m cells), far below capacity (no runaway growth)
    n_cells = cfg.map.dim_x * cfg.map.dim_y * cfg.map.dim_z
    occ_surf = int((np.asarray(state.vm_surf.count) > 0).sum())
    assert 500 < occ_surf < n_cells // 4, occ_surf
    # dual-lidar path actually merged Horizon returns on slow-rotation scans
    assert int(np.asarray(outs.n_surf).max()) > 500
