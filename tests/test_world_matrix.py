"""Scene x mode ATE matrix (VERDICT r2 item 5).

Three geometry classes matching the reference's dataset families
(README.md:67-75): the pillar hall (Hall/Office-like), a corridor network
(Corridor — long degenerate stretches), and a cluttered multi-room office.
Each replayed end-to-end in BOTH default and reference-faithful mode, with
per-(scene, mode) ATE bounds earned from measurement (scripts/
scene_matrix.py, re-measured 2026-08-20 after the re-deskew + keyframe
factor seeding + bf16 blocks round: hall 0.018/0.028, corridor
0.100/0.181, office 0.018/0.026 default/faithful) with ~50% headroom.
"""

import numpy as np
import pytest

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import faithful_config, tiny_config
from mmloam_tpu.data import synthetic


def _ate(outs, gt_R, gt_p, period=0.1):
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / period)) - 1]
                    for i in range(len(p))])
    return float(np.sqrt((err ** 2).sum(1).mean()))


# scene -> (world, trajectory, {mode: ATE bound})
SCENES = {
    "hall": (lambda: synthetic.default_world(),
             dict(speed=0.8), dict(default=0.04, faithful=0.06)),
    "corridor": (lambda: synthetic.corridor_world(),
                 dict(speed=2.0, radius_x=16.0, radius_y=0.8,
                      yaw_rate=0.08, z_amp=0.05),
                 dict(default=0.15, faithful=0.25)),
    "office": (lambda: synthetic.office_world(),
               dict(speed=0.8, radius_x=5.5, radius_y=2.5, z_amp=0.1),
               dict(default=0.04, faithful=0.06)),
}


@pytest.mark.slow
@pytest.mark.parametrize("scene", sorted(SCENES))
@pytest.mark.parametrize("mode", ["default", "faithful"])
def test_scene_mode_matrix(scene, mode):
    world_fn, traj_kw, bounds = SCENES[scene]
    bound = bounds[mode]
    cfg = tiny_config()
    if mode == "faithful":
        cfg = faithful_config(cfg)
    scans, gt_R, gt_p = replay.make_sequence(
        world_fn(), synthetic.Trajectory(**traj_kw), t0=0.0, n_scans=25,
        cfg=cfg, n_az=360, range_noise=0.004, dtype=np.float32)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)
    assert bool(outs.inited[-1]), f"{scene}/{mode} failed to initialize"
    rmse = _ate(outs, gt_R, gt_p)
    print(f"{scene}/{mode}: ATE RMSE {rmse:.3f} m (bound {bound})")
    assert rmse < bound, f"{scene}/{mode} ATE {rmse:.3f} >= {bound}"
    assert np.isfinite(np.array(outs.pose_p)).all()
