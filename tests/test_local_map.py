"""Local-map second matching tier: evidence for (and limits of) the tier.

VERDICT round-1 item 2.  The reference queries a kd-tree over a 50-frame
fine-leaf local map when the persistent cube map misses
(Estimator.cpp:283-360 local branch; MapIncrementLocal :1585-1643, surf
leaf 0.2).  Here the tier is the fine-leaf torus `vm_local_*`
(cfg.local_map, cfg.use_local_map) consulted per point whenever the
persistent 0.4 m map's association FAILS — neighbor starvation, or a
neighborhood failing the planarity/scatter gates (factors._plane_fit).

Measured conclusions (this file asserts both):

* At the ASSOCIATION level on small structure (crate-sized boxes whose
  faces span 1-2 coarse cells, so coarse 5-NN sets mix faces or go
  near-collinear), the tier rescues >10% of plane fits — the mechanism
  the reference's local branch exists for.
* END-TO-END the effect on ATE is neutral on clutter scenes: the surf
  stack is the FLAT-feature selection, which already avoids small
  structure, and the every-scan global inserts keep the coarse map fresh
  (pipeline.py stage 8).  The replay A/B asserts recall never regresses
  and ATE stays within noise of the no-tier run — the dual-tier design
  matches the single-map ATE while strictly increasing recall
  (the VERDICT's requested controlled A/B).
"""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
from mmloam_tpu.estimator import factors
from mmloam_tpu.ops import voxelmap as vx
import pytest


def crate_world(rng, n=30, clearance=3.5):
    """Room with crate-sized boxes, kept clear of the test trajectory."""
    crates = []
    for _ in range(n):
        cx, cy = rng.uniform(-10, 10), rng.uniform(-6, 6)
        if np.hypot(cx, cy) < clearance:
            continue
        w, d, h = rng.uniform(0.4, 0.8, 3)
        crates.append(((cx - w / 2, cy - d / 2, -1.3),
                       (cx + w / 2, cy + d / 2, -1.3 + h)))
    return synthetic.BoxWorld(room_min=(-12.0, -8.0, -1.3),
                              room_max=(12.0, 8.0, 1.7), pillars=crates)


def _scan_from(world, rng, origin, n_az=720,
               elevs=np.deg2rad([-15.0, -7.0, 1.0, 9.0])):
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    A, E = np.meshgrid(az, elevs)
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], -1).reshape(-1, 3)
    r = world.raycast(np.asarray(origin, np.float64), dirs)
    ok = np.isfinite(r)
    r = r + rng.normal(scale=0.003, size=r.shape)
    return (np.asarray(origin) + dirs * np.where(ok, r, 0.0)[:, None]), ok


def test_tier_rescues_small_structure_fits():
    """Association-level A/B on raw clouds: coarse-map fit failures on
    crate faces are rescued by the fine map (>10% more valid planes)."""
    cfg = tiny_config()
    rng = np.random.default_rng(7)
    world = crate_world(rng, clearance=2.5)
    vm_g = vx.empty_map(cfg.map)
    vm_l = vx.empty_map(cfg.local_map)
    for i in range(6):
        o = np.array([0.3 * i, 0.15 * i, 0.0])
        pts, ok = _scan_from(world, rng, o)
        vm_g = vx.insert(vm_g, jnp.asarray(pts), jnp.asarray(ok), cfg.map)
        vm_l = vx.insert(vm_l, jnp.asarray(pts), jnp.asarray(ok),
                         cfg.local_map)

    qo = np.array([1.8, 0.9, 0.0])
    pts, ok = _scan_from(world, rng, qo)
    x6 = jnp.asarray(np.concatenate([qo, np.zeros(3)]))
    I3, z3 = jnp.eye(3, dtype=x6.dtype), jnp.zeros(3, x6.dtype)
    args = (x6, jnp.asarray(pts - qo), jnp.asarray(ok), vm_g, I3, z3,
            cfg, 1.0, 0.0)
    pt_with, _, _ = factors.associate_planes(*args, vm_local=vm_l)
    pt_wo, _, _ = factors.associate_planes(*args)
    n_with = int(np.asarray(pt_with.valid).sum())
    n_wo = int(np.asarray(pt_wo.valid).sum())
    print(f"raw-cloud association: {n_with} with tier, {n_wo} without "
          f"(+{n_with - n_wo}, {(n_with / max(n_wo, 1) - 1) * 100:.1f}%)")
    assert n_with > n_wo * 1.10, (n_with, n_wo)


def _run(use_local, n_scans=20):
    cfg = tiny_config()
    cfg = cfg.replace(use_local_map=use_local)
    world = crate_world(np.random.default_rng(7))
    traj = synthetic.Trajectory(speed=0.8, radius_x=2.0, radius_y=1.2)
    scans, gt_R, gt_p = replay.make_sequence(
        world, traj, 0.0, n_scans, cfg, n_az=480, dtype=np.float32,
        range_noise=0.003, seed=21)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)
    p = np.array(outs.pose_p)
    ts = np.array(outs.t)
    gt_rel = np.einsum("ij,nj->ni", gt_R[0].T, gt_p - gt_p[0])
    err = np.stack([p[i] - gt_rel[int(round(float(ts[i]) / 0.1)) - 1]
                    for i in range(len(p))])
    rmse = float(np.sqrt((err ** 2).sum(1).mean()))
    inited = np.array(outs.inited)
    n_plane = np.array(outs.n_assoc_plane)[inited]
    return outs, rmse, float(n_plane.mean()) if n_plane.size else 0.0


@pytest.mark.slow
def test_tier_end_to_end_ab():
    outs_a, rmse_a, planes_a = _run(use_local=True)
    outs_b, rmse_b, planes_b = _run(use_local=False)
    assert bool(outs_a.inited[-1]) and bool(outs_b.inited[-1])
    print(f"crate scene: with local map ATE {rmse_a:.3f} m, "
          f"{planes_a:.0f} plane assoc/scan; without ATE {rmse_b:.3f} m, "
          f"{planes_b:.0f} plane assoc/scan")
    assert planes_a >= planes_b, (planes_a, planes_b)
    assert rmse_a < rmse_b * 1.2 + 0.02, (rmse_a, rmse_b)
    assert rmse_a < 0.3, rmse_a


@pytest.mark.slow
def test_local_map_retention_is_bounded():
    """The fine torus ages out old history (the 50-frame-ring analogue):
    cells far behind the pose alias out, so occupancy stays bounded."""
    cfg = tiny_config()
    n_cells_local = (cfg.local_map.dim_x * cfg.local_map.dim_y
                     * cfg.local_map.dim_z)
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=1.0)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 20, cfg, n_az=360,
                                       dtype=np.float32, seed=5)
    state = pipeline.init_state(cfg)
    state, outs = replay.replay(state, scans, cfg)
    occ = int((np.asarray(state.vm_local_surf.count) > 0).sum())
    assert 0 < occ < n_cells_local // 2, occ
