"""Scene design probe: measure local-tier association rescue on clutter worlds."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_cpu_parallel_codegen_split_count=1").strip()
import sys
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
from mmloam_tpu.estimator import factors
from mmloam_tpu.ops import voxelmap as vx

cfg = tiny_config()
rng = np.random.default_rng(7)


def crate_world(n=30, lo=0.4, hi=0.8):
    crates = []
    for _ in range(n):
        cx, cy = rng.uniform(-10, 10), rng.uniform(-6, 6)
        if np.hypot(cx, cy) < 2.5:
            continue
        w, d, h = rng.uniform(lo, hi, 3)
        crates.append(((cx - w / 2, cy - d / 2, -1.3),
                       (cx + w / 2, cy + d / 2, -1.3 + h)))
    return synthetic.BoxWorld(room_min=(-12.0, -8.0, -1.3),
                              room_max=(12.0, 8.0, 1.7), pillars=crates)


def scan_from(world, origin, n_az=720, elevs=np.deg2rad([-15, -7, 1, 9])):
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    A, E = np.meshgrid(az, elevs)
    dirs = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                     np.sin(E)], -1).reshape(-1, 3)
    r = world.raycast(np.asarray(origin, np.float64), dirs)
    ok = np.isfinite(r)
    r = r + rng.normal(scale=0.003, size=r.shape)
    return (np.asarray(origin) + dirs * np.where(ok, r, 0.0)[:, None]), ok


world = crate_world()
vm_g = vx.empty_map(cfg.map)
vm_l = vx.empty_map(cfg.local_map)
# build maps from 6 nearby poses
for i in range(6):
    o = np.array([0.3 * i, 0.15 * i, 0.0])
    pts, ok = scan_from(world, o)
    vm_g = vx.insert(vm_g, jnp.asarray(pts), jnp.asarray(ok), cfg.map)
    vm_l = vx.insert(vm_l, jnp.asarray(pts), jnp.asarray(ok), cfg.local_map)

# query scan from a new pose
qo = np.array([1.8, 0.9, 0.0])
pts, ok = scan_from(world, qo)
p_l = pts - qo                      # lidar frame (identity rotation)
x6 = jnp.asarray(np.concatenate([qo, np.zeros(3)]))
I3, z3 = jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64)

for thres in (1.0,):
    pt_a, _, _ = factors.associate_planes(x6, jnp.asarray(p_l),
                                          jnp.asarray(ok), vm_g, I3, z3, cfg,
                                          thres, 0.0, vm_local=vm_l)
    pt_b, _, _ = factors.associate_planes(x6, jnp.asarray(p_l),
                                          jnp.asarray(ok), vm_g, I3, z3, cfg,
                                          thres, 0.0)
    va, vb = np.array(pt_a.valid), np.array(pt_b.valid)
    # split by whether the point is on a crate (z below crate tops & inside room)
    on_wall = (np.abs(pts[:, 0]) > 11.5) | (np.abs(pts[:, 1]) > 7.5) \
        | (pts[:, 2] < -1.25) | (pts[:, 2] > 1.65)
    crate = ok & ~on_wall
    print(f"thres={thres}: total {ok.sum()}  with-tier {va.sum()} "
          f"without {vb.sum()}  (+{va.sum() - vb.sum()})")
    print(f"  crate pts {crate.sum()}: with {va[crate].sum()} "
          f"without {vb[crate].sum()}")
    print(f"  wall pts: with {va[ok & on_wall].sum()} "
          f"without {vb[ok & on_wall].sum()}")
