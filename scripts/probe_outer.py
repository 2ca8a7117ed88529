"""Replicate the short-window outer loop with plain unweighted GN."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_cpu_parallel_codegen_split_count=1").strip()
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import test_solver as T
from mmloam_tpu.data import synthetic
T.synthetic = synthetic
from mmloam_tpu import lie
from mmloam_tpu.estimator import factors

rng = np.random.default_rng(0)
world, vm_surf, vm_corner = T.build_world_maps(rng, n=30000)
R_gt = np.array(lie.exp_matrix(jnp.array([0.02, -0.03, 0.4])))
t_gt = np.array([1.0, -0.5, 0.2])
p_l, ok = T.scan_points(world, R_gt, t_gt, rng)
x_gt = T.x_from_pose(R_gt, t_gt)[:6]

dx0 = np.array([0.08, -0.06, 0.04, 0.01, -0.015, 0.02])
x = x_gt + dx0


def gn_step(x, S, a, q, iters=8):
    x = np.array(x, np.float64)
    for _ in range(iters):
        R = np.array(lie.exp_matrix(jnp.asarray(x[3:6])))
        Jr = np.array(lie.right_jacobian(jnp.asarray(x[3:6])))
        pwx = a @ R.T + x[0:3]
        r = np.einsum("kij,kj->ki", S, pwx - q)
        Jrot = -np.einsum("kij,kjl,lm->kim", S,
                          np.cross(np.eye(3)[None], (a @ R.T)[:, None, :]),
                          Jr)
        J = np.concatenate([S, Jrot], axis=2).reshape(-1, 6)
        dx, *_ = np.linalg.lstsq(J, -r.reshape(-1), rcond=None)
        x[0:3] += dx[0:3]
        x[3:6] += dx[3:6]
    return x


for thres in [25.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0]:
    pt, _, _ = factors.associate_planes(
        jnp.asarray(x), jnp.asarray(p_l), jnp.asarray(ok), vm_surf,
        T.RBL, T.TBL, T.CFG, thres, 0.0)
    valid = np.array(pt.valid)
    S = np.array(pt.sqrt_info)[valid]
    a = np.array(p_l)[valid]
    q = np.array(pt.proj)[valid]
    x = gn_step(x, S, a, q)
    print(f"thres {thres:5.1f}: n {valid.sum():4d}  "
          f"err_t {np.linalg.norm(x[0:3] - t_gt):.4f}  "
          f"err_r {np.linalg.norm(x[3:6] - x_gt[3:6]):.4f}")

print("fixed point delta:", np.round(x - x_gt, 4))

# analyze fits at the fixed point: how far is each proj from a true surface?
pt, _, _ = factors.associate_planes(
    jnp.asarray(x), jnp.asarray(p_l), jnp.asarray(ok), vm_surf,
    T.RBL, T.TBL, T.CFG, 1.0, 0.0)
valid = np.array(pt.valid)
proj = np.array(pt.proj)[valid]
omega = np.array(pt.omega if hasattr(pt, "omega") else pt.sqrt_info)[valid]

# distance of proj to the hall's true surfaces (walls/floor/ceiling/pillars)
def surf_dist(p):
    import itertools
    w = T.synthetic.default_world()
    d = []
    rmin, rmax = w.room_min, w.room_max
    for ax in range(3):
        d.append(abs(p[ax] - rmin[ax]))
        d.append(abs(p[ax] - rmax[ax]))
    for pmin, pmax in w.pillars:
        inside_yz = all(pmin[a] - 0.0 <= p[a] <= pmax[a] for a in range(3))
        for ax in range(3):
            lo = [pmin[a] <= p[a] <= pmax[a] for a in range(3) if a != ax]
            if all(lo):
                d.append(abs(p[ax] - pmin[ax]))
                d.append(abs(p[ax] - pmax[ax]))
    return min(d)

sd = np.array([surf_dist(p) for p in proj])
print(f"proj-to-true-surface: median {np.median(sd):.4f} p90 "
      f"{np.percentile(sd, 90):.4f} frac>2cm {(sd > 0.02).mean():.3f}")
# where are the biased ones?
bad = sd > 0.02
print("bad fit count:", bad.sum(), " their mean |proj|:",
      np.abs(proj[bad]).mean(0).round(2) if bad.any() else None)
