"""Initializer tests: recover gravity, velocities, biases on synthetic IMU."""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu import lie
from mmloam_tpu.data import synthetic
from mmloam_tpu.estimator.initializer import initialize
from mmloam_tpu.ops.preintegration import preintegrate

CFG = tiny_config()
G = 9.805


def keyframe_problem(bg, ba, tilt=(0.0, 0.0, 0.0), rate=400.0, K=3,
                     spacing=0.3):
    """Build K keyframes with exact poses and preintegrations between them.

    `tilt` tilts gravity in the odometry frame (the rig starts non-level),
    so the solver must recover a nontrivial r_wg.
    """
    traj = synthetic.Trajectory(speed=1.2)
    R_tilt = np.array(lie.exp_matrix(jnp.asarray(np.asarray(tilt, np.float64))))
    g_odom = R_tilt @ np.array([0.0, 0.0, -G])
    ts = 1.0 + spacing * np.arange(K)

    kf_P = np.stack([traj.pos(t) for t in ts])
    kf_Q = np.stack([np.array(lie.matrix_to_quat(jnp.asarray(traj.rot(t))))
                     for t in ts])

    M = 256
    out = {k: [] for k in ("dq", "dp", "dv", "jac", "cov", "dt", "bg", "ba")}
    for k in out:
        out[k].append(None)  # slot 0 unused
    for i in range(1, K):
        # IMU in the BODY frame is invariant to the world tilt except
        # gravity direction — simulate_imu gives the untilted-world truth,
        # which corresponds to gravity being tilted in the odometry frame.
        acc, gyr, tss = synthetic.simulate_imu(traj, ts[i - 1], ts[i],
                                               rate=rate, bg=bg,
                                               ba=np.asarray(ba) * G,
                                               g_vec=g_odom)
        dts = np.diff(np.concatenate([[ts[i - 1]], tss]))
        pad = lambda a: np.pad(a, [(0, M - a.shape[0])] + [(0, 0)] * (a.ndim - 1))
        mask = np.arange(M) < len(tss)
        r = preintegrate(jnp.asarray(pad(acc)), jnp.asarray(pad(gyr)),
                         jnp.asarray(pad(dts)), jnp.asarray(mask),
                         jnp.zeros(3), jnp.zeros(3), CFG.imu)
        for k, v in zip(("dq", "dp", "dv", "jac", "cov", "dt"),
                        (r.dq, r.dp, r.dv, r.jac, r.cov, r.dtime)):
            out[k].append(np.array(v))
        out["bg"].append(np.zeros(3))
        out["ba"].append(np.zeros(3))
    for k in out:
        out[k][0] = np.zeros_like(out[k][1])
        out[k] = jnp.asarray(np.stack(out[k]))

    # negated average specific force over the first interval (per :428)
    acc0, _, _ = synthetic.simulate_imu(traj, ts[0], ts[0] + 0.15, rate=rate,
                                        bg=bg, ba=np.asarray(ba) * G,
                                        g_vec=g_odom)
    avg_acc = jnp.asarray(-(acc0.mean(0) * G))
    return jnp.asarray(kf_P), jnp.asarray(kf_Q), avg_acc, out, traj, ts, R_tilt


def test_init_recovers_gravity_and_velocity():
    kf_P, kf_Q, avg, preint9, traj, ts, R_tilt = keyframe_problem(
        bg=np.zeros(3), ba=np.zeros(3), tilt=(0.05, -0.08, 0.0))
    res = initialize(kf_P, kf_Q, avg, preint9, G,
                     jnp.eye(3, dtype=jnp.float64), jnp.zeros(3))
    assert bool(res.ok)
    g_expect = R_tilt @ np.array([0.0, 0.0, -G])
    np.testing.assert_allclose(np.array(res.gravity), g_expect, atol=0.05)
    v_expect = traj.vel(ts[1])
    np.testing.assert_allclose(np.array(res.v[1]), v_expect, atol=0.05)
    assert np.linalg.norm(np.array(res.bg)) < 0.01
    assert np.linalg.norm(np.array(res.ba)) < 0.05


def test_init_recovers_gyro_bias():
    bg_true = np.array([0.02, -0.01, 0.015])
    kf_P, kf_Q, avg, preint9, traj, ts, R_tilt = keyframe_problem(
        bg=bg_true, ba=np.zeros(3))
    res = initialize(kf_P, kf_Q, avg, preint9, G,
                     jnp.eye(3, dtype=jnp.float64), jnp.zeros(3))
    assert bool(res.ok)
    # the strong bias prior (sqrt-info 4000, unionPoseEstimation.cpp:515)
    # against only K-1=2 short factors shrinks the estimate toward zero —
    # reference behavior; assert direction + meaningful recovery, and that
    # the sliding window would start from a better point than zero.
    bg = np.array(res.bg)
    assert np.all(np.sign(bg) == np.sign(bg_true))
    assert np.linalg.norm(bg - bg_true) < 0.75 * np.linalg.norm(bg_true)


def test_init_rejects_garbage():
    kf_P, kf_Q, avg, preint9, traj, ts, R_tilt = keyframe_problem(
        bg=np.zeros(3), ba=np.zeros(3))
    # corrupt the relative positions wildly -> velocity gate must trip
    res = initialize(kf_P + jnp.asarray(np.array([[0.0] * 3, [5.0, 0, 0],
                                                  [-7.0, 3, 0]])),
                     kf_Q, avg, preint9, G,
                     jnp.eye(3, dtype=jnp.float64), jnp.zeros(3))
    assert not bool(res.ok)
