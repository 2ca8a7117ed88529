"""Preintegration tests against a plain-numpy transliteration of the math and
against analytic closed forms on synthetic motions."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from mmloam_tpu.config import ImuConfig
from mmloam_tpu.ops import preintegration as pi
import pytest

CFG = ImuConfig(max_samples=32)
RNG = np.random.default_rng(1)


def numpy_preintegration(acc, gyr, dt, bg, ba, cfg):
    """Direct numpy port of the recurrence (IMUIntegrator.cpp:108-166)."""
    dq = Rotation.identity()
    dp = np.zeros(3)
    dv = np.zeros(3)
    cov = np.zeros((15, 15))
    jac = np.eye(15)
    noise = np.zeros((12, 12))
    noise[0:3, 0:3] = np.eye(3) * cfg.gyr_n**2
    noise[3:6, 3:6] = np.eye(3) * cfg.acc_n**2
    noise[6:9, 6:9] = np.eye(3) * cfg.gyr_w**2
    noise[9:12, 9:12] = np.eye(3) * cfg.acc_w**2

    def hat(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    for a_raw, w_raw, h in zip(acc, gyr, dt):
        a = a_raw * cfg.gnorm - ba
        w = w_raw - bg
        h2 = h * h
        w_dt = w * h
        dR = Rotation.from_rotvec(w_dt).as_matrix()
        n = np.linalg.norm(w_dt)
        if n > 1e-5:
            k = w_dt / n
            K = hat(k)
            Jr = np.eye(3) - (1 - np.cos(n)) / n * K + (1 - np.sin(n) / n) * K @ K
        else:
            Jr = np.eye(3)
        Rk = dq.as_matrix()
        A = np.eye(15)
        A[0:3, 3:6] = -0.5 * Rk @ hat(a) * h2
        A[0:3, 6:9] = np.eye(3) * h
        A[0:3, 12:15] = -0.5 * Rk * h2
        A[3:6, 3:6] = dR.T
        A[3:6, 9:12] = -Jr * h
        A[6:9, 3:6] = -Rk @ hat(a) * h
        A[6:9, 12:15] = -Rk * h
        B = np.zeros((15, 12))
        B[0:3, 3:6] = 0.5 * Rk * h2
        B[3:6, 0:3] = Jr * h
        B[6:9, 3:6] = Rk * h
        B[9:12, 6:9] = np.eye(3) * h
        B[12:15, 9:12] = np.eye(3) * h
        jac = A @ jac
        cov = A @ cov @ A.T + B @ noise @ B.T
        dp = dp + dv * h + 0.5 * Rk @ a * h2
        dv = dv + Rk @ a * h
        dq = Rotation.from_matrix(Rk @ dR)
    return dq, dp, dv, cov, jac


def make_inputs(n_valid=20, M=32):
    acc = RNG.normal(0, 0.05, size=(M, 3)) + np.array([0, 0, 1.0])
    gyr = RNG.normal(0, 0.3, size=(M, 3))
    dt = np.full(M, 0.005)
    mask = np.arange(M) < n_valid
    acc[~mask] = 999.0  # poison padding to catch mask bugs
    gyr[~mask] = 999.0
    return acc, gyr, dt, mask


def test_matches_numpy_reference():
    acc, gyr, dt, mask = make_inputs()
    bg = np.array([0.001, -0.002, 0.0005])
    ba = np.array([0.01, 0.02, -0.01])
    res = pi.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                          jnp.asarray(mask), jnp.asarray(bg), jnp.asarray(ba), CFG)
    dq, dp, dv, cov, jac = numpy_preintegration(acc[mask], gyr[mask], dt[mask], bg, ba, CFG)
    np.testing.assert_allclose(np.array(res.dp), dp, atol=1e-10)
    np.testing.assert_allclose(np.array(res.dv), dv, atol=1e-10)
    q = np.array(res.dq)
    q_ref = dq.as_quat()  # x,y,z,w
    q_ref = np.concatenate([q_ref[3:], q_ref[:3]])
    q_ref *= np.sign(q_ref[0])
    np.testing.assert_allclose(q * np.sign(q[0]), q_ref, atol=1e-12)
    np.testing.assert_allclose(np.array(res.jac), jac, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(np.array(res.cov), cov, rtol=1e-6, atol=1e-18)
    assert abs(float(res.dtime) - 0.005 * 20) < 1e-9


def test_constant_acceleration_closed_form():
    # no rotation, constant specific force -> dp = 0.5 a t^2, dv = a t
    M = 32
    acc = np.tile(np.array([0.1, 0.0, 0.0]), (M, 1))
    gyr = np.zeros((M, 3))
    dt = np.full(M, 0.01)
    mask = np.ones(M, bool)
    res = pi.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                          jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3), CFG)
    T = 0.32
    a = 0.1 * CFG.gnorm
    np.testing.assert_allclose(np.array(res.dv), [a * T, 0, 0], rtol=1e-9)
    # discrete-time double integration: dp = sum(v dt + 0.5 a dt^2)
    v = 0.0
    p = 0.0
    for _ in range(M):
        p += v * 0.01 + 0.5 * a * 0.01**2
        v += a * 0.01
    np.testing.assert_allclose(np.array(res.dp), [p, 0, 0], rtol=1e-9)


def test_constant_rotation_closed_form():
    M = 32
    w = np.array([0.0, 0.0, 0.5])
    gyr = np.tile(w, (M, 1))
    acc = np.zeros((M, 3))
    dt = np.full(M, 0.01)
    mask = np.ones(M, bool)
    res = pi.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                          jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3), CFG)
    ref = Rotation.from_rotvec(w * 0.32).as_quat()
    q = np.array(res.dq) * np.sign(np.array(res.dq)[0])
    ref = np.concatenate([ref[3:], ref[:3]]) * np.sign(ref[3])
    np.testing.assert_allclose(q, ref, atol=1e-10)


def test_gyro_integrate_matches_preintegration_rotation():
    acc, gyr, dt, mask = make_inputs()
    dq = pi.gyro_integrate(jnp.asarray(gyr), jnp.asarray(dt), jnp.asarray(mask))
    res = pi.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                          jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3), CFG)
    np.testing.assert_allclose(np.array(dq), np.array(res.dq), atol=1e-10)


def test_bias_jacobian_predicts_bias_change():
    """First-order bias correction via the 15x15 Jacobian matches re-integration,
    the property Cost_NavState_PRV_Bias relies on (ceresfunc.h:358-369)."""
    acc, gyr, dt, mask = make_inputs()
    bg0 = np.zeros(3)
    ba0 = np.zeros(3)
    res0 = pi.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                           jnp.asarray(mask), jnp.asarray(bg0), jnp.asarray(ba0), CFG)
    dbg = np.array([1e-4, -2e-4, 5e-5])
    dba = np.array([1e-3, 2e-3, -1e-3])
    res1 = pi.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                           jnp.asarray(mask), jnp.asarray(bg0 + dbg),
                           jnp.asarray(ba0 + dba), CFG)
    J = np.array(res0.jac)
    dp_pred = np.array(res0.dp) + J[0:3, 9:12] @ dbg + J[0:3, 12:15] @ dba
    dv_pred = np.array(res0.dv) + J[6:9, 9:12] @ dbg + J[6:9, 12:15] @ dba
    np.testing.assert_allclose(dp_pred, np.array(res1.dp), atol=1e-7)
    np.testing.assert_allclose(dv_pred, np.array(res1.dv), atol=1e-6)
    # rotation: dq1 ~ dq0 * exp(J_R_bg dbg)
    from mmloam_tpu import lie
    corr = lie.quat_mul(res0.dq, lie.exp_quat(jnp.asarray(J[3:6, 9:12] @ dbg)))
    ang = lie.quat_angular_distance(corr, res1.dq)
    assert float(ang) < 1e-6


def test_average_acc():
    M = 48
    acc = np.ones((M, 3)) * 0.1
    acc[31:] = 100.0  # only first 31 valid samples count
    mask = np.ones(M, bool)
    out = np.array(pi.average_acc(jnp.asarray(acc), jnp.asarray(mask), CFG))
    np.testing.assert_allclose(out, 0.1 * CFG.gnorm * np.ones(3), rtol=1e-9)


def test_sqrt_info_f32_conditioning():
    acc, gyr, dt, mask = make_inputs(n_valid=30)
    res = pi.preintegrate(jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
                          jnp.asarray(dt, jnp.float32), jnp.asarray(mask),
                          jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32), CFG)
    sqrt_info = pi.sqrt_info_from_cov(res.cov)
    assert np.all(np.isfinite(np.array(sqrt_info)))
    # J^T J should reproduce cov^-1 within f32 tolerance (relative, blockwise)
    info = np.array(sqrt_info, np.float64).T @ np.array(sqrt_info, np.float64)
    cov64 = np.array(res.cov, np.float64)
    recon = info @ cov64
    # diagonal of info @ cov ~ identity
    np.testing.assert_allclose(np.diag(recon), np.ones(15), rtol=0.05)


@pytest.mark.smoke
def test_parallel_matches_sequential():
    """The log-depth formulation must reproduce the reference-shaped
    sequential scan bit-for-bit up to f32 roundoff."""
    import jax.numpy as jnp
    import numpy as np
    from mmloam_tpu.config import ImuConfig
    from mmloam_tpu.ops import preintegration as pre

    rng = np.random.default_rng(7)
    M = 48
    cfg = ImuConfig()
    acc = jnp.asarray(rng.normal(0, 0.3, (M, 3)) + [0, 0, 1.0],
                      jnp.float32)
    gyr = jnp.asarray(rng.normal(0, 0.5, (M, 3)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.004, 0.006, M), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=M) > 0.2)
    bg = jnp.asarray([0.01, -0.02, 0.005], jnp.float32)
    ba = jnp.asarray([-0.03, 0.01, 0.02], jnp.float32)

    a = pre.preintegrate(acc, gyr, dt, mask, bg, ba, cfg)
    b = pre.preintegrate_sequential(acc, gyr, dt, mask, bg, ba, cfg)
    np.testing.assert_allclose(np.asarray(a.dq), np.asarray(b.dq), atol=2e-6)
    np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.dv), np.asarray(b.dv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.jac), np.asarray(b.jac),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov),
                               atol=1e-9, rtol=2e-3)
    np.testing.assert_allclose(float(a.dtime), float(b.dtime), rtol=1e-6)
