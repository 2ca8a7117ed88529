"""IMU preintegration on the manifold, as a `jax.lax.scan`.

Re-implements the semantics of the reference's per-sample CPU loop
(reference: lio/IMUIntegrator.cpp:108-166 `PreIntegration`,
:90-106 `GyroIntegration`, :168-181 `GetAverageAcc`) with masked fixed-shape
IMU windows so the whole thing jits and vmaps.

State order matches `IMUIntegrator::JacobianOrder` (IMUIntegrator.h:86-93):
    O_P = 0, O_R = 3, O_V = 6, O_BG = 9, O_BA = 12
Noise vector order matches the ctor (IMUIntegrator.cpp:35-38):
    [gyr_n, acc_n, gyr_w, acc_w] as 3x3 diagonal blocks.

Input convention: a scan interval carries up to `M` IMU samples as arrays
`acc (M,3)` [in g units, scaled by gnorm here like the reference],
`gyr (M,3)`, `dt (M,)` (time delta from the previous sample or interval
start) and a validity `mask (M,)`.  Masked samples are no-ops (dt=0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie


class PreintResult(NamedTuple):
    """Equivalent of the reference IMUIntegrator's accumulated quantities."""

    dq: jnp.ndarray        # (4,) delta orientation quaternion (w,x,y,z)
    dp: jnp.ndarray        # (3,) delta position
    dv: jnp.ndarray        # (3,) delta velocity
    cov: jnp.ndarray       # (15,15) covariance of [P R V BG BA]
    jac: jnp.ndarray       # (15,15) bias Jacobian (A-chain product)
    dtime: jnp.ndarray     # () total integrated time
    bg: jnp.ndarray        # (3,) linearization gyro bias
    ba: jnp.ndarray        # (3,) linearization acc bias


def _noise_matrix(imu_cfg, dtype):
    n = jnp.zeros((12, 12), dtype)
    n = n.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * imu_cfg.gyr_n**2)
    n = n.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype) * imu_cfg.acc_n**2)
    n = n.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype) * imu_cfg.gyr_w**2)
    n = n.at[9:12, 9:12].set(jnp.eye(3, dtype=dtype) * imu_cfg.acc_w**2)
    return n


def preintegrate(acc, gyr, dt, mask, bg, ba, imu_cfg) -> PreintResult:
    """Masked fixed-length preintegration (IMUIntegrator.cpp:108-166).

    `acc` is the raw accelerometer reading in g units; the reference scales
    by gnorm (IMUIntegrator.cpp:119-121).

    Parallel formulation: the reference's per-sample loop is a chain of
    affine recurrences, so the whole window is computed in log-depth —
    (1) quaternion prefix products give every step's accumulated rotation
    R_k, (2) dp/dv follow from (prefix-)sums of R_k a_k dt_k, (3) the bias
    Jacobian is the reduced product of the per-step transition matrices
    A_k, and (4) the covariance is sum_k G_k B_k N B_k^T G_k^T with G_k the
    suffix products of A — two `associative_scan`s plus batched 15x15
    matmuls instead of a 64-step sequential `lax.scan`.  Masked samples
    have dt forced to 0, which makes their A=I, B=0: exact no-ops.
    """
    dtype = acc.dtype
    noise = _noise_matrix(imu_cfg, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    M = acc.shape[0]

    dt_m = jnp.where(mask, dt, 0.0).astype(dtype)         # (M,)
    a = acc.astype(dtype) * imu_cfg.gnorm - ba            # (M,3)
    w = gyr.astype(dtype) - bg
    w_dt = w * dt_m[:, None]
    dt2 = dt_m * dt_m

    # (1) accumulated rotation before each sample: R_k = R(e_0 ... e_{k-1})
    e = jax.vmap(lie.exp_quat)(w_dt)                      # (M,4)
    pref = _quat_prefix(e)                                # (M,4) inclusive
    dq = pref[-1]
    q_before = jnp.concatenate(
        [jnp.array([[1.0, 0, 0, 0]], dtype), pref[:-1]], axis=0)
    Rk = jax.vmap(lie.quat_to_matrix)(q_before)           # (M,3,3)

    # (2) dp / dv
    Ra = jnp.einsum("kij,kj->ki", Rk, a)                  # (M,3)
    u = Ra * dt_m[:, None]                                # dv increments
    dv_prefix = jnp.cumsum(u, axis=0) - u                 # exclusive prefix
    dv = jnp.sum(u, axis=0)
    dp = jnp.sum(dv_prefix * dt_m[:, None] + 0.5 * Ra * dt2[:, None], axis=0)

    # per-step transition A_k and noise map B_k (IMUIntegrator.cpp:130-151)
    dR = jax.vmap(lie.exp_matrix)(w_dt)
    Jr = jax.vmap(lie.right_jacobian)(w_dt)
    a_hat = jax.vmap(lie.hat)(a)
    Ra_hat = jnp.einsum("kij,kjl->kil", Rk, a_hat)

    # block-concatenated assembly: eight .at[].set on a broadcast eye
    # compile to per-step dynamic-update-slices (~2.6 ms/scan measured);
    # concatenation fuses into one materialization
    I3 = jnp.broadcast_to(eye3, (M, 3, 3))
    Z3 = jnp.zeros((M, 3, 3), dtype)
    dt_c = dt_m[:, None, None]
    dt2_c = dt2[:, None, None]
    block_rows = [
        [I3, -0.5 * Ra_hat * dt2_c, I3 * dt_c, Z3, -0.5 * Rk * dt2_c],
        [Z3, jnp.swapaxes(dR, -1, -2), Z3, -Jr * dt_c, Z3],
        [Z3, -Ra_hat * dt_c, I3, Z3, -Rk * dt_c],
        [Z3, Z3, Z3, I3, Z3],
        [Z3, Z3, Z3, Z3, I3],
    ]
    A = jnp.concatenate(
        [jnp.concatenate(row, axis=2) for row in block_rows], axis=1)
    # masked steps: exp(0)=I and dt=0 already make A=I; re-force the (3:6,
    # 3:6) block which holds dR.T regardless of dt
    A = jnp.where(mask[:, None, None], A,
                  jnp.broadcast_to(jnp.eye(15, dtype=dtype), (M, 15, 15)))

    Z33 = jnp.zeros((M, 3, 3), dtype)
    b_rows = [
        [Z33, 0.5 * Rk * dt2_c, Z33, Z33],
        [Jr * dt_c, Z33, Z33, Z33],
        [Z33, Rk * dt_c, Z33, Z33],
        [Z33, Z33, I3 * dt_c, Z33],
        [Z33, Z33, Z33, I3 * dt_c],
    ]
    B = jnp.concatenate(
        [jnp.concatenate(row, axis=2) for row in b_rows], axis=1)

    # (3)+(4) jac and cov jointly, as ONE tree reduction over the affine
    # error-propagation monoid: element k is (A_k, Q_k = B_k N B_k^T) with
    #     combine((J1,C1),(J2,C2)) = (J2 J1,  J2 C1 J2^T + C2)
    # (left = earlier steps).  The reduced pair is exactly
    # (A_{M-1}...A_0, sum_k G_k Q_k G_k^T) — what the sequential recursion
    # C_k = A_k C_{k-1} A_k^T + Q_k produces.  A tree reduction does ~3M
    # batched 15x15 matmuls in log2(M) levels, vs the two associative_scans
    # this replaces (~4M matmuls for ALL prefixes/suffixes that were thrown
    # away, plus a materialized (M,15,15) suffix-product block and the
    # scan-internal pad/slice traffic that showed up as ~6% of the flagship
    # step profile).  Identity elements (J=I, C=0) pad M to a power of two,
    # so masked samples (A=I, B=0) and ragged windows are exact no-ops.
    BN = jnp.einsum("kij,jl->kil", B, noise)
    J = A
    C = jnp.einsum("kij,klj->kil", BN, B)
    n = M
    while n > 1:
        if n % 2:
            J = jnp.concatenate(
                [J, jnp.eye(15, dtype=dtype)[None]], axis=0)
            C = jnp.concatenate([C, jnp.zeros((1, 15, 15), dtype)], axis=0)
            n += 1
        # pair via reshape, not strided slices: under the pipeline's
        # nested vmaps (batch x keyframes x tree) the strided-slice-fed
        # batched dot hit an XLA:CPU simplifier verifier bug (batch dims
        # transposed after simplification); the reshape form does not
        Jp = J.reshape((n // 2, 2) + J.shape[1:])
        Cp = C.reshape((n // 2, 2) + C.shape[1:])
        J1, J2 = Jp[:, 0], Jp[:, 1]
        C1, C2 = Cp[:, 0], Cp[:, 1]
        J = jnp.einsum("...ij,...jk->...ik", J2, J1)
        C = jnp.einsum("...ij,...jk,...lk->...il", J2, C1, J2) + C2
        n //= 2
    jac = J[0]
    cov = C[0]

    dtime = jnp.sum(dt_m).astype(dtype)
    return PreintResult(lie.quat_normalize(dq), dp, dv, cov, jac, dtime,
                        bg, ba)


def preintegrate_sequential(acc, gyr, dt, mask, bg, ba, imu_cfg) -> PreintResult:
    """Reference-shaped sequential `lax.scan` preintegration (the literal
    transcription of IMUIntegrator.cpp:108-166) — kept as the ground truth
    the parallel formulation is tested against."""
    dtype = acc.dtype
    noise = _noise_matrix(imu_cfg, dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    def body(carry, x):
        dq, dp, dv, cov, jac = carry
        a_raw, w_raw, dt_i, m = x
        dt_i = jnp.where(m, dt_i, 0.0).astype(dtype)
        a = a_raw * imu_cfg.gnorm - ba
        w = w_raw - bg
        dt2 = dt_i * dt_i

        w_dt = w * dt_i
        dR = lie.exp_matrix(w_dt)
        Jr = lie.right_jacobian(w_dt)
        Rk = lie.quat_to_matrix(dq)
        a_hat = lie.hat(a)

        A = jnp.eye(15, dtype=dtype)
        A = A.at[0:3, 3:6].set(-0.5 * Rk @ a_hat * dt2)
        A = A.at[0:3, 6:9].set(eye3 * dt_i)
        A = A.at[0:3, 12:15].set(-0.5 * Rk * dt2)
        A = A.at[3:6, 3:6].set(dR.T)
        A = A.at[3:6, 9:12].set(-Jr * dt_i)
        A = A.at[6:9, 3:6].set(-Rk @ a_hat * dt_i)
        A = A.at[6:9, 12:15].set(-Rk * dt_i)

        B = jnp.zeros((15, 12), dtype)
        B = B.at[0:3, 3:6].set(0.5 * Rk * dt2)
        B = B.at[3:6, 0:3].set(Jr * dt_i)
        B = B.at[6:9, 3:6].set(Rk * dt_i)
        B = B.at[9:12, 6:9].set(eye3 * dt_i)
        B = B.at[12:15, 9:12].set(eye3 * dt_i)

        jac_n = A @ jac
        cov_n = A @ cov @ A.T + B @ noise @ B.T
        dp_n = dp + dv * dt_i + 0.5 * (Rk @ a) * dt2
        dv_n = dv + (Rk @ a) * dt_i
        dq_n = lie.quat_normalize(lie.quat_mul(dq, lie.exp_quat(w_dt)))

        # masked samples leave the carry untouched
        keep = m
        dq = jnp.where(keep, dq_n, dq)
        dp = jnp.where(keep, dp_n, dp)
        dv = jnp.where(keep, dv_n, dv)
        cov = jnp.where(keep, cov_n, cov)
        jac = jnp.where(keep, jac_n, jac)
        return (dq, dp, dv, cov, jac), None

    init = (
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
        jnp.zeros(3, dtype),
        jnp.zeros(3, dtype),
        jnp.zeros((15, 15), dtype),
        jnp.eye(15, dtype=dtype),
    )
    (dq, dp, dv, cov, jac), _ = jax.lax.scan(body, init, (acc, gyr, dt, mask))
    dtime = jnp.sum(jnp.where(mask, dt, 0.0)).astype(dtype)
    return PreintResult(dq, dp, dv, cov, jac, dtime, bg, ba)


def _quat_prefix(e):
    """Inclusive quaternion prefix products (log-depth)."""

    def qmul_norm(q1, q2):
        return lie.quat_normalize(lie.quat_mul(q1, q2))

    return jax.lax.associative_scan(jax.vmap(qmul_norm), e)


def gyro_integrate(gyr, dt, mask):
    """Orientation-only integration (IMUIntegrator.cpp:90-106), log-depth."""
    dt_m = jnp.where(mask, dt, 0.0).astype(gyr.dtype)
    e = jax.vmap(lie.exp_quat)(gyr * dt_m[:, None])
    return lie.quat_normalize(_quat_prefix(e)[-1])


def average_acc(acc, mask, imu_cfg, max_count: int = 31):
    """Mean of the first <=31 valid samples, scaled by gnorm
    (IMUIntegrator.cpp:168-181: breaks after i > 30)."""
    idx = jnp.cumsum(mask.astype(jnp.int32))
    take = mask & (idx <= max_count)
    n = jnp.maximum(jnp.sum(take.astype(acc.dtype)), 1.0)
    return jnp.sum(acc * take[:, None].astype(acc.dtype), axis=0) * imu_cfg.gnorm / n


def sqrt_info_from_cov(cov, eps: float = 1e-12):
    """Upper-triangular sqrt information: chol(cov^-1)^T as used by the
    reference (Estimator.cpp:1240-1242 `LLT(cov.inverse()).matrixL().T`).

    The covariance blocks span ~10 orders of magnitude, so a symmetric
    diagonal rescaling keeps the f32 Cholesky well-conditioned on TPU:
        cov = S C S  =>  cov^-1 = S^-1 C^-1 S^-1,
        sqrt_info = chol(C^-1)^T S^-1  (since (L S^-1)(S^-1 L^T) = cov^-1
        with the scaling diagonal commuting into the triangular factor only
        up to similarity — we fold S^-1 on the right which preserves
        J^T J = cov^-1, the only property the solver uses).
    """
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(cov, axis1=-2, axis2=-1), eps))
    S_inv = 1.0 / d
    C = cov * S_inv[..., :, None] * S_inv[..., None, :]
    n = cov.shape[-1]
    C = C + jnp.eye(n, dtype=cov.dtype) * 1e-6
    C_inv = jnp.linalg.inv(C)
    C_inv = 0.5 * (C_inv + jnp.swapaxes(C_inv, -1, -2))
    L = jnp.linalg.cholesky(C_inv + jnp.eye(n, dtype=cov.dtype) * 1e-8)
    return jnp.swapaxes(L, -1, -2) * S_inv[..., None, :]
