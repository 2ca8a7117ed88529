"""SO(3)/quaternion math substrate.

Replaces the vendored Sophus library (reference: mm-loam/include/sophus/,
only `SO3d::exp/log/hat` and quaternion composition are used by the pipeline
— e.g. Estimator.cpp:942,958, ceresfunc.h:334, IMUIntegrator.cpp:130) and the
MSCKF-derived helpers in utils/math_utils.hpp.

All functions are pure jnp, shape-polymorphic over leading batch dims via
`jax.vmap`, and safe at the small-angle limit (Taylor fallbacks chosen so
derivatives through `jnp.where` stay finite — both branches are evaluated
under autodiff).

Quaternions are stored (w, x, y, z), Hamilton convention, matching Eigen.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """so(3) hat operator: v -> skew-symmetric matrix (Sophus::SO3::hat)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def _safe_norm(v):
    """Norm whose gradient is finite at 0 (returns eps-floored norm)."""
    sq = jnp.sum(v * v, axis=-1)
    return jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))


def exp_matrix(phi):
    """SO3 exponential map: rotation vector -> rotation matrix (Rodrigues)."""
    theta = _safe_norm(phi)[..., None, None]
    small = theta < 1e-5
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    a = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta)) / theta**2)
    return eye + a * K + b * K2


def exp_quat(phi):
    """SO3 exponential map: rotation vector -> unit quaternion (w,x,y,z)."""
    theta = _safe_norm(phi)
    half = 0.5 * theta
    small = theta < 1e-5
    s = jnp.where(small, 0.5 - theta**2 / 48.0, jnp.sin(half) / theta)
    w = jnp.cos(half)
    xyz = phi * s[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def log_matrix(R):
    """SO3 logarithm: rotation matrix -> rotation vector.

    Routed through the quaternion (Shepperd extraction + arctan2 log) so
    it is autodiff-safe at the identity (no arccos whose derivative blows
    up at trace=3) and numerically robust near theta = pi.
    """
    return log_quat(matrix_to_quat(R))


def log_quat(q):
    """SO3 logarithm: unit quaternion (w,x,y,z) -> rotation vector."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # canonical hemisphere
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    n = _safe_norm(xyz)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / n)
    return xyz * scale[..., None]


def quat_mul(a, b):
    """Hamilton product (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q."""
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., :1] * t + jnp.cross(qv, t)


def quat_normalize(q):
    n = _safe_norm(q[..., :])
    # note: 4-vector norm; _safe_norm works on last axis of any size >= 1
    n = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1), _EPS * _EPS))
    q = q / n[..., None]
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)


def matrix_to_quat(R):
    """Rotation matrix -> unit quaternion (w,x,y,z), branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (unnormalized), one per dominant component
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cands, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def right_jacobian(phi):
    """Right Jacobian of SO(3): Jr(phi).

    Matches the explicit form used in IMU preintegration
    (reference: IMUIntegrator.cpp:131-139):
      Jr = I - (1-cos t)/t * K + (1 - sin t / t) * K^2,  K = hat(phi/|phi|).
    """
    theta = _safe_norm(phi)
    small = theta < 1e-5
    axis = phi / theta[..., None]
    K = hat(axis)
    K2 = K @ K
    t = theta[..., None, None]
    a = jnp.where(small[..., None, None], t / 2.0 - t**3 / 24.0,
                  (1.0 - jnp.cos(t)) / t)
    b = jnp.where(small[..., None, None], t**2 / 6.0, 1.0 - jnp.sin(t) / t)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    Jr = eye - a * K + b * K2
    # at theta ~ 0 the axis is ill-defined; Jr -> I - hat(phi)/2 + ...
    Jr_small = eye - 0.5 * hat(phi)
    return jnp.where(small[..., None, None], Jr_small, Jr)


def right_jacobian_inv(phi):
    """Inverse of the SO(3) right Jacobian, closed form.

    Jr^-1(phi) = I + 1/2 hat(phi) + c hat(phi)^2 with
    c = 1/theta^2 - (1 + cos theta) / (2 theta sin theta); Taylor
    c = 1/12 + theta^2/720 + ... at small angles.  Valid for |phi| < pi
    (the preintegration residual rotations it is used on are small).
    """
    theta = _safe_norm(phi)[..., None, None]
    small = theta < 1e-4
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    sin_t = jnp.sin(theta)
    c = jnp.where(
        small, 1.0 / 12.0 + theta**2 / 720.0,
        1.0 / jnp.maximum(theta**2, _EPS**2)
        - (1.0 + jnp.cos(theta)) / jnp.maximum(2.0 * theta * sin_t,
                                               _EPS**2))
    return eye + 0.5 * K + c * K2


def slerp_identity(q, s):
    """slerp(Identity, q, s) for s in [0,1].

    Used for per-point undistortion (reference:
    unionPoseEstimation.cpp:411 `Quaterniond::Identity().slerp(s, qlc)`).
    Implemented as exp(s * log(q)) which equals Eigen's slerp from identity.
    """
    phi = log_quat(q)
    return exp_quat(phi * s[..., None])


def quat_angular_distance(a, b):
    """Angle of relative rotation between two unit quaternions (radians)."""
    d = quat_mul(quat_conj(a), b)
    return jnp.abs(2.0 * jnp.arctan2(_safe_norm(d[..., 1:]), jnp.abs(d[..., 0])))
