"""Unit tests for the SO(3)/quaternion substrate against scipy ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation, Slerp

from mmloam_tpu import lie

RNG = np.random.default_rng(0)


def rand_rotvecs(n, scale=2.5):
    v = RNG.normal(size=(n, 3)) * scale / 3.0
    # keep norms strictly inside (-pi, pi) so log(exp(v)) == v
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    v = np.where(norms > 3.0, v * (3.0 / norms), v)
    return v


def test_exp_matrix_matches_scipy():
    phi = rand_rotvecs(64)
    R = np.asarray(lie.exp_matrix(jnp.asarray(phi, jnp.float64)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-9)


def test_exp_quat_matches_scipy():
    phi = rand_rotvecs(64)
    q = np.asarray(lie.exp_quat(jnp.asarray(phi, jnp.float64)))
    q_ref = Rotation.from_rotvec(phi).as_quat()  # (x,y,z,w)
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    sign = np.sign(q_ref[:, :1]) * np.sign(q[:, :1])
    np.testing.assert_allclose(q * sign, q_ref * np.sign(q_ref[:, :1])**2, atol=1e-9)


@pytest.mark.smoke
def test_log_roundtrip_matrix():
    phi = rand_rotvecs(128)
    out = np.asarray(lie.log_matrix(lie.exp_matrix(jnp.asarray(phi, jnp.float64))))
    np.testing.assert_allclose(out, phi, atol=1e-6)


def test_log_roundtrip_quat():
    phi = rand_rotvecs(128)
    out = np.asarray(lie.log_quat(lie.exp_quat(jnp.asarray(phi, jnp.float64))))
    np.testing.assert_allclose(out, phi, atol=1e-7)


def test_log_matrix_near_pi():
    axes = RNG.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    phi = axes * (np.pi - 1e-4)
    R = Rotation.from_rotvec(phi).as_matrix()
    out = np.array(lie.log_matrix(jnp.asarray(R, jnp.float64)))
    # log is only defined up to the pi ambiguity: compare rotations
    R_out = Rotation.from_rotvec(out).as_matrix()
    np.testing.assert_allclose(R_out, R, atol=1e-5)


def test_small_angle_stability():
    phi = jnp.asarray([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], jnp.float32)
    R = lie.exp_matrix(phi)
    assert np.all(np.isfinite(np.asarray(R)))
    out = lie.log_matrix(R)
    assert np.all(np.isfinite(np.asarray(out)))
    # gradients finite at zero
    g = jax.grad(lambda p: jnp.sum(lie.exp_matrix(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda p: jnp.sum(lie.right_jacobian(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_quat_mul_rotate_consistency():
    phi = rand_rotvecs(32)
    q = lie.exp_quat(jnp.asarray(phi, jnp.float64))
    v = jnp.asarray(RNG.normal(size=(32, 3)))
    out = np.asarray(lie.quat_rotate(q, v))
    ref = Rotation.from_rotvec(phi).apply(np.array(v))
    np.testing.assert_allclose(out, ref, atol=1e-9)
    # composition
    q2 = lie.exp_quat(jnp.asarray(rand_rotvecs(32), jnp.float64))
    lhs = np.asarray(lie.quat_rotate(lie.quat_mul(q, q2), v))
    rhs = np.asarray(lie.quat_rotate(q, lie.quat_rotate(q2, v)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_matrix_quat_roundtrip():
    phi = rand_rotvecs(128)
    R = lie.exp_matrix(jnp.asarray(phi, jnp.float64))
    q = lie.matrix_to_quat(R)
    R2 = lie.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-9)


def test_right_jacobian_finite_difference():
    # Jr relates additive tangent perturbation to group composition:
    # exp(phi + dphi) ~ exp(phi) exp(Jr(phi) dphi)
    phi = jnp.asarray(rand_rotvecs(1)[0], jnp.float64)
    Jr = np.asarray(lie.right_jacobian(phi))
    eps = 1e-7
    for k in range(3):
        d = np.zeros(3); d[k] = eps
        lhs = np.asarray(lie.exp_matrix(phi + jnp.asarray(d)))
        rhs = np.asarray(lie.exp_matrix(phi)) @ Rotation.from_rotvec(Jr @ d).as_matrix()
        np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_slerp_identity_matches_scipy():
    phi = rand_rotvecs(16, scale=1.5)
    q = lie.exp_quat(jnp.asarray(phi, jnp.float64))
    s = jnp.asarray(RNG.uniform(0, 1, size=16))
    out = np.asarray(lie.quat_to_matrix(lie.slerp_identity(q, s)))
    for i in range(16):
        rots = Rotation.from_rotvec(np.stack([np.zeros(3), phi[i]]))
        ref = Slerp([0.0, 1.0], rots)(float(s[i])).as_matrix()
        np.testing.assert_allclose(out[i], ref, atol=1e-8)


def test_quat_angular_distance():
    phi = rand_rotvecs(32)
    qa = lie.exp_quat(jnp.asarray(phi, jnp.float64))
    phi2 = rand_rotvecs(32)
    qb = lie.exp_quat(jnp.asarray(phi2, jnp.float64))
    out = np.asarray(lie.quat_angular_distance(qa, qb))
    ref = (Rotation.from_rotvec(phi).inv() * Rotation.from_rotvec(phi2)).magnitude()
    np.testing.assert_allclose(out, ref, atol=1e-8)
