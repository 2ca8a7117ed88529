"""Closed-form 3x3 linalg vs numpy reference."""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.ops import linalg3
import pytest


def rand_sym(rng, n=200, scale=1.0):
    A = rng.normal(size=(n, 3, 3)) * scale
    return (A + A.transpose(0, 2, 1)) / 2


@pytest.mark.smoke
def test_eigvalsh3_matches_numpy():
    rng = np.random.default_rng(0)
    A = rand_sym(rng)
    got = np.array(linalg3.eigvalsh3(jnp.asarray(A)))
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_eigvalsh3_psd_and_degenerate():
    rng = np.random.default_rng(1)
    # rank-1 and rank-2 PSD matrices (line/plane covariances)
    v = rng.normal(size=(50, 3))
    A1 = np.einsum("ki,kj->kij", v, v)
    got = np.array(linalg3.eigvalsh3(jnp.asarray(A1)))
    want = np.linalg.eigvalsh(A1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # exactly diagonal / isotropic
    A2 = np.stack([np.eye(3) * 2.5, np.zeros((3, 3)), np.diag([1.0, 2.0, 3.0])])
    got2 = np.array(linalg3.eigvalsh3(jnp.asarray(A2)))
    want2 = np.linalg.eigvalsh(A2)
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_principal_eigvec3():
    rng = np.random.default_rng(2)
    # anisotropic covariances with a clear principal direction
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    A = 10.0 * np.einsum("ki,kj->kij", d, d) + rand_sym(rng, 100, 0.3)
    A = (A + A.transpose(0, 2, 1)) / 2
    evals = linalg3.eigvalsh3(jnp.asarray(A))
    v = np.array(linalg3.principal_eigvec3(jnp.asarray(A), evals))
    w, V = np.linalg.eigh(A)
    want = V[..., -1]
    dots = np.abs(np.einsum("ki,ki->k", v, want))
    assert dots.min() > 0.9999, dots.min()


def test_solve3():
    rng = np.random.default_rng(3)
    A = rand_sym(rng, 100) + 3.0 * np.eye(3)
    b = rng.normal(size=(100, 3))
    x = np.array(linalg3.solve3(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("kij,kj->ki", A, x), b,
                               rtol=1e-5, atol=1e-6)
