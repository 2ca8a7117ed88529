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


def test_eigvalsh3_gate_regime_accuracy():
    """The fit gates consume eigvalsh3 AT thresholds (plane scatter-rank
    e_mid/e_hi vs 0.01, line-likeness e_hi vs 3*e_mid) exactly in the
    near-degenerate regime where the closed form is least accurate
    (vanishing discriminant = coinciding eigenvalues).  Sample spectra
    straddling both thresholds — including near-double-root e_lo ~= e_mid
    cases — under random rotations and magnitudes, and bound the f32 gate
    RATIOS against f64 LAPACK: a gate decision can flip only for inputs
    within the asserted band of the threshold.  (Ported from the archived
    kernel's trig-free variant test when the kernel moved to scripts/.)"""
    rng = np.random.default_rng(7)
    specs = []
    # plane scatter gate regime: e_mid/e_hi straddles 0.01
    for ratio in np.geomspace(0.002, 0.05, 12):
        for lo in (1e-7, 1e-4, ratio * 0.98):   # incl. e_lo ~= e_mid
            specs.append((lo, ratio, 1.0))
    # line gate regime: e_hi/e_mid straddles 3
    for ratio in np.linspace(2.5, 3.5, 11):
        for lo in (1e-6, 0.9 / ratio, 1.0 / ratio):  # incl. e_lo ~= e_mid
            specs.append((lo / ratio if lo >= 0.5 else lo, 1.0 / ratio, 1.0))
    specs = np.array(specs, np.float64)
    n = len(specs)
    mags = np.tile(np.array([1e-4, 1e-2, 1.0]), (n + 2) // 3)[:n]
    specs = specs * mags[:, None]

    A = np.empty((n, 3, 3), np.float64)
    for i in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        A[i] = q @ np.diag(specs[i]) @ q.T
    exact = np.linalg.eigvalsh(A)                        # (n,3) ascending

    got = np.asarray(linalg3.eigvalsh3(jnp.asarray(A.astype(np.float32))),
                     np.float64)

    # bounds are ~3x the measured maxima, so a gate decision can flip only
    # within ~0.06% of its threshold
    scale = exact[:, 2]
    assert np.max(np.abs(got - exact) / scale[:, None]) < 6e-4

    # plane scatter-rank gate: e_mid/e_hi error band around the 0.01 gate
    r_got = got[:, 1] / np.maximum(got[:, 2], 1e-30)
    r_ref = exact[:, 1] / exact[:, 2]
    assert np.max(np.abs(r_got - r_ref)) < 6e-4
    # line gate margin (e_hi - 3 e_mid), relative to the spectrum scale
    m_got = (got[:, 2] - 3.0 * got[:, 1]) / scale
    m_ref = (exact[:, 2] - 3.0 * exact[:, 1]) / scale
    assert np.max(np.abs(m_got - m_ref)) < 1.6e-3
