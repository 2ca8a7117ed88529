"""Closed-form 3x3 symmetric eigen-analysis and linear solve.

The association hot path needs, per feature point, the eigenvalues (+
principal direction) of a 3x3 covariance (corner PCA, Estimator.cpp:250-252)
and a 3x3 linear solve (plane fit, :617-640).  `jnp.linalg.eigh/solve`
lower to LAPACK-style custom calls that are slow per-element and blow up
XLA compile time when vmapped over thousands of points; these analytic
forms are pure VPU arithmetic — branch-free, fixed cost, fuse with their
surroundings.

Eigenvalues: trigonometric method (Smith 1961).  Principal eigenvector:
Cayley-Hamilton — (A - l2 I)(A - l3 I) has columns parallel to v1.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigvalsh3(A):
    """Ascending eigenvalues of symmetric A (..., 3, 3) -> (..., 3)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, _EPS) / 6.0)
    # det((A - qI)/p) / 2
    b00, b11, b22 = d0 / p, d1 / p, d2 / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # diagonal matrices: p2 ~ 0 -> all eigenvalues = q
    diag = p2 < _EPS
    e_lo = jnp.where(diag, q, e_lo)
    e_mid = jnp.where(diag, q, e_mid)
    e_hi = jnp.where(diag, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def principal_eigvec3(A, evals):
    """Unit eigenvector of the LARGEST eigenvalue of symmetric A.

    evals are the ascending eigenvalues from eigvalsh3.  Uses
    (A - l_mid I)(A - l_lo I), whose columns span the l_hi eigenspace;
    picks the largest column for conditioning.  For (near-)isotropic A the
    direction is arbitrary — callers gate on eigenvalue ratios first
    (the corner test l_hi > 3 l_mid guarantees a well-separated direction).
    """
    eye = jnp.eye(3, dtype=A.dtype)
    M = (A - evals[..., 1, None, None] * eye) @ (A - evals[..., 0, None, None] * eye)
    norms = jnp.linalg.norm(M, axis=-2)             # column norms (..., 3)
    idx = jnp.argmax(norms, axis=-1)
    # one-hot column select instead of take_along_axis: the latter lowers
    # to per-element random gathers (the TPU scalar path); this stays in
    # fused vector math
    sel = (idx[..., None] == jnp.arange(3)).astype(A.dtype)   # (..., 3)
    v = jnp.einsum("...ij,...j->...i", M, sel)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v.shape)
    return jnp.where(n > 1e-9, v / jnp.maximum(n, 1e-9), fallback)


def smallest_eigvec3(A, evals):
    """Unit eigenvector of the SMALLEST eigenvalue of symmetric A.

    evals are the ascending eigenvalues from eigvalsh3.  Cayley-Hamilton:
    (A - l_mid I)(A - l_hi I) has columns spanning the l_lo eigenspace.
    For degenerate spectra the direction is arbitrary — callers gate on
    eigenvalue ratios (plane fits gate on scatter rank first).
    """
    eye = jnp.eye(3, dtype=A.dtype)
    M = (A - evals[..., 1, None, None] * eye) @ (A - evals[..., 2, None, None] * eye)
    norms = jnp.linalg.norm(M, axis=-2)             # column norms (..., 3)
    idx = jnp.argmax(norms, axis=-1)
    # one-hot column select instead of take_along_axis: the latter lowers
    # to per-element random gathers (the TPU scalar path); this stays in
    # fused vector math
    sel = (idx[..., None] == jnp.arange(3)).astype(A.dtype)   # (..., 3)
    v = jnp.einsum("...ij,...j->...i", M, sel)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v.shape)
    return jnp.where(n > 1e-9, v / jnp.maximum(n, 1e-9), fallback)


def solve3(A, b):
    """Solve A x = b for 3x3 A (..., 3, 3), b (..., 3) via the adjugate.

    A tiny ridge keeps the determinant away from zero for degenerate
    neighborhoods; callers gate fit quality afterwards.
    """
    a = A + 1e-8 * jnp.eye(3, dtype=A.dtype)
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    a20, a21, a22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS,
                              jnp.where(det < 0, -_EPS, _EPS), det)
    x0 = (c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)
