"""Closed-form small-matrix linear algebra (2x2 / 3x3 / 6x6 blocks).

TPU lowers `jnp.linalg.solve`/`inv` on tiny batched systems to generic
LU/QR loops with heavy per-instance overhead; adjugate/Cramer forms are
pure elementwise math that fuses into the surrounding kernel. Used by the
LM stages (3x3, 2x2 normal equations) and the Schur solvers (3x3 landmark
blocks, 2x2 depth blocks).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv2(A, eps=0.0):
    """(..., 2, 2) inverse via adjugate; eps regularizes the determinant."""
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 1, 0]
    d = A[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det) if eps else det
    inv_det = 1.0 / det
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def solve2(A, b):
    """Solve (..., 2, 2) x = (..., 2) by Cramer's rule."""
    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a10 = A[..., 1, 0]
    a11 = A[..., 1, 1]
    det = a00 * a11 - a01 * a10
    inv_det = 1.0 / det
    x0 = (b[..., 0] * a11 - b[..., 1] * a01) * inv_det
    x1 = (a00 * b[..., 1] - a10 * b[..., 0]) * inv_det
    return jnp.stack([x0, x1], axis=-1)


def _cofactor3(A):
    """Cofactor matrix (transpose of adjugate) of (..., 3, 3)."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    return jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )


def det3(A):
    a = A
    return (
        a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
        - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
        + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0])
    )


def inv3(A):
    """(..., 3, 3) inverse via adjugate."""
    cof = _cofactor3(A)
    det = det3(A)
    adj = jnp.swapaxes(cof, -1, -2)
    return adj / det[..., None, None]


def solve3(A, b):
    """Solve (..., 3, 3) x = (..., 3) via adjugate."""
    cof = _cofactor3(A)
    det = det3(A)
    # x = adj(A) b / det; adj = cof^T  =>  x_i = sum_j cof[j, i] b_j
    return jnp.einsum("...ji,...j->...i", cof, b) / det[..., None]


def solve_psd(A, b):
    """Solve a small (n <= ~64) symmetric positive-definite system via
    explicit Cholesky (jnp.linalg.cholesky + triangular solves) — faster
    and more stable than generic LU for the reduced camera systems."""
    L = jnp.linalg.cholesky(A)
    import jax

    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
