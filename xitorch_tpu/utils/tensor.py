"""Array helpers: Cholesky-QR, random test-matrix factories.

TPU-native analog of /root/reference/xitorch/_utils/tensor.py.  ``tallqr``
(Cholesky-QR) is MXU-friendly: it is two batched matmuls plus a small
Cholesky, instead of a Householder QR which maps poorly to the systolic
array.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "einsum_hi",
    "dot_hi",
    "tallqr",
    "create_random_square_matrix",
    "create_random_ortho_matrix",
]


def einsum_hi(spec: str, *args) -> jnp.ndarray:
    """``jnp.einsum`` at HIGHEST matmul precision.

    Solver-internal contractions (Gram matrices, orthogonalizations,
    low-rank Jacobian applications, quadrature weights) must not run at
    the TPU's default bf16 multiply precision: the ~8e-3 relative noise
    floors residuals far above any useful tolerance (measured: chebfsi
    stalling at 7e-3, see CLAUDE.md).  Model-layer matmuls, in contrast,
    should stay at the fast default.
    """
    return jnp.einsum(spec, *args, precision=jax.lax.Precision.HIGHEST)


def dot_hi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a @ b`` at HIGHEST matmul precision (see :func:`einsum_hi`)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def tallqr(V: jnp.ndarray, MV: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """QR for tall-skinny matrices via Cholesky of the Gram matrix.

    V: (*B, na, nguess); MV: optional (*B, na, nguess) for M-orthogonality.
    Returns (Q, R) with Q M-orthonormal columns.

    The Gram matmul and the back-substitution run at HIGHEST matmul
    precision: on TPU the default is bf16 multiplies, which caps the
    orthogonality of Q at ~8e-3 — useless for an orthogonalization
    primitive (observed: chebfsi residuals flooring at 7e-3 on chip).
    """
    if MV is None:
        MV = V
    hi = jax.lax.Precision.HIGHEST
    VTV = jnp.matmul(jnp.swapaxes(V, -2, -1).conj(), MV,
                     precision=hi)  # (*B, ng, ng)
    # add a tiny ridge for numerical safety on TPU float32
    eps = jnp.finfo(V.dtype).eps
    ridge = eps * jnp.trace(VTV.real, axis1=-2, axis2=-1)[..., None, None] \
        * jnp.eye(VTV.shape[-1], dtype=VTV.dtype)
    L = jnp.linalg.cholesky(VTV + ridge)  # lower
    R = jnp.swapaxes(L, -2, -1).conj()  # upper: R^H R = V^H M V
    # Q = V R^-1 via triangular solve of R^H Q^H = V^H (more accurate and
    # faster than materializing inv(R))
    QH = jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(V, -2, -1).conj(), lower=True)
    Q = jnp.swapaxes(QH, -2, -1).conj()
    return Q, R


def create_random_square_matrix(
    n: int,
    is_hermitian: bool = False,
    min_eival: float = 1.0,
    max_eival: float = 1.0,
    minabs_eival: float = 0.0,
    seed: int = 0,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """Random square matrix with controlled eigenvalue range (test/bench
    factory).  Constructed in host float64 (like the reference's torch-f64
    factory, tensor.py:50-73) so the spectrum is exact even when the target
    dtype/backend is low precision, then cast."""
    import numpy as np

    rng = np.random.default_rng(seed)
    eivals = np.linspace(min_eival, max_eival, n)
    sign = np.where(eivals >= 0, 1.0, -1.0)
    eivals = np.where(np.abs(eivals) < minabs_eival, sign * minabs_eival, eivals)
    if is_hermitian:
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        mat = (q * eivals) @ q.T
        mat = (mat + mat.T) * 0.5
    else:
        a = rng.standard_normal((n, n))
        a = a / np.linalg.norm(a, axis=-2, keepdims=True)
        mat = np.linalg.solve(a, eivals[:, None] * a)
    return jnp.asarray(mat, dtype=dtype)


def create_random_ortho_matrix(n: int, seed: int = 0, dtype=jnp.float64) -> jnp.ndarray:
    import numpy as np

    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return jnp.asarray(q, dtype=dtype)
