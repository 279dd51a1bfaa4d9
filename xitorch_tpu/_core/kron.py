"""Kronecker-structured matrix-free operators with direct TPU solve paths.

No reference analog (like ``_core/structured.py``): the reference cannot
exploit operator structure.  Separable 2-D problems (tensor-product
grids, lattice models, Sylvester/Lyapunov equations) factor as

* ``KronOperator(A1, A2)``      = A1 (x) A2                (n1*n2 square)
* ``KronSumOperator(A1, A2)``   = A1 (x) I  +  I (x) A2    (e.g. 2-D
  Laplacian from two 1-D ones)

Both apply as two batched matmuls on the (n1, n2)-reshaped input — pure
MXU work, O(n^1.5) FLOPs per matvec in the full dimension N = n1*n2
instead of O(N^2).  For hermitian factors, ``linalg.solve(...,
method="kron_direct")`` solves in the factor eigenbases (the classic
"fast Poisson" route): eigh of the two small factors — on TPU these hit
the Pallas Jacobi kernel (ops/jacobi_eigh.py) — two basis transforms, an
elementwise divide, and two transforms back.  O(n^3) in the factor sizes
vs O(N^3) dense.

vec convention is ROW-major (jnp.reshape): ``(A1 (x) A2) vec(X) =
vec(A1 X A2^T)``.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from xitorch_tpu._core.linop import LinearOperator

__all__ = ["KronOperator", "KronSumOperator"]


def _prep_factor(A, name):
    if isinstance(A, LinearOperator):
        herm = A.is_hermitian
        mat = A.fullmatrix()
    else:
        mat = jnp.asarray(A)
        herm = False
    if mat.ndim < 2 or mat.shape[-1] != mat.shape[-2]:
        raise RuntimeError(
            "%s factor must be a square matrix (*B, n, n), got %s"
            % (name, mat.shape))
    return mat, herm


class _KronBase(LinearOperator):
    def __init__(self, A1, A2, is_hermitian=None):
        m1, h1 = _prep_factor(A1, "first")
        m2, h2 = _prep_factor(A2, "second")
        if m1.dtype != m2.dtype:
            m2 = m2.astype(m1.dtype)
        if is_hermitian is None:
            is_hermitian = h1 and h2
        batch = jnp.broadcast_shapes(m1.shape[:-2], m2.shape[:-2])
        n = m1.shape[-1] * m2.shape[-1]
        super().__init__(shape=(*batch, n, n), is_hermitian=is_hermitian,
                         dtype=m1.dtype, _suppress_hermit_warning=True)
        self.A1 = m1
        self.A2 = m2
        self.n1 = m1.shape[-1]
        self.n2 = m2.shape[-1]

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "A1", prefix + "A2"]

    def _unvec(self, x):
        # x: (*Bx, n1*n2) -> (*Bx, n1, n2)
        return x.reshape(*x.shape[:-1], self.n1, self.n2)

    def _vec(self, X):
        return X.reshape(*X.shape[:-2], self.n1 * self.n2)


class KronOperator(_KronBase):
    r"""``A1 (x) A2`` as a matrix-free LinearOperator.

    Factors may be arrays or (explicit) LinearOperators; hermitian iff
    both factors are (or pass ``is_hermitian`` explicitly).  The matvec
    is ``vec(A1 X A2^T)`` — two MXU matmuls on the reshaped input.
    """

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        X = self._unvec(x)
        Y = jnp.einsum("...ij,...jk,...lk->...il", self.A1, X, self.A2)
        return self._vec(Y)

    def _fullmatrix(self) -> jnp.ndarray:
        batch = self.shape[:-2]
        m1 = jnp.broadcast_to(self.A1, (*batch, self.n1, self.n1))
        m2 = jnp.broadcast_to(self.A2, (*batch, self.n2, self.n2))
        out = m1[..., :, None, :, None] * m2[..., None, :, None, :]
        return out.reshape(*batch, self.n1 * self.n2, self.n1 * self.n2)


class KronSumOperator(_KronBase):
    r"""Kronecker sum ``A1 (x) I + I (x) A2`` (e.g. the 2-D Laplacian
    built from two 1-D Laplacians).

    Eigenvalues are all pairwise sums ``lam1_i + lam2_j`` with
    eigenvectors ``v1_i (x) v2_j`` — ``linalg.solve(...,
    method="kron_direct")`` exploits this for hermitian factors.
    """

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        X = self._unvec(x)
        Y = (jnp.einsum("...ij,...jk->...ik", self.A1, X)
             + jnp.einsum("...jk,...lk->...jl", X, self.A2))
        return self._vec(Y)

    def _fullmatrix(self) -> jnp.ndarray:
        batch = self.shape[:-2]
        m1 = jnp.broadcast_to(self.A1, (*batch, self.n1, self.n1))
        m2 = jnp.broadcast_to(self.A2, (*batch, self.n2, self.n2))
        e1 = jnp.eye(self.n1, dtype=self.dtype)
        e2 = jnp.eye(self.n2, dtype=self.dtype)
        out = (m1[..., :, None, :, None] * e2[:, None, :]
               + e1[..., :, None, :, None] * m2[..., None, :, None, :])
        return out.reshape(*batch, self.n1 * self.n2, self.n1 * self.n2)
