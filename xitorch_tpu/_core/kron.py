"""Kronecker-structured matrix-free operators with direct TPU solve paths.

No reference analog (like ``_core/structured.py``): the reference cannot
exploit operator structure.  Separable N-D problems (tensor-product
grids, lattice models, Sylvester/Lyapunov equations) factor as

* ``KronOperator(A1, ..., Ak)``    = A1 (x) ... (x) Ak
* ``KronSumOperator(A1, ..., Ak)`` = sum_i I (x)..(x) Ai (x)..(x) I
  (e.g. a 2-D/3-D Laplacian from 1-D ones)

Both apply as one batched matmul per factor on the tensor-reshaped input
— pure MXU work, O(N * sum_i n_i) FLOPs per matvec in the full dimension
N = prod n_i instead of O(N^2).  For hermitian factors,
``linalg.solve(..., method="kron_direct")`` solves in the factor
eigenbases (the classic "fast Poisson" route): eigh of each small factor
— on TPU these hit the Pallas Jacobi kernel (ops/jacobi_eigh.py) — one
basis transform per axis, an elementwise divide, and the transforms
back.  O(sum n_i^3) vs O(N^3) dense.  ``symeig(method="kron_exact")``
returns exact eigenpairs the same way.

vec convention is ROW-major (jnp.reshape): for two factors,
``(A1 (x) A2) vec(X) = vec(A1 X A2^T)``.
"""
from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp

from xitorch_tpu._core.linop import LinearOperator

__all__ = ["KronOperator", "KronSumOperator"]


def _prep_factor(A, i):
    if isinstance(A, LinearOperator):
        herm = A.is_hermitian
        mat = A.fullmatrix()
    else:
        mat = jnp.asarray(A)
        herm = False
    if mat.ndim < 2 or mat.shape[-1] != mat.shape[-2]:
        raise RuntimeError(
            "Kron factor %d must be a square matrix (*B, n, n), got %s"
            % (i, mat.shape))
    return mat, herm


def _kron2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched kron of (*B, p, p) and (*B, q, q) -> (*B, p*q, p*q)."""
    p, q = a.shape[-1], b.shape[-1]
    out = a[..., :, None, :, None] * b[..., None, :, None, :]
    return out.reshape(*out.shape[:-4], p * q, p * q)


class _KronBase(LinearOperator):
    def __init__(self, *factors, is_hermitian=None):
        if len(factors) < 2:
            raise RuntimeError(
                "%s needs at least two factors" % type(self).__name__)
        mats, herms = [], []
        for i, f in enumerate(factors):
            m, h = _prep_factor(f, i)
            mats.append(m)
            herms.append(h)
        # promote, never truncate: casting to the first factor's dtype
        # would silently drop imaginary parts / downcast f64
        dtype = jnp.result_type(*mats)
        mats = [m.astype(dtype) for m in mats]
        if is_hermitian is None:
            is_hermitian = all(herms)
        batch = jnp.broadcast_shapes(*(m.shape[:-2] for m in mats))
        n = math.prod(m.shape[-1] for m in mats)
        super().__init__(shape=(*batch, n, n), is_hermitian=is_hermitian,
                         dtype=dtype, _suppress_hermit_warning=True)
        self.factors = tuple(mats)
        self.dims = tuple(m.shape[-1] for m in mats)
        # 2-factor convenience aliases (Sylvester-style usage)
        self.n1 = self.dims[0]
        self.n2 = self.dims[-1]

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "factors"]

    # --- tensor plumbing: apply a matrix along grid axis i of the
    # row-major flattened input; pre/post dims are flattened so one
    # einsum form serves every axis and any factor batch dims ---
    def _apply_axis(self, x, mat, i, extra=1, hi=True):
        """x: (*Bx, N*extra) with N = prod(dims) and ``extra`` trailing
        columns folded in; applies ``mat`` along grid axis i.  HIGHEST
        precision by default: these matvecs feed iterative solvers'
        residuals (CLAUDE.md precision rule; MatrixLinearOperator makes
        the same choice)."""
        import jax

        pre = math.prod(self.dims[:i])
        ni = self.dims[i]
        post = math.prod(self.dims[i + 1:]) * extra
        xr = x.reshape(*x.shape[:-1], pre, ni, post)
        prec = jax.lax.Precision.HIGHEST if hi else None
        yr = jnp.einsum("...ij,...pjq->...piq", mat, xr, precision=prec)
        return yr.reshape(*x.shape[:-1], pre * ni * post)

    @staticmethod
    def _combine(a, b):
        """How per-factor eigenvalues merge into the full spectrum (sum
        for Kronecker sums, product for Kronecker products) — intrinsic
        to the operator class, used by kron_direct/kron_exact."""
        raise NotImplementedError

    def combined_eigendecomposition(self, combine=None):
        """eigh every factor (degeneracy-safe) and return
        ``(eigenvalue grid (*B, n1, ..., nk), [V_i factor eigvecs])``
        where the grid entries are ``self._combine``-reduced over axes."""
        from xitorch_tpu._impls.linalg.symeig import degen_eigh

        if combine is None:
            combine = self._combine

        sym = lambda m: (m + jnp.swapaxes(m, -2, -1).conj()) * 0.5
        ls, Vs = [], []
        for m in self.factors:
            l, V = degen_eigh(sym(m))
            ls.append(l)
            Vs.append(V)
        batch = jnp.broadcast_shapes(*(l.shape[:-1] for l in ls))
        k = len(self.dims)
        comb = None
        for i, l in enumerate(ls):
            shape = (*l.shape[:-1], *(1,) * i, self.dims[i],
                     *(1,) * (k - 1 - i))
            le = l.reshape(shape)
            comb = le if comb is None else combine(comb, le)
        comb = jnp.broadcast_to(comb, (*batch, *self.dims))
        return comb, Vs


class KronOperator(_KronBase):
    r"""``A1 (x) A2 (x) ... (x) Ak`` as a matrix-free LinearOperator.

    Factors may be arrays or (explicit) LinearOperators; hermitian iff
    all factors are (or pass ``is_hermitian`` explicitly).  The matvec
    applies one MXU matmul per factor on the tensor-reshaped input.
    """

    @staticmethod
    def _combine(a, b):
        return a * b

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, m in enumerate(self.factors):
            x = self._apply_axis(x, m, i)
        return x

    def _fullmatrix(self) -> jnp.ndarray:
        batch = self.shape[:-2]
        out = jnp.broadcast_to(self.factors[0],
                               (*batch, self.dims[0], self.dims[0]))
        for m, d in zip(self.factors[1:], self.dims[1:]):
            out = _kron2(out, jnp.broadcast_to(m, (*batch, d, d)))
        return out


class KronSumOperator(_KronBase):
    r"""Kronecker sum ``sum_i I (x) .. (x) A_i (x) .. (x) I`` (e.g. the
    N-D Laplacian built from 1-D ones).

    Eigenvalues are all sums ``sum_i lam_i[j_i]`` with eigenvectors
    ``v_1[j_1] (x) ... (x) v_k[j_k]`` — ``linalg.solve(...,
    method="kron_direct")`` and ``symeig(..., method="kron_exact")``
    exploit this for hermitian factors.
    """

    @staticmethod
    def _combine(a, b):
        return a + b

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        y = None
        for i, m in enumerate(self.factors):
            t = self._apply_axis(x, m, i)
            y = t if y is None else y + t
        return y

    def _fullmatrix(self) -> jnp.ndarray:
        batch = self.shape[:-2]
        out = None
        for i, (m, d) in enumerate(zip(self.factors, self.dims)):
            pre = math.prod(self.dims[:i])
            post = math.prod(self.dims[i + 1:])
            term = jnp.broadcast_to(m, (*batch, d, d))
            if pre > 1:
                eye_p = jnp.broadcast_to(jnp.eye(pre, dtype=self.dtype),
                                         (*batch, pre, pre))
                term = _kron2(eye_p, term)
            if post > 1:
                eye_q = jnp.broadcast_to(jnp.eye(post, dtype=self.dtype),
                                         (*batch, post, post))
                term = _kron2(term, eye_q)
            out = term if out is None else out + term
        return out
