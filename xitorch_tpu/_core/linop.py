"""Matrix-free batched LinearOperator, registered as a JAX pytree.

TPU-native redesign of the reference's LinearOperator
(/root/reference/xitorch/_core/linop.py:15-27): the same public contract —
shape ``(*B, p, q)`` with broadcastable batch dims, a required ``_mv`` and
optional ``_mm/_rmv/_rmm/_fullmatrix`` — but state plumbing is JAX-native:

* Every subclass is automatically **registered as a pytree**.  The dynamic
  leaves (the operator's differentiable parameters) are declared by
  ``_getparamnames()`` — the direct analog of the reference's
  ``_getparamnames`` / ``getlinopparams`` (linop.py:139, 464-489), except
  that here the declaration makes the operator directly traceable through
  ``jit``/``grad``/``vmap``/``pjit`` with no ``uselinopparams`` context
  managers.
* ``rmv``/``rmm`` default to the *exact* adjoint through ``jax.vjp`` (the
  reference's "adjoint trick", linop.py:524-543), which stays differentiable
  to arbitrary order.
* ``mm`` defaults to a ``vmap`` of ``mv`` over the column dimension
  (reference moves columns into a batch dim manually, linop.py:262-274).

Hot paths (explicit-matrix ``mv``/``mm``) lower straight to batched einsum →
XLA → MXU; see ``xitorch_tpu.ops`` for Pallas-fused variants.
"""
from __future__ import annotations

import warnings
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from xitorch_tpu.utils.bcast import get_bcasted_dims
from xitorch_tpu.utils.exceptions import GetSetParamsError

__all__ = ["LinearOperator", "MatrixLinearOperator", "checklinop"]


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or hasattr(x, "aval")


def _linop_flatten(op: "LinearOperator"):
    names = op._pytree_paramnames()
    children = tuple(getattr(op, n) for n in names)
    static = tuple(sorted((k, v) for k, v in op.__dict__.items() if k not in names))
    return children, (type(op), tuple(names), static)


def _linop_flatten_with_keys(op: "LinearOperator"):
    children, aux = _linop_flatten(op)
    names = aux[1]
    keyed = tuple((jax.tree_util.GetAttrKey(n), c) for n, c in zip(names, children))
    return keyed, aux


def _linop_unflatten(aux, children):
    cls, names, static = aux
    obj = object.__new__(cls)
    for k, v in static:
        object.__setattr__(obj, k, v)
    for n, c in zip(names, children):
        object.__setattr__(obj, n, c)
    return obj


class LinearOperator:
    """Base class of a matrix-free linear operator with batched leading dims.

    A subclass must implement ``_mv(self, x)`` (matrix-vector product on the
    last dim) and, if it carries differentiable array state, declare the
    attribute names of that state in ``_getparamnames()``.  Everything else
    (``mm``, ``rmv``, ``rmm``, ``fullmatrix``, adjoints, operator algebra)
    has generic implementations.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            _linop_flatten_with_keys,
            _linop_unflatten,
            flatten_func=_linop_flatten,
        )

    # ------------------------- construction -------------------------
    def __init__(self, shape: Sequence[int],
                 is_hermitian: bool = False,
                 dtype=None,
                 device=None,  # accepted for API familiarity; placement is XLA's job
                 _suppress_hermit_warning: bool = False) -> None:
        if len(shape) < 2:
            raise RuntimeError("The shape must have at least 2 dimensions")
        if is_hermitian and shape[-1] != shape[-2]:
            raise RuntimeError("The object is indicated as Hermitian, but the shape is not square")
        self._shape = tuple(int(s) for s in shape)
        self._is_hermitian = bool(is_hermitian)
        self._dtype = jnp.dtype(dtype) if dtype is not None else jnp.dtype(jnp.float32)

    @classmethod
    def m(cls, mat: jnp.ndarray, is_hermitian: Optional[bool] = None) -> "MatrixLinearOperator":
        """Wrap an explicit (batched) matrix into a LinearOperator.

        Parity: reference ``LinearOperator.m`` (linop.py:60-107).
        """
        if is_hermitian is None:
            if mat.shape[-2] != mat.shape[-1]:
                is_hermitian = False
            else:
                # hermiticity check requires a concrete array; under tracing
                # the caller must pass is_hermitian explicitly
                try:
                    is_hermitian = bool(
                        jnp.allclose(mat, jnp.swapaxes(mat, -2, -1).conj()))
                except jax.errors.TracerBoolConversionError:
                    raise RuntimeError(
                        "LinearOperator.m() cannot auto-detect hermiticity of "
                        "a traced matrix; pass is_hermitian explicitly.")
        return MatrixLinearOperator(mat, is_hermitian)

    # ------------------------- to be overridden -------------------------
    def _getparamnames(self, prefix: str = "") -> List[str]:
        """Names of array attributes that parameterize this operator.

        These become the operator's pytree leaves: gradients flow through
        them and they are traced under jit/vmap/pjit.
        """
        return []

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "LinearOperator subclass %s must implement _mv" % type(self).__name__)

    def _mm(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (*B, q, c) -> (*B2, p, c); default: vmap the columns through mv
        xs = jnp.moveaxis(x, -1, 0)  # (c, *B, q)
        ys = jax.vmap(self._bcast_mv)(xs)  # (c, *B2, p)
        return jnp.moveaxis(ys, 0, -1)

    def _rmv(self, x: jnp.ndarray) -> jnp.ndarray:
        # default: exact adjoint of mv through vjp (differentiable at any order)
        return self._adjoint_rmv(x)

    def _rmm(self, x: jnp.ndarray) -> jnp.ndarray:
        xs = jnp.moveaxis(x, -1, 0)  # (c, *B, p)
        ys = jax.vmap(self.rmv)(xs)  # (c, *B2, q)
        return jnp.moveaxis(ys, 0, -1)

    def _fullmatrix(self) -> jnp.ndarray:
        nq = self.shape[-1]
        eye = jnp.eye(nq, dtype=self.dtype)  # (q, q)
        return self.mm(eye)  # (*B, p, q)

    # ------------------------- linear operator algebra -------------------------
    def matmul(self, b: "LinearOperator", is_hermitian: bool = False) -> "LinearOperator":
        """Compose two linear operators: ``self @ b``."""
        if self.shape[-1] != b.shape[-2]:
            raise RuntimeError(
                "Mismatch shape of matmul operation: %s and %s" % (self.shape, b.shape))
        return MatmulLinearOperator(self, b, is_hermitian=is_hermitian)

    def __matmul__(self, b: "LinearOperator") -> "LinearOperator":
        return self.matmul(b)

    def __add__(self, b: "LinearOperator") -> "LinearOperator":
        if not isinstance(b, LinearOperator):
            raise TypeError("Only LinearOperator can be added to LinearOperator")
        if self.shape[-2:] != b.shape[-2:]:
            raise RuntimeError(
                "Mismatch shape of add operation: %s and %s" % (self.shape, b.shape))
        # explicit operators fold to an explicit result (reference
        # linop.py:432-444) — repeated algebra otherwise builds deep
        # wrapper chains with one matvec per term
        if isinstance(self, MatrixLinearOperator) and \
                isinstance(b, MatrixLinearOperator):
            return MatrixLinearOperator(
                self.mat + b.mat,
                is_hermitian=self.is_hermitian and b.is_hermitian,
                precision=self._precision)
        return AddLinearOperator(self, b)

    def __sub__(self, b: "LinearOperator") -> "LinearOperator":
        if not isinstance(b, LinearOperator):
            raise TypeError("Only LinearOperator can be subtracted from LinearOperator")
        if self.shape[-2:] != b.shape[-2:]:
            raise RuntimeError(
                "Mismatch shape of sub operation: %s and %s" % (self.shape, b.shape))
        if isinstance(self, MatrixLinearOperator) and \
                isinstance(b, MatrixLinearOperator):
            return MatrixLinearOperator(
                self.mat - b.mat,
                is_hermitian=self.is_hermitian and b.is_hermitian,
                precision=self._precision)
        return AddLinearOperator(self, b, -1)

    def __rsub__(self, b):
        return b.__sub__(self)

    def __mul__(self, f: Union[int, float]):
        if not isinstance(f, (int, float)):
            raise TypeError("LinearOperator can only be multiplied with a scalar")
        if isinstance(self, MatrixLinearOperator):
            return MatrixLinearOperator(self.mat * f,
                                        is_hermitian=self.is_hermitian,
                                        precision=self._precision)
        return MulLinearOperator(self, f)

    def __rmul__(self, f):
        return self.__mul__(f)

    # ------------------------- public API -------------------------
    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Matrix-vector product: x ``(*Bx, q)`` -> ``(*Bout, p)``."""
        if x.shape[-1] != self.shape[-1]:
            raise RuntimeError(
                "Cannot operate .mv on shape %s. Expected (...,%d)"
                % (tuple(x.shape), self.shape[-1]))
        return self._bcast_mv(x)

    def mm(self, x: jnp.ndarray) -> jnp.ndarray:
        """Matrix-matrix product: x ``(*Bx, q, c)`` -> ``(*Bout, p, c)``."""
        if x.shape[-2] != self.shape[-1]:
            raise RuntimeError(
                "Cannot operate .mm on shape %s. Expected (...,%d,*)"
                % (tuple(x.shape), self.shape[-1]))
        return self._mm(x)

    def rmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Adjoint matrix-vector product ``A^H x``: ``(*Bx, p)`` -> ``(*Bout, q)``."""
        if x.shape[-1] != self.shape[-2]:
            raise RuntimeError(
                "Cannot operate .rmv on shape %s. Expected (...,%d)"
                % (tuple(x.shape), self.shape[-2]))
        if self.is_hermitian:
            return self._bcast_mv(x)
        return self._rmv(x)

    def rmm(self, x: jnp.ndarray) -> jnp.ndarray:
        """Adjoint matrix-matrix product ``A^H x``: ``(*Bx, p, c)`` -> ``(*Bout, q, c)``."""
        if x.shape[-2] != self.shape[-2]:
            raise RuntimeError(
                "Cannot operate .rmm on shape %s. Expected (...,%d,*)"
                % (tuple(x.shape), self.shape[-2]))
        if self.is_hermitian:
            return self._mm(x)
        return self._rmm(x)

    def fullmatrix(self) -> jnp.ndarray:
        return self._fullmatrix()

    def scipy_linalg_op(self):
        """Bridge to scipy.sparse.linalg.LinearOperator (CPU, eager only).

        Parity: reference linop.py:356-364.
        """
        import scipy.sparse.linalg

        def to_np(v):
            return np.asarray(jax.device_get(v))

        mv = lambda v: to_np(self.mv(jnp.asarray(v, dtype=self.dtype)))
        rmv = lambda v: to_np(self.rmv(jnp.asarray(v, dtype=self.dtype)))
        mm = lambda m: to_np(self.mm(jnp.asarray(m, dtype=self.dtype)))
        rmm = lambda m: to_np(self.rmm(jnp.asarray(m, dtype=self.dtype)))
        return scipy.sparse.linalg.LinearOperator(
            shape=tuple(self.shape[-2:]),
            matvec=mv, rmatvec=rmv, matmat=mm, rmatmat=rmm,
            dtype=np.dtype(str(jnp.dtype(self.dtype))))

    # ------------------------- properties -------------------------
    @property
    def H(self) -> "LinearOperator":
        """Hermitian conjugate (adjoint) of this operator."""
        if self.is_hermitian:
            return self
        return AdjointLinearOperator(self)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self._shape

    @property
    def is_hermitian(self) -> bool:
        return self._is_hermitian

    @property
    def dtype(self):
        return self._dtype

    # parity helpers (reference exposes these capability flags)
    @property
    def is_mv_implemented(self) -> bool:
        return True

    @property
    def is_getparamnames_implemented(self) -> bool:
        return True

    @property
    def is_fullmatrix_implemented(self) -> bool:
        """True when the subclass provides its own cheap ``_fullmatrix``
        (reference capability flag; drives the exactsolve default)."""
        return type(self)._fullmatrix is not LinearOperator._fullmatrix

    # ------------------------- param extraction (parity) -------------------------
    def getlinopparams(self) -> Sequence[jnp.ndarray]:
        """Return the operator's parameter leaves (pytree leaves)."""
        return tuple(jax.tree_util.tree_leaves(self))

    # ------------------------- internal helpers -------------------------
    def _pytree_paramnames(self) -> List[str]:
        names = []
        for name in self._getparamnames(""):
            root = name.split(".")[0].split("[")[0]
            if root not in names:
                names.append(root)
        for n in names:
            if n not in self.__dict__:
                raise GetSetParamsError(
                    "_getparamnames of %s declares unknown attribute %r"
                    % (type(self).__name__, n))
        return names

    def _bcast_mv(self, x: jnp.ndarray) -> jnp.ndarray:
        # broadcast x's batch dims against the operator's declared batch dims
        # before dispatching to the subclass _mv, so _mv always sees the
        # fully-broadcast batch shape (reference semantics, linop.py:215-274;
        # a subclass _mv that assumes full shapes would otherwise get wrong
        # shapes silently).  broadcast_to is free under XLA.
        bout = get_bcasted_dims(x.shape[:-1], self.shape[:-2])
        xb = jnp.broadcast_to(x, (*bout, x.shape[-1]))
        return self._mv(xb)

    def _adjoint_rmv(self, v: jnp.ndarray) -> jnp.ndarray:
        # v: (*Bv, p) -> (*Bout, q), computing A^H v exactly via vjp.
        # JAX's vjp of a holomorphic linear map computes A^T v (no conj), so
        # A^H v = conj(A^T conj(v)).
        bout = get_bcasted_dims(v.shape[:-1], self.shape[:-2])
        xshape = tuple(bout) + (self.shape[-1],)
        x0 = jnp.zeros(xshape, dtype=v.dtype)
        _, vjp_fn = jax.vjp(lambda x: self._bcast_mv(x), x0)
        if jnp.issubdtype(v.dtype, jnp.complexfloating):
            return jnp.conj(vjp_fn(jnp.conj(v))[0])
        return vjp_fn(v)[0]

    def __repr__(self) -> str:
        return "LinearOperator (%s) with shape %s, dtype = %s" % (
            type(self).__name__, self.shape, self.dtype)

    # ------------------------- debug check -------------------------
    def check(self, warn: bool = True) -> None:
        """Run expensive shape/linearity checks (debug mode).

        Silently skipped when the operator's leaves are tracers (under
        jit/grad/vmap): the numeric value checks need concrete arrays.
        """
        if any(isinstance(leaf, jax.core.Tracer)
               for leaf in jax.tree_util.tree_leaves(self)):
            return
        checklinop(self)
        if warn:
            warnings.warn("... LinearOperator.check is performed, which is an "
                          "expensive operation. Make sure to turn off debug "
                          "mode in production.")


class AdjointLinearOperator(LinearOperator):
    """A^H of another operator (reference linop.py:555-583)."""

    def __init__(self, obj: LinearOperator):
        super().__init__(
            shape=obj.shape[:-2] + (obj.shape[-1], obj.shape[-2]),
            is_hermitian=obj.is_hermitian,
            dtype=obj.dtype,
            _suppress_hermit_warning=True)
        self.obj = obj

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "obj"]

    def _mv(self, x):
        return self.obj.rmv(x)

    def _mm(self, x):
        return self.obj.rmm(x)

    def _rmv(self, x):
        return self.obj.mv(x)

    def _rmm(self, x):
        return self.obj.mm(x)

    @property
    def H(self):
        return self.obj


class MatmulLinearOperator(LinearOperator):
    """Composition a @ b (reference linop.py:585-613)."""

    def __init__(self, a: LinearOperator, b: LinearOperator, is_hermitian: bool = False):
        shape = (*get_bcasted_dims(a.shape[:-2], b.shape[:-2]), a.shape[-2], b.shape[-1])
        super().__init__(
            shape=shape,
            is_hermitian=is_hermitian,
            dtype=a.dtype,
            _suppress_hermit_warning=True)
        self.a = a
        self.b = b

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "a", prefix + "b"]

    def _mv(self, x):
        return self.a.mv(self.b.mv(x))

    def _mm(self, x):
        return self.a.mm(self.b.mm(x))

    def _rmv(self, x):
        return self.b.rmv(self.a.rmv(x))

    def _rmm(self, x):
        return self.b.rmm(self.a.rmm(x))


class AddLinearOperator(LinearOperator):
    """a + mul*b (reference linop.py:614-645)."""

    def __init__(self, a: LinearOperator, b: LinearOperator, mul: int = 1):
        shape = (*get_bcasted_dims(a.shape[:-2], b.shape[:-2]), *a.shape[-2:])
        super().__init__(
            shape=shape,
            is_hermitian=a.is_hermitian and b.is_hermitian,
            dtype=a.dtype,
            _suppress_hermit_warning=True)
        self.a = a
        self.b = b
        assert mul in (1, -1)
        self.mul = mul

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "a", prefix + "b"]

    def _mv(self, x):
        return self.a.mv(x) + self.mul * self.b.mv(x)

    def _mm(self, x):
        return self.a.mm(x) + self.mul * self.b.mm(x)

    def _rmv(self, x):
        return self.a.rmv(x) + self.mul * self.b.rmv(x)

    def _rmm(self, x):
        return self.a.rmm(x) + self.mul * self.b.rmm(x)


class MulLinearOperator(LinearOperator):
    """a * scalar (reference linop.py:646-675)."""

    def __init__(self, a: LinearOperator, f: Union[int, float]):
        super().__init__(
            shape=a.shape,
            is_hermitian=a.is_hermitian,
            dtype=a.dtype,
            _suppress_hermit_warning=True)
        self.a = a
        self.f = f

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "a"]

    def _mv(self, x):
        return self.a.mv(x) * self.f

    def _mm(self, x):
        return self.a.mm(x) * self.f

    def _rmv(self, x):
        return self.a.rmv(x) * self.f

    def _rmm(self, x):
        return self.a.rmm(x) * self.f


class MatrixLinearOperator(LinearOperator):
    """Explicit (batched) matrix as an operator — the MXU hot path.

    ``mv``/``mm`` lower to batched einsum which XLA tiles onto the MXU.
    (Reference linop.py:676-709.)

    Matmuls default to full (HIGHEST) precision: on TPU, XLA's default bf16
    MXU multiplies cap iterative-solver residuals at ~1e-2·κ, which silently
    breaks tight tolerances.  Pass ``precision=None`` (or
    ``jax.lax.Precision.DEFAULT``) to opt into fast bf16 multiplies.
    """

    def __init__(self, mat: jnp.ndarray, is_hermitian: bool,
                 precision="highest"):
        super().__init__(
            shape=tuple(mat.shape),
            is_hermitian=is_hermitian,
            dtype=mat.dtype,
            _suppress_hermit_warning=True)
        self.mat = mat
        self._precision = precision

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "mat"]

    def _mv(self, x):
        return jnp.einsum("...pq,...q->...p", self.mat, x,
                          precision=self._precision)

    def _mm(self, x):
        return jnp.matmul(self.mat, x, precision=self._precision)

    def _rmv(self, x):
        return jnp.einsum("...pq,...p->...q", self.mat.conj(), x,
                          precision=self._precision)

    def _rmm(self, x):
        return jnp.matmul(jnp.swapaxes(self.mat, -2, -1).conj(), x,
                          precision=self._precision)

    def _fullmatrix(self):
        return self.mat


def checklinop(linop: LinearOperator) -> None:
    """Verify a LinearOperator's shape handling, linearity and batch
    consistency across an input-shape grid.

    Parity: reference ``checklinop`` (linop.py:710-802); used both as a debug
    tool (``LinearOperator.check``) and in tests.
    """
    shape = linop.shape
    p, q = shape[-2:]
    batchshape = shape[:-2]

    def runtest(methodname, xshape, yshape, base_rank):
        x = jnp.asarray(
            np.random.default_rng(42).standard_normal(xshape), dtype=linop.dtype)
        fcn = getattr(linop, methodname)
        try:
            y = fcn(x)
        except Exception as e:
            raise AssertionError(
                "checklinop: .%s failed on input shape %s (operator shape %s). "
                "The _mv/_mm implementation is likely not batch-safe — use "
                "broadcasting ops (einsum '...pq,...q->...p') instead of plain "
                "matmul. Original error: %s" % (methodname, xshape, shape, e)) from e
        # check shape
        if tuple(y.shape) != tuple(yshape):
            raise AssertionError(
                "The shape of .%s output is %s, expected %s"
                % (methodname, tuple(y.shape), tuple(yshape)))
        # check linearity
        y2 = fcn(2.1 * x)
        if not np.allclose(np.asarray(y2), np.asarray(2.1 * y), atol=1e-5):
            raise AssertionError("The method .%s is not linear" % methodname)
        # check batch consistency: apply on one batch element of the extra dim
        if len(xshape) > base_rank + len(batchshape):
            y0 = fcn(x[0])
            if not np.allclose(np.asarray(y[0]), np.asarray(y0), atol=1e-5):
                raise AssertionError(
                    "The method .%s does not behave consistently on batched input"
                    % methodname)

    checks = [
        ("mv", (q,), (*batchshape, p), 1),
        ("rmv", (p,), (*batchshape, q), 1),
        ("mm", (q, 3), (*batchshape, p, 3), 2),
        ("rmm", (p, 3), (*batchshape, q, 3), 2),
    ]
    extra_batch = (2,)
    for methodname, xshape, yshape, base_rank in checks:
        runtest(methodname, xshape, yshape, base_rank)
        # batched input
        bx = (*extra_batch, *batchshape, *xshape)
        by = (*extra_batch, *yshape)
        runtest(methodname, bx, by, base_rank)

    # fullmatrix consistency with mv
    full = np.asarray(linop.fullmatrix())
    x = np.random.default_rng(0).standard_normal((q,))
    y_mv = np.asarray(linop.mv(jnp.asarray(x, dtype=linop.dtype)))
    y_full = full @ x
    if not np.allclose(y_mv, y_full, atol=1e-5):
        raise AssertionError(".fullmatrix() is inconsistent with .mv()")
