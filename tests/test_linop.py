"""LinearOperator contract tests (model: reference xitorch/_tests/test_linop.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu import LinearOperator, MatrixLinearOperator, checklinop
from tests.utils import assert_allclose


class NeuralOp(LinearOperator):
    """Matrix-free operator: A = W1 @ W2 (never materialized directly)."""

    def __init__(self, w1, w2):
        super().__init__(shape=(*w1.shape[:-2], w1.shape[-2], w2.shape[-1]),
                         dtype=w1.dtype)
        self.w1 = w1
        self.w2 = w2

    def _getparamnames(self, prefix=""):
        return [prefix + "w1", prefix + "w2"]

    def _mv(self, x):
        return jnp.einsum("...pq,...q->...p", self.w1,
                          jnp.einsum("...qr,...r->...q", self.w2, x))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_matrix_linop_basic(dtype, rng):
    mat = jnp.asarray(rng.standard_normal((3, 1, 4, 5)), dtype=dtype)
    linop = LinearOperator.m(mat)
    assert linop.shape == (3, 1, 4, 5)
    assert not linop.is_hermitian

    x = jnp.asarray(rng.standard_normal((3, 1, 5)), dtype=dtype)
    assert_allclose(linop.mv(x), jnp.einsum("...pq,...q->...p", mat, x), rtol=1e-5)

    xm = jnp.asarray(rng.standard_normal((3, 1, 5, 2)), dtype=dtype)
    assert_allclose(linop.mm(xm), mat @ xm, rtol=1e-5)

    v = jnp.asarray(rng.standard_normal((3, 1, 4)), dtype=dtype)
    assert_allclose(linop.rmv(v), jnp.einsum("...qp,...q->...p", mat, v), rtol=1e-5)

    assert_allclose(linop.fullmatrix(), mat)


def test_checklinop_matrix(rng):
    mat = jnp.asarray(rng.standard_normal((2, 4, 4)))
    checklinop(LinearOperator.m(mat))
    sym = mat + jnp.swapaxes(mat, -2, -1)
    checklinop(LinearOperator.m(sym, is_hermitian=True))


def test_checklinop_matrixfree(rng):
    w1 = jnp.asarray(rng.standard_normal((4, 3)))
    w2 = jnp.asarray(rng.standard_normal((3, 5)))
    op = NeuralOp(w1, w2)
    checklinop(op)
    # default rmv (adjoint through vjp) equals explicit adjoint
    v = jnp.asarray(rng.standard_normal((4,)))
    assert_allclose(op.rmv(v), (w1 @ w2).T @ v, rtol=1e-6)
    # default mm equals explicit
    xm = jnp.asarray(rng.standard_normal((5, 3)))
    assert_allclose(op.mm(xm), (w1 @ w2) @ xm, rtol=1e-6)


def test_complex_adjoint(rng):
    re = rng.standard_normal((4, 4))
    im = rng.standard_normal((4, 4))
    mat = jnp.asarray(re + 1j * im)

    class C(LinearOperator):
        def __init__(self, m):
            super().__init__(shape=m.shape, dtype=m.dtype)
            self.m_ = m

        def _getparamnames(self, prefix=""):
            return [prefix + "m_"]

        def _mv(self, x):
            return jnp.einsum("...pq,...q->...p", self.m_, x)

    op = C(mat)
    v = jnp.asarray(rng.standard_normal((4,)) + 1j * rng.standard_normal((4,)))
    # default rmv must be the Hermitian adjoint
    assert_allclose(op.rmv(v), mat.conj().T @ v, rtol=1e-6)
    assert_allclose(op.H.mv(v), mat.conj().T @ v, rtol=1e-6)


def test_linop_algebra(rng):
    a = jnp.asarray(rng.standard_normal((2, 3, 3)))
    b = jnp.asarray(rng.standard_normal((2, 3, 3)))
    opa, opb = LinearOperator.m(a), LinearOperator.m(b)
    x = jnp.asarray(rng.standard_normal((2, 3)))
    assert_allclose((opa + opb).mv(x), jnp.einsum("...pq,...q->...p", a + b, x))
    assert_allclose((opa - opb).mv(x), jnp.einsum("...pq,...q->...p", a - b, x))
    assert_allclose((opa @ opb).mv(x), jnp.einsum("...pq,...q->...p", a @ b, x))
    assert_allclose((2.0 * opa).mv(x), 2 * jnp.einsum("...pq,...q->...p", a, x))
    assert_allclose(opa.H.mv(x), jnp.einsum("...qp,...q->...p", a, x))


def test_linop_pytree(rng):
    """LinearOperator must be a pytree: jit/grad/vmap-able."""
    mat = jnp.asarray(rng.standard_normal((4, 4)))
    op = LinearOperator.m(mat)
    leaves = jax.tree_util.tree_leaves(op)
    assert len(leaves) == 1 and leaves[0].shape == (4, 4)

    @jax.jit
    def f(op, x):
        return op.mv(x)

    x = jnp.asarray(rng.standard_normal((4,)))
    assert_allclose(f(op, x), mat @ x)

    # grad through the operator's parameters
    def loss(op, x):
        return jnp.sum(op.mv(x) ** 2)

    g = jax.grad(loss)(op, x)
    assert isinstance(g, MatrixLinearOperator)
    expected = 2 * jnp.outer(mat @ x, x)
    assert_allclose(g.mat, expected, rtol=1e-6)

    # vmap over a batch of operators
    mats = jnp.asarray(rng.standard_normal((5, 4, 4)))
    ops = jax.vmap(lambda m: LinearOperator.m(m, is_hermitian=False))(mats)
    ys = jax.vmap(lambda o, xx: o.mv(xx), in_axes=(0, None))(ops, x)
    assert_allclose(ys, jnp.einsum("bpq,q->bp", mats, x))


def test_linop_errors(rng):
    mat = jnp.asarray(rng.standard_normal((4, 5)))
    op = LinearOperator.m(mat)
    with pytest.raises(RuntimeError):
        op.mv(jnp.zeros(4))  # wrong inner dim
    with pytest.raises(RuntimeError):
        op.rmv(jnp.zeros(5))
    with pytest.raises(RuntimeError):
        op.mm(jnp.zeros((4, 2)))
    with pytest.raises(RuntimeError):
        LinearOperator.m(mat, is_hermitian=True) + op  # non-square hermitian

    with pytest.raises(RuntimeError):
        class NoMV(LinearOperator):
            def __init__(self):
                super().__init__(shape=(3, 3))
        NoMV().mv(jnp.zeros(3))


def test_scipy_bridge(rng):
    mat = jnp.asarray(rng.standard_normal((4, 4)))
    op = LinearOperator.m(mat)
    sp = op.scipy_linalg_op()
    v = rng.standard_normal(4)
    assert_allclose(sp.matvec(v), np.asarray(mat) @ v, rtol=1e-6)


def test_bcast_mv_broadcasts_before_subclass_mv(rng):
    """mv/mm broadcast x's batch dims against the operator's before the
    subclass _mv runs, so a _mv relying on fully-broadcast shapes is safe
    (reference linop.py:215-274 semantics)."""
    from xitorch_tpu import LinearOperator

    class DiagOp(LinearOperator):
        def __init__(self, d):  # d: (B, n)
            n = d.shape[-1]
            super().__init__(shape=(*d.shape[:-1], n, n), is_hermitian=True,
                             dtype=d.dtype)
            self.d = d

        def _getparamnames(self, prefix=""):
            return [prefix + "d"]

        def _mv(self, x):
            # relies on x having the operator's full batch shape
            assert x.shape == self.d.shape
            return self.d * x

    d = jnp.asarray(rng.standard_normal((3, 5)))
    op = DiagOp(d)
    x1 = jnp.asarray(rng.standard_normal((5,)))       # unbatched input
    y = op.mv(x1)
    assert y.shape == (3, 5)
    assert_allclose(y, d * x1)
    xm = jnp.asarray(rng.standard_normal((5, 2)))     # unbatched matrix
    ym = op.mm(xm)
    assert ym.shape == (3, 5, 2)
    assert_allclose(ym, d[..., None] * xm)
    # incompatible batch shapes still fail loudly
    xbad = jnp.asarray(rng.standard_normal((4, 5)))
    with pytest.raises(Exception):
        op.mv(xbad)
