"""jac/hess LinearOperator tests (model: reference xitorch/_tests/test_jac.py)."""
import jax
import jax.numpy as jnp

from xitorch_tpu.grad import jac, hess
from tests.utils import assert_allclose


def fcn(a, b):
    return jnp.tanh(a @ b + b)


def test_jac_mv_rmv(rng):
    a = jnp.asarray(rng.standard_normal((3, 3)))
    b = jnp.asarray(rng.standard_normal((3,)))
    jacs = jac(fcn, (a, b))
    assert len(jacs) == 2

    # dense reference jacobians
    Ja = jax.jacobian(fcn, argnums=0)(a, b).reshape(3, -1)
    Jb = jax.jacobian(fcn, argnums=1)(a, b).reshape(3, -1)

    va = jnp.asarray(rng.standard_normal((9,)))
    vb = jnp.asarray(rng.standard_normal((3,)))
    vout = jnp.asarray(rng.standard_normal((3,)))

    assert jacs[0].shape == (3, 9)
    assert_allclose(jacs[0].mv(va), Ja @ va, rtol=1e-6)
    assert_allclose(jacs[1].mv(vb), Jb @ vb, rtol=1e-6)
    assert_allclose(jacs[0].rmv(vout), Ja.T @ vout, rtol=1e-6)
    assert_allclose(jacs[1].rmv(vout), Jb.T @ vout, rtol=1e-6)

    # batched mv
    vbatch = jnp.asarray(rng.standard_normal((5, 3)))
    assert_allclose(jacs[1].mv(vbatch), vbatch @ Jb.T, rtol=1e-6)

    # idxs as int returns the operator directly
    j0 = jac(fcn, (a, b), idxs=0)
    assert_allclose(j0.mv(va), Ja @ va, rtol=1e-6)

    # fullmatrix
    assert_allclose(jacs[0].fullmatrix(), Ja, rtol=1e-6)


def test_hess(rng):
    a = jnp.asarray(rng.standard_normal((4, 4)))
    a = a + a.T

    def f(x, a):
        return jnp.sum(jnp.sin(x) @ a @ x + x ** 3)

    x = jnp.asarray(rng.standard_normal((4,)))
    h = hess(f, (x, a), idxs=0)
    assert h.is_hermitian
    Hd = jax.hessian(f, argnums=0)(x, a)
    v = jnp.asarray(rng.standard_normal((4,)))
    assert_allclose(h.mv(v), Hd @ v, rtol=1e-6)


def test_jac_traceable(rng):
    """jac must work inside jit and grad."""
    a = jnp.asarray(rng.standard_normal((3, 3)))
    b = jnp.asarray(rng.standard_normal((3,)))
    v = jnp.asarray(rng.standard_normal((3,)))

    @jax.jit
    def g(a, b, v):
        return jac(fcn, (a, b), idxs=1).mv(v)

    Jb = jax.jacobian(fcn, argnums=1)(a, b)
    assert_allclose(g(a, b, v), Jb @ v, rtol=1e-6)

    # differentiating through the jvp product
    def loss(a):
        return jnp.sum(jac(fcn, (a, b), idxs=1).mv(v) ** 2)

    gref = jax.grad(lambda a: jnp.sum((jax.jacobian(fcn, argnums=1)(a, b) @ v) ** 2))(a)
    assert_allclose(jax.grad(loss)(a), gref, rtol=1e-6)
