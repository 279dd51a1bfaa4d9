"""Neural-network module integration (model: reference
test_wrap_nnmodule.py — TorchNNPureFunction parity): a flax module's bound
apply captured in the functional's closure must receive gradients through
the implicit solve, via closure_convert."""
import jax
import jax.numpy as jnp
import pytest

from xitorch_tpu.optimize import rootfinder, equilibrium
from tests.utils import assert_allclose


def test_flax_module_closure_grads():
    flax = pytest.importorskip("flax")
    import flax.linen as nn

    class Cell(nn.Module):
        feats: int = 3

        @nn.compact
        def __call__(self, z):
            # +0.5 shift keeps the root away from the trivial z*=0
            return jnp.tanh(nn.Dense(self.feats, use_bias=True)(z) + 0.5) - z

    model = Cell()
    z0 = jnp.zeros((3,))
    variables = model.init(jax.random.PRNGKey(0), z0)

    def loss_closure(variables):
        # module params hidden inside the closure -> closure_convert path
        fcn = lambda z: model.apply(variables, z)
        zstar = rootfinder(fcn, z0, f_tol=1e-12, maxiter=2000)
        return jnp.sum(zstar ** 2)

    def loss_explicit(variables):
        flat, unravel = jax.flatten_util.ravel_pytree(variables)
        fcn = lambda z, fl: model.apply(unravel(fl), z)
        zstar = rootfinder(fcn, z0, params=(flat,), f_tol=1e-12, maxiter=2000)
        return jnp.sum(zstar ** 2)

    l1 = loss_closure(variables)
    l2 = loss_explicit(variables)
    assert_allclose(l1, l2, rtol=1e-9)

    g1 = jax.grad(loss_closure)(variables)
    g2 = jax.grad(loss_explicit)(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert_allclose(a, b, rtol=1e-6, atol=1e-10)
    # gradients must be non-trivial
    assert float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(g1))) > 1e-6


def test_equilibrium_deq_with_flax():
    flax = pytest.importorskip("flax")
    import flax.linen as nn

    class F(nn.Module):
        @nn.compact
        def __call__(self, z, x):
            return jnp.tanh(nn.Dense(4)(z) * 0.5 + x)

    model = F()
    x = jnp.ones((4,)) * 0.3
    z0 = jnp.zeros((4,))
    variables = model.init(jax.random.PRNGKey(1), z0, x)

    def run(variables, x):
        zstar = equilibrium(lambda z: model.apply(variables, z, x), z0,
                            f_tol=1e-11, maxiter=1000)
        return zstar

    z = run(variables, x)
    assert_allclose(model.apply(variables, z, x), z, atol=1e-6)
    g = jax.grad(lambda x: jnp.sum(run(variables, x) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).sum()) > 1e-8
