"""Nested implicit adjoints: davidson symeig inside equilibrium (config 5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu.models.scf import scf_density, scf_energy, _density
from tests.utils import assert_allclose


def make_a(rng, n):
    return jnp.asarray(rng.standard_normal((n, n)))


@pytest.mark.parametrize("eig_method", ["exacteig", "davidson"])
def test_scf_fixed_point(eig_method, rng):
    n, nocc = 10, 2
    a = make_a(rng, n)
    g = jnp.asarray(0.3)
    rho = scf_density(a, g, nocc=nocc, eig_method=eig_method)
    # rho must satisfy the consistency equation
    rho2 = _density(a, g, rho, nocc, eig_method,
                    **({"min_eps": 1e-11, "max_niter": 4000}
                       if eig_method == "davidson" else {}))
    assert_allclose(rho, rho2, atol=1e-6)
    assert_allclose(jnp.sum(rho), float(nocc), atol=1e-6)


@pytest.mark.parametrize("eig_method", ["exacteig", "davidson"])
def test_scf_gradients_nested_adjoints(eig_method, rng):
    n, nocc = 8, 2
    a = make_a(rng, n)
    g = jnp.asarray(0.2)

    kw = dict(nocc=nocc, eig_method=eig_method, f_tol=1e-11, maxiter=2000)
    if eig_method == "davidson":
        kw["eig_options"] = {"min_eps": 1e-11, "max_niter": 4000}

    def energy(a, g):
        return scf_energy(a, g, **kw)

    # finite-difference oracle on the full nested stack
    e0 = energy(a, g)
    ga, gg = jax.grad(energy, argnums=(0, 1))(a, g)
    eps = 1e-5
    # probe a few random directions for the a-gradient
    rng2 = np.random.default_rng(7)
    for _ in range(3):
        da = jnp.asarray(rng2.standard_normal(a.shape))
        da = da / jnp.linalg.norm(da)
        fd = (energy(a + eps * da, g) - energy(a - eps * da, g)) / (2 * eps)
        an = jnp.sum(ga * da)
        assert_allclose(an, fd, rtol=2e-4, atol=1e-6)
    fdg = (energy(a, g + eps) - energy(a, g - eps)) / (2 * eps)
    assert_allclose(gg, fdg, rtol=2e-4, atol=1e-6)


def test_scf_jit():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((8, 8)))
    g = jnp.asarray(0.25)

    @jax.jit
    def dens(a, g):
        return scf_density(a, g, nocc=2, eig_method="exacteig")

    rho = dens(a, g)
    assert_allclose(jnp.sum(rho), 2.0, atol=1e-6)
