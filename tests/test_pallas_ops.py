"""Pallas kernel tests (interpret mode on CPU — the kernels execute in CI
even without a TPU; compiled-mode numbers come from the benchmarks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import assert_allclose


def make_spd32(rng, batch, n):
    a = rng.standard_normal((*batch, n, n)).astype(np.float32)
    a = a + np.swapaxes(a, -2, -1)
    a = a + n * np.eye(n, dtype=np.float32)
    return jnp.asarray(a)


def test_fused_cg_interpret_matches_dense(rng):
    from xitorch_tpu.ops.fused_cg import fused_cg_dense

    n, nc, b = 24, 2, 3
    Am = make_spd32(rng, (b,), n)
    Bm = jnp.asarray(rng.standard_normal((b, n, nc)), jnp.float32)
    x = fused_cg_dense(Am, Bm, rtol=1e-6, atol=1e-8, interpret=True)
    expected = jnp.linalg.solve(Am, Bm)
    assert_allclose(x, expected, rtol=1e-4, atol=1e-5)


def test_fused_cg_interpret_unbatched_and_bcast(rng):
    from xitorch_tpu.ops.fused_cg import fused_cg_dense

    n = 16
    Am = make_spd32(rng, (), n)
    Bm = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    x = fused_cg_dense(Am, Bm, interpret=True)
    assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-4, atol=1e-5)


def test_fits_fused_cg_gate():
    from xitorch_tpu.ops.fused_cg import fits_fused_cg

    assert fits_fused_cg(512, 1, jnp.float32)
    assert not fits_fused_cg(4096, 1, jnp.float32)   # VMEM budget
    assert not fits_fused_cg(64, 1, jnp.float64)     # no native f64
    assert not fits_fused_cg(64, 1, jnp.complex64)   # no complex


def _rand_tridiag(rng, batch, n):
    d = jnp.asarray(3.0 + rng.uniform(0, 1, (*batch, n)), jnp.float32)
    dl = jnp.asarray(rng.standard_normal((*batch, n)), jnp.float32)
    du = jnp.asarray(rng.standard_normal((*batch, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((*batch, n)), jnp.float32)
    return dl, d, du, b


def _dense_tridiag(dl, d, du):
    n = d.shape[-1]
    T = (jnp.zeros((*d.shape, n), d.dtype)
         + d[..., None] * jnp.eye(n, dtype=d.dtype))
    idx = jnp.arange(n - 1)
    T = T.at[..., idx + 1, idx].set(dl[..., 1:])
    T = T.at[..., idx, idx + 1].set(du[..., :-1])
    return T


@pytest.mark.parametrize("batch", [(), (5,), (2, 3)])
def test_tridiag_pallas_interpret_matches_dense(batch, rng):
    from xitorch_tpu.ops.tridiag import tridiag_solve_pallas

    n = 17
    dl, d, du, b = _rand_tridiag(rng, batch, n)
    x = tridiag_solve_pallas(dl, d, du, b, interpret=True, tile=4)
    T = _dense_tridiag(dl, d, du)
    expected = jnp.linalg.solve(T, b[..., None])[..., 0]
    assert_allclose(x, expected, rtol=1e-4, atol=1e-5)


def test_tridiag_solve_grads(rng):
    """custom_linear_solve wrapper: grads to rhs and diagonals match the
    dense oracle (1st and 2nd order)."""
    from xitorch_tpu.ops.tridiag import tridiag_solve

    n = 9
    dl, d, du, b = _rand_tridiag(rng, (), n)
    dl = dl.astype(jnp.float64); d = d.astype(jnp.float64)
    du = du.astype(jnp.float64); b = b.astype(jnp.float64)

    def via_kernel(dl, d, du, b):
        return jnp.sum(tridiag_solve(dl, d, du, b, interpret=True) ** 3)

    def via_dense(dl, d, du, b):
        T = _dense_tridiag(dl, d, du)
        return jnp.sum(jnp.linalg.solve(T, b[..., None])[..., 0] ** 3)

    for argnum in range(4):
        g1 = jax.grad(via_kernel, argnums=argnum)(dl, d, du, b)
        g2 = jax.grad(via_dense, argnums=argnum)(dl, d, du, b)
        # dl[0]/du[-1] are ignored by convention -> compare interior
        if argnum == 0:
            g1, g2 = g1[1:], g2[1:]
        if argnum == 2:
            g1, g2 = g1[:-1], g2[:-1]
        assert_allclose(g1, g2, rtol=1e-6, atol=1e-9, msg="argnum %d" % argnum)

    h1 = jax.hessian(lambda b: via_kernel(dl, d, du, b))(b)
    h2 = jax.hessian(lambda b: via_dense(dl, d, du, b))(b)
    assert_allclose(h1, h2, rtol=1e-6, atol=1e-9)


def test_tridiag_solve_xla_path_matches(rng):
    from xitorch_tpu.ops.tridiag import tridiag_solve

    n = 12
    dl, d, du, b = _rand_tridiag(rng, (4,), n)
    x1 = tridiag_solve(dl, d, du, b, use_pallas=True, interpret=True)
    x2 = tridiag_solve(dl, d, du, b, use_pallas=False)
    assert_allclose(x1, x2, rtol=1e-4, atol=1e-5)
