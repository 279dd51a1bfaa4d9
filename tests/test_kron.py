"""Kronecker-structured operators (_core/kron.py) + the kron_direct solve.

No reference analog (structure-exploiting operators are a TPU-native
addition); correctness oracle is the materialized dense operator.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import xitorch_tpu as xt
from xitorch_tpu import KronOperator, KronSumOperator
from xitorch_tpu.linalg import solve

from tests.utils import assert_allclose, gradcheck2


def _spd(key, n):
    a = jax.random.normal(key, (n, n), jnp.float64)
    return a @ a.T + n * jnp.eye(n)


@pytest.mark.parametrize("cls", [KronOperator, KronSumOperator])
def test_kron_mv_matches_dense(cls):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    A1 = _spd(k1, 5)
    A2 = _spd(k2, 4)
    op = cls(A1, A2, is_hermitian=True)
    dense = op.fullmatrix()
    # oracle: numpy kron
    if cls is KronOperator:
        ref = jnp.asarray(np.kron(np.asarray(A1), np.asarray(A2)))
    else:
        ref = jnp.asarray(np.kron(np.asarray(A1), np.eye(4))
                          + np.kron(np.eye(5), np.asarray(A2)))
    assert_allclose(dense, ref, atol=1e-12)
    x = jax.random.normal(k3, (20, 3), jnp.float64)
    assert_allclose(op.mm(x), ref @ x, atol=1e-12)
    xt.checklinop(op)


def test_kron_batch_dims_and_linop_factors():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    A1 = jax.random.normal(k1, (3, 4, 4), jnp.float64)
    A1 = A1 + jnp.swapaxes(A1, -1, -2) + 8 * jnp.eye(4)
    A2 = xt.LinearOperator.m(_spd(k2, 3), is_hermitian=True)
    op = KronSumOperator(A1, A2)
    assert op.shape == (3, 12, 12)
    # raw-array factor: hermitian-ness is unknown unless declared
    assert not op.is_hermitian
    x = jnp.ones((3, 12, 2))
    y = op.mm(x)
    yd = op.fullmatrix() @ x
    assert_allclose(y, yd, atol=1e-12)


@pytest.mark.parametrize("cls", [KronOperator, KronSumOperator])
def test_kron_direct_solve(cls):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    A1 = _spd(k1, 6)
    A2 = _spd(k2, 5)
    op = cls(A1, A2, is_hermitian=True)
    B = jax.random.normal(k3, (30, 2), jnp.float64)
    x, info = solve(op, B, method="kron_direct", return_info=True)
    assert float(info["converged"]) == 1.0
    assert_allclose(op.mm(x), B, atol=1e-9)
    # against the dense oracle
    xd = jnp.linalg.solve(op.fullmatrix(), B)
    assert_allclose(x, xd, atol=1e-9)


def test_kron_direct_solve_with_E_and_grads():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    A1 = _spd(k1, 4)
    A2 = _spd(k2, 3)
    B = jax.random.normal(k3, (12, 2), jnp.float64)
    E = jnp.asarray([0.07, -0.11])

    def run(A1m, A2m, Bm, Em):
        # symmetrize inside the differentiated function: is_hermitian=True
        # promises hermitian factors, so FD perturbations must stay
        # hermitian too (same pattern as the symeig gradchecks)
        A1s = (A1m + A1m.T) / 2
        op = KronSumOperator(A1s, A2m, is_hermitian=True)
        return solve(op, Bm, E=Em, method="kron_direct")

    x = run(A1, A2, B, E)
    dense = KronSumOperator(A1, A2, is_hermitian=True).fullmatrix()
    resid = dense @ x - x * E[None, :]
    assert_allclose(resid, B, atol=1e-9)

    # implicit gradients through the direct solve (any order)
    def loss(A1m, Bm, Em):
        return jnp.sum(run(A1m, A2, Bm, Em) ** 2)

    gradcheck2(loss, (A1, B, E), order=2, atol=2e-4, rtol=2e-3, eps=1e-5)


def test_kron_direct_falls_back_for_nonhermitian():
    k = jax.random.PRNGKey(4)
    A1 = jax.random.normal(k, (4, 4), jnp.float64) + 6 * jnp.eye(4)
    # non-hermitian factors -> op not hermitian -> cg fallback (which
    # itself handles non-posdef via the normal equations)
    op = KronOperator(A1, jnp.eye(3, dtype=jnp.float64))
    B = jnp.ones((12, 1), jnp.float64)
    x = solve(op, B, method="kron_direct", max_niter=400)
    assert_allclose(op.mm(x), B, atol=1e-5)


@pytest.mark.parametrize("cls", [KronOperator, KronSumOperator])
@pytest.mark.parametrize("mode", ["lowest", "uppest"])
def test_kron_exact_symeig(cls, mode):
    from xitorch_tpu.linalg import symeig

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    op = cls(_spd(k1, 6), _spd(k2, 5), is_hermitian=True)
    ev, evec = symeig(op, 4, mode, method="kron_exact")
    dense = op.fullmatrix()
    ev0 = jnp.linalg.eigvalsh(dense)
    want = ev0[:4] if mode == "lowest" else ev0[-4:]
    assert_allclose(ev, want, atol=1e-10)
    R = dense @ evec - evec * ev[None, :]
    assert jnp.max(jnp.abs(R)) < 1e-9


def test_kron_exact_symeig_grads():
    from xitorch_tpu.linalg import symeig

    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    A1 = _spd(k1, 5)
    A2 = _spd(k2, 4)

    def loss(A1m):
        A1s = (A1m + A1m.T) / 2
        op = KronSumOperator(A1s, A2, is_hermitian=True)
        ev, evec = symeig(op, 3, "lowest", method="kron_exact")
        return jnp.sum(ev ** 2) + jnp.sum(evec[..., 0] ** 4)

    gradcheck2(loss, (A1,), order=2, atol=2e-4, rtol=2e-3, eps=1e-5)


def test_kron_exact_rejects():
    from xitorch_tpu.linalg import symeig

    A1 = jnp.eye(4)
    op = KronOperator(A1, A1)  # not declared hermitian
    with pytest.raises(RuntimeError):
        symeig(op, 2, "lowest", method="kron_exact")
    Adense = xt.LinearOperator.m(jnp.eye(8), is_hermitian=True)
    with pytest.raises(RuntimeError):
        symeig(Adense, 2, "lowest", method="kron_exact")


def test_kron_three_factors():
    # N-factor form: 3-D separable problem, all paths vs the dense oracle
    from xitorch_tpu.linalg import symeig

    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    A1, A2, A3 = _spd(keys[0], 5), _spd(keys[1], 4), _spd(keys[2], 3)
    k = np.kron
    for cls in (KronSumOperator, KronOperator):
        op = cls(A1, A2, A3, is_hermitian=True)
        if cls is KronOperator:
            ref = k(k(np.asarray(A1), np.asarray(A2)), np.asarray(A3))
        else:
            ref = (k(k(np.asarray(A1), np.eye(4)), np.eye(3))
                   + k(k(np.eye(5), np.asarray(A2)), np.eye(3))
                   + k(k(np.eye(5), np.eye(4)), np.asarray(A3)))
        ref = jnp.asarray(ref)
        assert_allclose(op.fullmatrix(), ref, atol=1e-10)
        v = jax.random.normal(keys[0], (60, 2), jnp.float64)
        assert_allclose(op.mm(v), ref @ v, atol=1e-9)
        x = solve(op, v, method="kron_direct")
        assert_allclose(ref @ x, v, atol=1e-8)
        ev, evec = symeig(op, 5, "lowest", method="kron_exact")
        assert_allclose(ev, jnp.linalg.eigvalsh(ref)[:5], atol=1e-9)
        assert jnp.max(jnp.abs(ref @ evec - evec * ev[None, :])) < 1e-8


def test_kron_bad_factor_raises():
    with pytest.raises(RuntimeError):
        KronOperator(jnp.zeros((3, 4)), jnp.eye(3))
    with pytest.raises(RuntimeError):
        KronSumOperator(jnp.eye(3))  # needs >= 2 factors


def test_kron_complex_hermitian_factors():
    # complex hermitian factors: conjugations in the eigenbasis
    # transforms and the kron eigenvector products must line up (CPU-only
    # dtype; the TPU has no c64)
    rng = np.random.default_rng(8)

    def herm(n):
        a = jnp.asarray(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
        return a @ a.conj().T + n * jnp.eye(n)

    from xitorch_tpu.linalg import symeig

    op = KronSumOperator(herm(5), herm(4), is_hermitian=True)
    dense = op.fullmatrix()
    B = jnp.asarray(rng.standard_normal((20, 2))
                    + 1j * rng.standard_normal((20, 2)))
    x = solve(op, B, method="kron_direct")
    assert jnp.max(jnp.abs(dense @ x - B)) < 1e-12
    ev, evec = symeig(op, 3, "lowest", method="kron_exact")
    assert jnp.max(jnp.abs(dense @ evec - evec * ev[None, :])) < 1e-12
