"""Complex-dtype coverage for solve and symeig (CPU-only: the TPU tunnel
lacks c64/c128; the reference tests complex via include_complex in
device_dtype_float_test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import solve, symeig
from tests.utils import assert_allclose


def make_herm_c(rng, n):
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return jnp.asarray(a @ a.conj().T + n * np.eye(n))


@pytest.mark.parametrize("method", ["cg", "bicgstab", "gmres", "exactsolve"])
def test_solve_complex(method, rng):
    n, nc = 8, 2
    Am = make_herm_c(rng, n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)) + 1j * rng.standard_normal((n, nc)))
    A = LinearOperator.m(Am, is_hermitian=True)
    x = solve(A, Bm, method=method, rtol=1e-11, atol=1e-13, max_niter=300)
    assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-6, atol=1e-8)


def test_solve_complex_grad(rng):
    n, nc = 6, 1
    Am = make_herm_c(rng, n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)) + 1j * rng.standard_normal((n, nc)))

    def with_op(Bm):
        A = LinearOperator.m(Am, is_hermitian=True)
        x = solve(A, Bm, method="cg", rtol=1e-13, atol=1e-15, max_niter=500)
        return jnp.sum(jnp.abs(x) ** 2)

    def with_dense(Bm):
        return jnp.sum(jnp.abs(jnp.linalg.solve(Am, Bm)) ** 2)

    g1 = jax.grad(with_op)(Bm)
    g2 = jax.grad(with_dense)(Bm)
    assert_allclose(g1, g2, rtol=1e-6, atol=1e-9)


def test_symeig_complex(rng):
    n, neig = 8, 3
    Am = make_herm_c(rng, n)
    A = LinearOperator.m(Am, is_hermitian=True)
    evals, evecs = symeig(A, neig, "lowest")
    d = jnp.linalg.eigvalsh(Am)
    assert_allclose(evals, d[:neig], atol=1e-8)
    assert_allclose(Am @ evecs, evecs * evals[None, :], atol=1e-7)


def test_symeig_complex_davidson_grad(rng):
    n, neig = 8, 2
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))

    class HOp(LinearOperator):
        def __init__(self, a):
            super().__init__(shape=a.shape, is_hermitian=True, dtype=a.dtype)
            self.a = a

        def _getparamnames(self, prefix=""):
            return [prefix + "a"]

        def dense(self):
            return (self.a + jnp.swapaxes(self.a, -2, -1).conj()) / 2

        def _mv(self, x):
            return jnp.einsum("...pq,...q->...p", self.dense(), x)

        def _mm(self, x):
            return self.dense() @ x

    a = jnp.asarray(a)

    def loss(a, method):
        kw = {} if method == "exacteig" else \
            {"min_eps": 1e-12, "max_niter": 4000,
             "bck_options": {"rtol": 1e-12, "atol": 1e-14}}
        evals, _ = symeig(HOp(a), neig, "lowest", method=method, **kw)
        return jnp.sum(evals ** 2)

    def loss_dense(a):
        H = (a + a.conj().T) / 2
        return jnp.sum(jnp.linalg.eigvalsh(H)[:neig] ** 2)

    assert_allclose(loss(a, "davidson"), loss_dense(a), rtol=1e-7)
    gd_ = jax.grad(lambda a: loss(a, "davidson"))(a)
    ge = jax.grad(lambda a: loss(a, "exacteig"))(a)
    gref = jax.grad(loss_dense)(a)
    assert_allclose(ge, gref, rtol=1e-5, atol=1e-8)
    assert_allclose(gd_, gref, rtol=1e-4, atol=1e-7)


def test_complex_symeig_chebfsi(rng):
    n = 24
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Am = jnp.asarray((a + a.conj().T) / 2)
    A = LinearOperator.m(Am, is_hermitian=True)
    evals, evecs, info = symeig(A, 4, "lowest", method="chebfsi",
                                min_eps=1e-10, return_info=True)
    assert float(info["converged"]) == 1.0
    assert_allclose(evals, jnp.linalg.eigvalsh(Am)[:4], atol=1e-8)
    res = Am @ evecs - evecs * evals[None, :]
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_host_lapack_eigh_bridge(rng):
    """CPU complex eigh rides the host-LAPACK (torch/MKL) bridge
    (VERDICT r4 item: the XLA:CPU c64 eigh was the one committed row
    below the torch reference).  Values must match the numpy oracle and
    the bridge must be jit/vmap-safe; gradients flow through
    degen_eigh's custom JVP, untouched by the callback."""
    from xitorch_tpu._impls.linalg.symeig import _host_lapack_eigh

    n = 12
    a = rng.standard_normal((3, n, n)) + 1j * rng.standard_normal((3, n, n))
    a = jnp.asarray((a + a.conj().transpose(0, 2, 1)) / 2)
    w, v = jax.jit(_host_lapack_eigh)(a)
    wref, _ = np.linalg.eigh(np.asarray(a))
    assert np.max(np.abs(np.asarray(w) - wref)) < 1e-10
    resid = jnp.einsum("bij,bjk->bik", a, v) - v * w[:, None, :]
    assert float(jnp.max(jnp.abs(resid))) < 1e-10
    # vmap over an extra batch axis
    w2, _ = jax.vmap(_host_lapack_eigh)(jnp.stack([a, a]))
    assert np.max(np.abs(np.asarray(w2[0]) - wref)) < 1e-10


def test_svd_complex_native_route(rng):
    """Complex input now takes the native degen_svd route (no Gram, no
    kappa^2) — VERDICT r4 item 4b.  Values vs the f64 oracle, plus a
    gauge-invariant implicit-gradient FD check incl. 2nd order."""
    from xitorch_tpu.linalg import svd as xsvd

    m, n, k = 10, 7, 7
    a = rng.standard_normal((2, m, n)) + 1j * rng.standard_normal((2, m, n))
    aj = jnp.asarray(a)
    u, s, vh = xsvd(LinearOperator.m(aj), k)
    sref = np.linalg.svd(a, compute_uv=False)
    # ascending convention; uppest slices the tail
    assert np.max(np.abs(np.sort(np.asarray(s), axis=-1)
                         - np.sort(sref, axis=-1))) < 1e-10
    rec = jnp.einsum("bmi,bi,bin->bmn", u, s.astype(u.dtype), vh)
    assert float(jnp.max(jnp.abs(rec - aj))) < 1e-9

    K = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    K = jnp.asarray((K + K.conj().T) / 2)
    w = jnp.asarray(1.0 + 0.1 * np.arange(k))

    def loss(ar, ai):
        u, s, vh = xsvd(LinearOperator.m(ar + 1j * ai), k)
        return (jnp.sum(s * w)
                + jnp.real(jnp.einsum("bmi,mk,bki->", u.conj(), K, u)))

    ar, ai = jnp.real(aj), jnp.imag(aj)
    gr, gi = jax.grad(loss, argnums=(0, 1))(ar, ai)
    dr = jnp.asarray(rng.standard_normal(ar.shape))
    di = jnp.asarray(rng.standard_normal(ai.shape))
    eps = 1e-6
    fd = (loss(ar + eps * dr, ai + eps * di)
          - loss(ar - eps * dr, ai - eps * di)) / (2 * eps)
    an = float(jnp.sum(gr * dr) + jnp.sum(gi * di))
    assert abs(float(fd) - an) / abs(float(fd)) < 1e-6
    # 2nd order through the custom JVP
    h = jax.grad(lambda x: jnp.sum(
        jax.grad(loss, argnums=0)(x, ai) * dr))(ar)
    assert np.isfinite(float(jnp.linalg.norm(h)))
