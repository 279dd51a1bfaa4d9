"""ops/small_eigh — the pure-XLA batched small-matrix Jacobi eigh used
by solver-internal Rayleigh-Ritz/subspace decompositions (round 5).
On CPU the dispatch gate is off, so these tests call the function
directly and force the RR route via monkeypatching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu.ops.small_eigh import small_eigh, use_small_eigh_for


@pytest.mark.parametrize("B,m", [(64, 32), (16, 40), (8, 17), (4, 64),
                                 (3, 2)])
def test_small_eigh_oracle(B, m):
    rng = np.random.default_rng(m)
    g = rng.standard_normal((B, m, m)).astype(np.float32)
    a = ((g + g.transpose(0, 2, 1)) / 2).astype(np.float32)
    if m >= 32:
        # clustered spectrum cell (6-fold near-degenerate)
        q, _ = np.linalg.qr(rng.standard_normal((m, m)))
        lamc = np.sort(np.concatenate([np.linspace(0.1, 1, m - 6),
                                       np.full(6, 0.55)]))
        a[0] = ((q * lamc) @ q.T).astype(np.float32)
    lam, V = jax.jit(small_eigh)(jnp.asarray(a))
    lam0 = np.linalg.eigvalsh(a.astype(np.float64))
    scale = np.abs(lam0).max()
    assert np.max(np.abs(np.asarray(lam) - lam0)) / scale < 5e-6
    Vd = np.asarray(V, np.float64)
    r = a.astype(np.float64) @ Vd - Vd * np.asarray(lam, np.float64)[:, None, :]
    assert np.abs(r).max() / scale < 1e-5
    for i in range(B):
        assert np.linalg.norm(Vd[i].T @ Vd[i] - np.eye(m)) < 1e-5


def test_small_eigh_gate_and_errors():
    assert not use_small_eigh_for(jnp.zeros((4, 128, 128), jnp.float32))
    assert not use_small_eigh_for(jnp.zeros((4, 32, 32), jnp.complex64))
    with pytest.raises(ValueError, match="small_eigh"):
        small_eigh(jnp.zeros((4, 8, 9)))


def test_rr_route_forced_matches_xla(monkeypatch):
    """Force the RR dispatch on (as on TPU) and check chebfsi/davidson
    still converge to the dense-route answers through the public API."""
    from xitorch_tpu import LinearOperator
    from xitorch_tpu.linalg import symeig
    import xitorch_tpu.ops.small_eigh as SE

    monkeypatch.setattr(SE, "use_small_eigh_for",
                        lambda T: (not jnp.iscomplexobj(T)
                                   and T.shape[-1] <= 64
                                   and T.dtype == jnp.float32))
    rng = np.random.default_rng(0)
    n, k = 96, 4
    g = rng.standard_normal((3, n, n)).astype(np.float32) / np.sqrt(n)
    a = (g @ g.transpose(0, 2, 1) + 2 * np.eye(n, dtype=np.float32))
    A = LinearOperator.m(jnp.asarray(a), is_hermitian=True)
    ref = np.linalg.eigvalsh(a.astype(np.float64))[:, :k]
    for method, opts in [("chebfsi", {"min_eps": 1e-4, "max_niter": 60,
                                      "nguess": 16, "degree": 16}),
                         ("davidson", {"min_eps": 1e-4,
                                       "max_niter": 600})]:
        ev, vec = symeig(A, k, "lowest", method=method, **opts)
        assert np.max(np.abs(np.asarray(ev) - ref)) < 5e-4, method
        r = np.einsum("bij,bjk->bik", a, np.asarray(vec)) \
            - np.asarray(vec) * np.asarray(ev)[:, None, :]
        assert np.abs(r).max() < 5e-3, method
