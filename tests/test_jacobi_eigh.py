"""Pallas one-sided Jacobi eigh kernel (ops/jacobi_eigh.py), interpret mode.

The kernel is TPU-only in compiled form; these tests run it through the
Pallas interpreter so the exact kernel code path is exercised in CI.
Contract under test: jnp.linalg.eigh parity (ascending eigenvalues, column
eigenvectors) — the dense-decomposition semantics of the reference
exacteig (/root/reference/xitorch/_impls/linalg/symeig.py:11-44).
"""
import jax
import jax.numpy as jnp
import pytest

from xitorch_tpu.ops.jacobi_eigh import jacobi_eigh, use_jacobi_for


def _sym(key, shape, dtype):
    a = jax.random.normal(key, shape, dtype)
    return (a + jnp.swapaxes(a, -1, -2)) / 2


@pytest.mark.parametrize("dtype,rtol", [(jnp.float32, 2e-5),
                                        (jnp.float64, 1e-12)])
def test_jacobi_eigh_matches_eigh(dtype, rtol):
    a = _sym(jax.random.PRNGKey(0), (3, 16, 16), dtype)
    lam, V = jacobi_eigh(a, interpret=True)
    lam0, _ = jnp.linalg.eigh(a)
    scale = jnp.max(jnp.abs(lam0))
    assert jnp.max(jnp.abs(lam - lam0)) / scale < rtol
    # eigenpair residual + orthonormality (eigenvectors are only defined
    # up to sign/degenerate rotation, so compare through the contract)
    R = jnp.einsum("bij,bjk->bik", a, V) - V * lam[:, None, :]
    assert jnp.max(jnp.abs(R)) / scale < 10 * rtol
    VtV = jnp.einsum("bij,bik->bjk", V, V)
    assert jnp.max(jnp.abs(VtV - jnp.eye(16, dtype=dtype))) < 10 * rtol


def test_jacobi_eigh_padding_and_batch_dims():
    # n=20 pads to 32 internally; leading batch (2, 2)
    a = _sym(jax.random.PRNGKey(1), (2, 2, 20, 20), jnp.float64)
    lam, V = jacobi_eigh(a, interpret=True)
    assert lam.shape == (2, 2, 20)
    assert V.shape == (2, 2, 20, 20)
    lam0, _ = jnp.linalg.eigh(a)
    assert jnp.max(jnp.abs(lam - lam0)) < 1e-11


def test_jacobi_eigh_degenerate_and_indefinite():
    # repeated eigenvalues + mixed signs (the Gershgorin PSD shift must
    # resolve the +-lambda ambiguity of the implicit A^2 problem)
    lam_true = jnp.array([-2.0, -2.0, -1.0, 1.0, 1.0, 1.0, 2.0, 3.0,
                          -3.0, 0.5, 0.5, -0.5, 4.0, -4.0, 2.0, -2.0],
                         jnp.float64)
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(2), (16, 16),
                                           jnp.float64))
    a = (q * lam_true) @ q.T
    a = (a + a.T) / 2
    lam, V = jacobi_eigh(a[None], interpret=True)
    assert jnp.max(jnp.abs(lam[0] - jnp.sort(lam_true))) < 1e-11
    R = a @ V[0] - V[0] * lam[0][None, :]
    assert jnp.max(jnp.abs(R)) < 1e-10


def test_jacobi_eigh_rejects_bad_input():
    with pytest.raises(ValueError):
        jacobi_eigh(jnp.zeros((4, 5)), interpret=True)


@pytest.mark.parametrize("dtype,rtol", [(jnp.complex64, 3e-5),
                                        (jnp.complex128, 1e-12)])
def test_jacobi_eigh_complex_hermitian(dtype, rtol):
    # complex path: [Re G^T | Im G^T] plane packing, phase-aligned
    # rotations (VERDICT round-1 item 1c)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    rdt = jnp.zeros((), dtype).real.dtype
    a = (jax.random.normal(k1, (2, 24, 24), rdt)
         + 1j * jax.random.normal(k2, (2, 24, 24), rdt)).astype(dtype)
    a = (a + jnp.swapaxes(a, -1, -2).conj()) / 2
    lam, V = jacobi_eigh(a, interpret=True)
    lam0, _ = jnp.linalg.eigh(a)
    scale = jnp.max(jnp.abs(lam0))
    assert jnp.max(jnp.abs(lam - lam0)) / scale < rtol
    R = jnp.einsum("bij,bjk->bik", a, V) - V * lam[:, None, :]
    assert jnp.max(jnp.abs(R)) / scale < 10 * rtol
    VtV = jnp.einsum("bij,bik->bjk", V.conj(), V)
    assert jnp.max(jnp.abs(VtV - jnp.eye(24, dtype=dtype))) < 10 * rtol


def test_use_jacobi_gate_off_tpu():
    # CPU backend in tests -> the degen_eigh dispatch must stay on XLA
    a = jnp.zeros((4, 128, 128), jnp.float32)
    assert jax.default_backend() != "tpu"
    assert not use_jacobi_for(a)


def test_vmem_budget_gate_arithmetic(monkeypatch):
    # the dispatch gate must track the sweep kernel's own VMEM model:
    # real f32 fits through n=848 (5*848^2*4 = 14.38e6 <= 14 MiB) and
    # not past it (npad=864 -> 14.93e6); complex caps at the validated
    # 512 window
    import importlib

    # ops/__init__ re-exports the function under the module's name, so
    # plain import-as binds the function; go through sys.modules
    mod = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
    monkeypatch.setattr(mod.jax, "default_backend", lambda: "tpu")
    for n, ok in [(64, True), (100, True), (700, True), (848, True),
                  (849, False), (864, False), (1024, False), (63, False)]:
        a = jnp.zeros((n, n), jnp.float32)
        assert mod.use_jacobi_for(a) == ok, (n, ok)
    for n, ok in [(128, True), (512, True), (513, False)]:
        c = jnp.zeros((n, n), jnp.complex64)
        assert mod.use_jacobi_for(c) == ok, (n, ok)
    # a single matrix past the budget raises a clear error (not a Mosaic
    # OOM) when someone calls the kernel entry directly, compiled mode
    with pytest.raises(ValueError, match="VMEM"):
        mod._pallas_g_panel(jnp.zeros((1, 1024, 1024), jnp.float32),
                            1, 1e-5, interpret=False, complexpair=False)


def test_dc_dispatch_and_padding_arithmetic():
    # ADVICE r2: pin the preconditioned-path padding + per-level guards
    # (the guards fire before any Pallas compile, so interpret=False is
    # safe to exercise off-TPU)
    from xitorch_tpu.ops import dc_kernel as dck
    from xitorch_tpu.ops.jacobi_eigh import _padded_n

    # 16-alignment below the per-level window; 128-alignment above it on
    # the preconditioned path (the per-level DC kernel's manual HBM DMA)
    assert _padded_n(100, False) == 112
    assert _padded_n(100, True) == 112
    assert _padded_n(448, True) == 448   # last single-shot size
    assert _padded_n(456, True) == 512   # first per-level: 128-aligned
    assert _padded_n(512, True) == 512
    assert _padded_n(513, False) == 528
    assert _padded_n(513, True) == 640
    assert _padded_n(700, False) == 704
    assert _padded_n(700, True) == 768
    assert _padded_n(768, True) == 768
    # unaligned n on the per-level path raises a clear error, not a
    # Mosaic memref_slice failure
    with pytest.raises(ValueError, match="multiple of 128"):
        dck.dc_precondition_tpu(jnp.zeros((1, 704, 704), jnp.float32),
                                interpret=False)
    # n over the validated VMEM cap raises with the padding caveat
    with pytest.raises(ValueError, match="supports n <= 768"):
        dck.dc_precondition_tpu(jnp.zeros((1, 896, 896), jnp.float32),
                                interpret=False)


def test_guard_warm_start_per_matrix_fallback():
    # the runtime orthogonality guard: healthy panels (G0 = Q^T a with
    # orthogonal Q) pass through; a rank-deficient Q falls back to the
    # cold start a — per matrix, not per batch
    from xitorch_tpu.ops.jacobi_eigh import _guard_warm_start

    n = 32
    a = _sym(jax.random.PRNGKey(5), (3, n, n), jnp.float32)
    a = a + 10.0 * jnp.eye(n, dtype=jnp.float32)  # shifted-PSD as in use
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(6),
                                           (3, n, n), jnp.float32))
    good = jnp.einsum("bji,bjk->bik", q, a)
    out, flag = _guard_warm_start(a, good)
    assert jnp.allclose(out, good)
    assert not jnp.any(flag)
    # zero one column of Q: the archetypal rank-deficiency failure
    qbad = q.at[:, :, 0].set(0.0)
    bad = jnp.einsum("bji,bjk->bik", qbad, a)
    mixed = jnp.stack([good[0], bad[1], good[2]])
    out, flag = _guard_warm_start(a, mixed)
    assert jnp.allclose(out[0], good[0])
    assert jnp.allclose(out[1], a[1])  # fell back to the cold start
    assert jnp.allclose(out[2], good[2])
    assert flag.tolist() == [False, True, False]


def test_degen_eigh_unchanged_on_cpu():
    # degen_eigh (the dispatch site) still matches eigh + gradients on CPU
    from xitorch_tpu._impls.linalg.symeig import degen_eigh

    a = _sym(jax.random.PRNGKey(3), (2, 8, 8), jnp.float64)
    lam, V = degen_eigh(a)
    lam0, V0 = jnp.linalg.eigh(a)
    assert jnp.allclose(lam, lam0)
    assert jnp.allclose(V, V0)


@pytest.mark.parametrize("shape", [(2, 24, 24), (2, 32, 20), (2, 20, 32)])
@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 3e-5),
                                        (jnp.float64, 1e-12)])
def test_jacobi_svd_matches_svd(shape, dtype, atol):
    from xitorch_tpu.ops.jacobi_eigh import jacobi_svd
    a = jax.random.normal(jax.random.PRNGKey(4), shape, dtype)
    u, s, v = jacobi_svd(a, interpret=True)
    s0 = jnp.sort(jnp.linalg.svd(a, compute_uv=False), axis=-1)
    scale = jnp.max(s0)
    assert jnp.max(jnp.abs(s - s0)) / scale < atol          # ascending
    r = min(shape[-2:])
    # contract checks (vectors defined up to sign/degenerate rotation)
    Av = jnp.einsum("bij,bjk->bik", a, v)
    assert jnp.max(jnp.abs(Av - u * s[:, None, :])) / scale < 10 * atol
    eye = jnp.eye(r, dtype=u.dtype)
    assert jnp.max(jnp.abs(jnp.einsum("bij,bik->bjk", u, u) - eye)) \
        < 10 * atol
    assert jnp.max(jnp.abs(jnp.einsum("bij,bik->bjk", v, v) - eye)) \
        < 10 * atol


def test_jacobi_svd_rank_deficient_and_errors():
    from xitorch_tpu.ops.jacobi_eigh import jacobi_svd
    # rank-2 out of 18: zero singular values must come out ~0 with the
    # nonzero ones still correct
    key = jax.random.PRNGKey(5)
    b = jax.random.normal(key, (18, 2), jnp.float64)
    c = jax.random.normal(jax.random.fold_in(key, 1), (2, 18), jnp.float64)
    a = (b @ c)[None]
    u, s, v = jacobi_svd(a, interpret=True)
    s0 = jnp.sort(jnp.linalg.svd(a, compute_uv=False), axis=-1)
    assert jnp.max(jnp.abs(s - s0)) < 1e-10
    assert jnp.max(s[:, :-2]) < 1e-10
    with pytest.raises(ValueError):
        jacobi_svd(a.astype(jnp.complex128), interpret=True)


def test_use_jacobi_svd_gate_off_tpu():
    from xitorch_tpu.ops.jacobi_eigh import use_jacobi_svd_for
    a = jnp.zeros((4, 256, 256), jnp.float32)
    assert use_jacobi_svd_for(a) == (jax.default_backend() == "tpu")


def test_panel_return_sweeps_interpret():
    from xitorch_tpu.ops.jacobi_eigh import _pallas_g_panel
    key = jax.random.PRNGKey(6)
    a = jax.random.normal(key, (5, 32, 32), jnp.float32)
    a = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(32, dtype=jnp.float32)
    g, sweeps = _pallas_g_panel(a, 18, 1e-5, True, False,
                                return_sweeps=True)
    g2 = _pallas_g_panel(a, 18, 1e-5, True, False)
    assert jnp.allclose(g, g2)             # diagnostics don't change G
    assert sweeps.dtype == jnp.int32
    assert int(sweeps.min()) >= 1 and int(sweeps.max()) <= 18
    # an already-diagonal stack converges immediately (0 or 1 sweeps)
    d = jnp.eye(32, dtype=jnp.float32)[None] * jnp.arange(
        1.0, 33.0, dtype=jnp.float32)[None, :, None] * 0 + \
        jnp.eye(32, dtype=jnp.float32)[None]
    _, sw0 = _pallas_g_panel(jnp.broadcast_to(d, (2, 32, 32)), 18, 1e-5,
                             True, False, return_sweeps=True)
    assert int(sw0.max()) <= 1
