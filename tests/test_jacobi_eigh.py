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
    # not past it (npad=864 -> 14.93e6).  The complex-pair kernel has NO
    # plane model: its measured scoped allocation at m=1 is roughly
    # n-independent (16.2-22.0 MB, n in [288, 512], probed 2026-08-20),
    # so complex dispatch runs one matrix per program under the raised
    # _CX_VMEM_LIMIT inside the hardware-probed npad <= _CX_NMAX = 512
    # window
    import importlib

    # ops/__init__ re-exports the function under the module's name, so
    # plain import-as binds the function; go through sys.modules
    mod = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
    monkeypatch.setattr(mod.jax, "default_backend", lambda: "tpu")
    for n, ok in [(64, True), (100, True), (700, True), (848, True),
                  (849, False), (864, False), (1024, False), (63, False)]:
        a = jnp.zeros((n, n), jnp.float32)
        assert mod.use_jacobi_for(a) == ok, (n, ok)
    for n, ok in [(128, True), (448, True), (512, True), (513, False)]:
        c = jnp.zeros((n, n), jnp.complex64)
        assert mod.use_jacobi_for(c) == ok, (n, ok)
    # a single matrix past the budget raises a clear error (not a Mosaic
    # OOM) when someone calls the kernel entry directly, compiled mode
    with pytest.raises(ValueError, match="VMEM"):
        mod._pallas_g_panel(jnp.zeros((1, 1024, 1024), jnp.float32),
                            1, 1e-5, interpret=False, complexpair=False)
    with pytest.raises(ValueError, match="hardware-validated"):
        mod._pallas_g_panel(jnp.zeros((1, 528, 1056), jnp.float32),
                            1, 1e-5, interpret=False, complexpair=True)


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
    # complex input is now supported (packed-plane complex-pair kernel);
    # the rank-deficient contract carries over
    uc, sc, vc = jacobi_svd(a.astype(jnp.complex128) * (0.6 + 0.8j),
                            interpret=True)
    assert jnp.max(jnp.abs(sc - s0)) < 1e-9
    assert jnp.max(sc[:, :-2]) < 1e-9


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


def test_rot_correct_kills_gapped_couplings():
    # the first-order rotational correction must (a) reduce well-gapped
    # couplings by orders of magnitude, (b) keep the panel's G-invariant
    # (P^T P == A^2, i.e. the implicit rotation stays orthogonal), and
    # (c) leave near-degenerate pairs for the Jacobi finisher untouched
    # rather than applying an invalid first-order rotation
    from xitorch_tpu.ops.jacobi_eigh import _rot_correct

    n = 48
    key = jax.random.PRNGKey(11)
    # well-separated spectrum, exact eigenbasis Q0, then a small rotation
    lam = jnp.linspace(1.0, 6.0, n, dtype=jnp.float32)
    q0, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), jnp.float32))
    a = (q0 * lam) @ q0.T
    k = jax.random.normal(jax.random.PRNGKey(12), (n, n), jnp.float32)
    k = 2e-3 * (k - k.T)
    q = q0 @ jax.scipy.linalg.expm(k)
    p = (q.T @ a)[None]                        # warm panel, (1, n, n)

    def max_cos2(g):
        nrm = jnp.sum(g * g, axis=-1)
        gram = jnp.einsum("bik,bjk->bij", g, g,
                          precision=jax.lax.Precision.HIGHEST)
        den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-30)
        r = gram * gram / den
        return jnp.max(jnp.where(jnp.eye(n, dtype=bool), 0.0, r))

    c0 = float(max_cos2(p))
    pc = _rot_correct(p, passes=1)
    c1 = float(max_cos2(pc))
    assert c1 < c0 * 1e-2, (c0, c1)           # (a)
    hi = jax.lax.Precision.HIGHEST
    gtg = jnp.matmul(jnp.swapaxes(pc, -2, -1), pc, precision=hi)
    a2 = jnp.matmul(a, a, precision=hi)[None]
    ginv = float(jnp.sqrt(jnp.sum((gtg - a2) ** 2)
                          / jnp.sum(a2 * a2)))
    assert ginv < 5e-6, ginv                  # (b) guard-grade invariant


def test_rot_correct_degenerate_and_zero_rows_stay_finite():
    # 0/0 regression: exactly-degenerate uncoupled pairs (identical
    # padding rows, zero rows from a broken preconditioner) must not
    # NaN-poison the panel — the clip test alone passes 0 <= 0
    from xitorch_tpu.ops.jacobi_eigh import _rot_correct

    n = 16
    d = jnp.eye(n, dtype=jnp.float32) * 3.0
    # two identical rows (degenerate, uncoupled) + one zero row
    p = d.at[5, 5].set(2.0).at[7, 7].set(2.0).at[9].set(0.0)[None]
    out = _rot_correct(p, passes=2)
    assert bool(jnp.all(jnp.isfinite(out)))
    # untouched where no rotation is valid
    assert jnp.allclose(out, p, atol=1e-6)


def test_rot_correct_reduces_sweeps_interpret():
    # end effect on the finisher: a DC-warmed panel needs fewer sweeps
    # after the correction (the production path applies it by default)
    import importlib

    JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
    from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

    # Wishart family (the config-2 benchmark family): spread spectrum,
    # so most leftover couplings are well-gapped and correctable —
    # a tight/clustered spectrum would clip almost everything and show
    # no effect (the correction is a no-op there by design)
    n = 128
    w = jax.random.normal(jax.random.PRNGKey(13), (4, n, n),
                          jnp.float32) / (n ** 0.5)
    a = w @ jnp.swapaxes(w, -1, -2) + 2 * jnp.eye(n, dtype=jnp.float32)
    g0 = dc_precondition_tpu(a, levels=7, min_seg=2, interpret=True)
    tol = float(jnp.finfo(jnp.float32).eps) * 4.0 * (n ** 0.5)
    old = JE._M_CAP
    JE._M_CAP = 1
    try:
        _, sw_warm = JE._pallas_g_panel(g0, 18, tol, True, False,
                                        return_sweeps=True)
        _, sw_corr = JE._pallas_g_panel(JE._rot_correct(g0), 18, tol,
                                        True, False, return_sweeps=True)
    finally:
        JE._M_CAP = old
    assert int(sw_corr.sum()) < int(sw_warm.sum()), (
        sw_warm.tolist(), sw_corr.tolist())


def test_block_rr_solves_degenerate_clusters():
    # the blocked Rayleigh-Ritz finisher must (a) kill couplings inside
    # near-degenerate clusters EXACTLY (where first-order correction is
    # clipped out and Jacobi pays its slowest sweeps), (b) preserve the
    # panel's G-invariant P^T P to rounding (block rotations + row sort
    # are orthogonal), including clusters straddling a block boundary
    # (caught by the offset stage)
    from xitorch_tpu.ops._finisher_lab import _block_rr
    import numpy as np

    n, w = 96, 16
    # clusters of close-but-RESOLVABLE eigenvalues (exact degeneracy
    # produces no coupling at all — any basis of the eigenspace is an
    # eigenbasis; small spread x large mixing is the Jacobi-slow case),
    # one centered at the stage-0 block boundary 2w = 32
    lam = np.linspace(1.0, 8.0, n)
    lam[28:36] = 3.0 + 1e-2 * np.arange(8)      # straddles row 32
    lam[60:70] = 5.5 + 1e-2 * np.arange(10)
    lam = jnp.asarray(np.sort(lam), jnp.float32)
    q0, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(3),
                                            (n, n), jnp.float32))
    a = (q0 * lam) @ q0.T
    # Q = q0 rotated *within* the clusters (what DC leaves behind)
    k = np.zeros((n, n), np.float32)
    rng = np.random.default_rng(5)
    for lo, hi_ in ((28, 36), (60, 70)):
        kk = rng.normal(size=(hi_ - lo, hi_ - lo)).astype(np.float32)
        k[lo:hi_, lo:hi_] = 0.3 * (kk - kk.T)
    q = q0 @ jax.scipy.linalg.expm(jnp.asarray(k))
    p = (q.T @ a)[None]

    def max_cos2(g):
        nrm = jnp.sum(g * g, axis=-1)
        gram = jnp.einsum("bik,bjk->bij", g, g,
                          precision=jax.lax.Precision.HIGHEST)
        den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-30)
        r = gram * gram / den
        return jnp.max(jnp.where(jnp.eye(n, dtype=bool), 0.0, r))

    c0 = float(max_cos2(p))
    assert c0 > 1e-5                             # clusters ARE coupled
    out = _block_rr(p, width=w, stages=2)
    c1 = float(max_cos2(out))
    assert c1 < 1e-10, (c0, c1)                 # (a) solved exactly
    hi = jax.lax.Precision.HIGHEST
    gtg = jnp.matmul(jnp.swapaxes(out, -2, -1), out, precision=hi)
    a2 = jnp.matmul(a, a, precision=hi)[None]
    ginv = float(jnp.sqrt(jnp.sum((gtg - a2) ** 2) / jnp.sum(a2 * a2)))
    assert ginv < 5e-6, ginv                    # (b) guard-grade


def test_block_rr_small_n_noop():
    from xitorch_tpu.ops._finisher_lab import _block_rr

    p = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16), jnp.float32)
    out = _block_rr(p, width=16, stages=2)      # n < 2*width
    assert jnp.allclose(out, p)


def test_gram_windowed_reduces_coupling_keeps_invariant():
    # the Gram-windowed local solve must (a) cut the warm panel's worst
    # off-diagonal mixing by >= 10x (it solves each 2w-row window through
    # its 2w x 2w Gram on the small Pallas kernel), (b) preserve the
    # G-invariant P^T P == A_shift^2 at guard grade (the applied V is
    # Newton-Schulz-orthonormalized to f32 rounding before the MXU
    # apply), and (c) no-op when n < 2*width
    import importlib

    LAB = importlib.import_module("xitorch_tpu.ops._finisher_lab")
    from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

    n = 128
    w = jax.random.normal(jax.random.PRNGKey(21), (3, n, n),
                          jnp.float32) / (n ** 0.5)
    a = w @ jnp.swapaxes(w, -1, -2) + 2 * jnp.eye(n, dtype=jnp.float32)
    # shallow DC: big leftover in-window couplings for the solve to kill
    g0 = dc_precondition_tpu(a, levels=3, min_seg=16, interpret=True)

    def max_cos2(g):
        nrm = jnp.sum(g * g, axis=-1)
        gram = jnp.einsum("bik,bjk->bij", g, g,
                          precision=jax.lax.Precision.HIGHEST)
        den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-30)
        r = gram * gram / den
        return jnp.max(jnp.where(jnp.eye(n, dtype=bool), 0.0, r),
                       axis=(-2, -1))

    tol = float(jnp.finfo(jnp.float32).eps) * 4.0 * (n ** 0.5)
    c0 = jnp.max(max_cos2(g0))
    out = LAB._gram_windowed(g0, tol, True, width=32)
    c1 = jnp.max(max_cos2(out))
    assert float(c1) < float(c0) * 0.1, (float(c0), float(c1))   # (a)
    hi = jax.lax.Precision.HIGHEST
    gtg = jnp.matmul(jnp.swapaxes(out, -2, -1), out, precision=hi)
    a2 = jnp.matmul(a, a, precision=hi)
    ginv = jnp.sqrt(jnp.sum((gtg - a2) ** 2, axis=(-2, -1))
                    / jnp.sum(a2 * a2, axis=(-2, -1)))
    assert float(jnp.max(ginv)) < 5e-6, ginv                     # (b)
    p = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 48), jnp.float32)
    assert jnp.allclose(LAB._gram_windowed(p, tol, True, width=32), p)  # (c)


def test_guard_flags_nan_panel():
    # NaN > rtol is False, so a naive comparison would pass a
    # NaN-poisoned panel through to the kernel; the guard must flag it
    from xitorch_tpu.ops.jacobi_eigh import _guard_warm_start

    n = 24
    a = _sym(jax.random.PRNGKey(7), (2, n, n), jnp.float32)
    a = a + 10.0 * jnp.eye(n, dtype=jnp.float32)
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(8),
                                           (2, n, n), jnp.float32))
    good = jnp.einsum("bji,bjk->bik", q, a)
    poisoned = good.at[1, 0, 0].set(jnp.nan)
    out, flag = _guard_warm_start(a, poisoned)
    assert flag.tolist() == [False, True]
    assert jnp.allclose(out[1], a[1])
    assert bool(jnp.all(jnp.isfinite(out)))


def test_angle_correct_handles_near_degenerate_and_gapped():
    # the exact-angle parallel correction must reduce BOTH well-gapped
    # couplings (like _rot_correct) AND near-degenerate cluster mixing
    # (which first-order correction clips out), while preserving the
    # panel's G-invariant at guard grade
    import numpy as np
    from xitorch_tpu.ops._finisher_lab import _angle_correct

    n = 96
    lam = np.linspace(1.0, 8.0, n)
    lam[40:46] = 4.0 + 1e-5 * np.arange(6)       # tight cluster
    lam = jnp.asarray(np.sort(lam), jnp.float32)
    q0, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(31),
                                            (n, n), jnp.float32))
    a = (q0 * lam) @ q0.T
    k = np.zeros((n, n), np.float32)
    rng = np.random.default_rng(7)
    kk = rng.normal(size=(n, n)).astype(np.float32)
    k += 2e-3 * (kk - kk.T)                      # global small mixing
    kc = rng.normal(size=(6, 6)).astype(np.float32)
    k[40:46, 40:46] += 0.4 * (kc - kc.T)         # big in-cluster mixing
    q = q0 @ jax.scipy.linalg.expm(jnp.asarray(k))
    p = (q.T @ a)[None]

    def max_cos2(g):
        nrm = jnp.sum(g * g, axis=-1)
        gram = jnp.einsum("bik,bjk->bij", g, g,
                          precision=jax.lax.Precision.HIGHEST)
        den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-30)
        r = gram * gram / den
        return jnp.max(jnp.where(jnp.eye(n, dtype=bool), 0.0, r))

    c0 = float(max_cos2(p))
    assert c0 > 1e-3                             # cluster IS mixed hard
    out = _angle_correct(p, passes=4)
    c1 = float(max_cos2(out))
    assert c1 < c0 * 1e-3, (c0, c1)
    hi = jax.lax.Precision.HIGHEST
    gtg = jnp.matmul(jnp.swapaxes(out, -2, -1), out, precision=hi)
    a2 = (a @ a)[None]
    ginv = float(jnp.sqrt(jnp.sum((gtg - a2) ** 2)
                          / jnp.sum(a2 * a2)))
    assert ginv < 5e-6, ginv


def test_angle_correct_zero_and_degenerate_rows_stay_finite():
    # atan2(0, 0) = 0 keeps exactly-degenerate uncoupled pairs and zero
    # (padding) rows finite and untouched
    from xitorch_tpu.ops._finisher_lab import _angle_correct

    n = 16
    d = jnp.eye(n, dtype=jnp.float32) * 3.0
    p = d.at[5, 5].set(2.0).at[7, 7].set(2.0).at[9].set(0.0)[None]
    out = _angle_correct(p, passes=2)
    assert bool(jnp.all(jnp.isfinite(out)))
    # rows may be re-sorted by norm; compare as sets via sorted norms
    n0 = jnp.sort(jnp.sum(p * p, axis=-1), axis=-1)
    n1 = jnp.sort(jnp.sum(out * out, axis=-1), axis=-1)
    assert jnp.allclose(n0, n1, rtol=1e-5)


def test_angle_correct_damps_pathological_cluster():
    # a panel whose every pair is strongly mixed (worst case for the
    # simultaneous update) must still contract monotonically-ish and
    # keep R orthogonal via the spectral-norm damping
    from xitorch_tpu.ops._finisher_lab import _angle_correct
    import numpy as np

    n = 32
    lam = jnp.asarray(1.0 + 1e-5 * np.arange(n), jnp.float32)  # one big cluster
    q0, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(5),
                                            (n, n), jnp.float32))
    a = (q0 * lam) @ q0.T
    p = a[None]                                  # Q = I: fully mixed

    def max_cos2(g):
        nrm = jnp.sum(g * g, axis=-1)
        gram = jnp.einsum("bik,bjk->bij", g, g,
                          precision=jax.lax.Precision.HIGHEST)
        den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-30)
        r = gram * gram / den
        return jnp.max(jnp.where(jnp.eye(n, dtype=bool), 0.0, r))

    c0 = float(max_cos2(p))
    out = _angle_correct(p, passes=8)
    c1 = float(max_cos2(out))
    assert c1 < c0, (c0, c1)
    hi = jax.lax.Precision.HIGHEST
    gtg = jnp.matmul(jnp.swapaxes(out, -2, -1), out, precision=hi)
    a2 = (a @ a)[None]
    ginv = float(jnp.sqrt(jnp.sum((gtg - a2) ** 2) / jnp.sum(a2 * a2)))
    assert ginv < 5e-6, ginv


def test_jacobi_svd_rank_deficient_orthonormal_completion():
    # numerically-zero singular values used to leave ZERO columns in U/V
    # on the kernel path (ADVICE r3): the completion must restore
    # orthonormal factors while keeping the nonzero part exact
    import numpy as np

    from xitorch_tpu.ops.jacobi_eigh import jacobi_svd

    rng = np.random.default_rng(7)
    # rank-5 (24, 16) + a matrix with two EXACT zero columns
    lowrank = (rng.standard_normal((3, 24, 5))
               @ rng.standard_normal((3, 5, 16))).astype(np.float32)
    zc = rng.standard_normal((24, 16)).astype(np.float32)
    zc[:, 3] = 0.0
    zc[:, 11] = 0.0
    a = jnp.asarray(np.concatenate([lowrank, zc[None]], axis=0))

    u, s, v = jacobi_svd(a, interpret=True)
    eye = jnp.eye(16, dtype=jnp.float32)
    orth_u = jnp.max(jnp.abs(
        jnp.einsum("bmi,bmj->bij", u, u,
                   precision=jax.lax.Precision.HIGHEST) - eye))
    orth_v = jnp.max(jnp.abs(
        jnp.einsum("bmi,bmj->bij", v, v,
                   precision=jax.lax.Precision.HIGHEST) - eye))
    assert float(orth_u) < 5e-6, float(orth_u)
    assert float(orth_v) < 5e-6, float(orth_v)
    # values vs f64 oracle (ascending)
    sref = np.sort(np.linalg.svd(np.asarray(a, np.float64),
                                 compute_uv=False), axis=-1)
    smax = sref[:, -1:]
    assert np.max(np.abs(np.asarray(s) - sref) / smax) < 1e-5
    # reconstruction (null columns contribute s ~ 0)
    rec = jnp.einsum("bmi,bi,bni->bmn", u, s, v,
                     precision=jax.lax.Precision.HIGHEST)
    assert float(jnp.max(jnp.abs(rec - a))) < 1e-4 * float(smax.max())


def test_deflated_eigh_quality_and_stress():
    """Deflated path (DC sort -> leaf solves -> offset stage -> finisher):
    quality must match the cold sweep on Wishart, clustered, exactly
    degenerate, and padded (n not a 64-multiple) inputs."""
    import numpy as np

    rng = np.random.default_rng(11)
    for n in (200, 256):
        B = 4
        w = rng.standard_normal((B, n, n)).astype(np.float32) / np.sqrt(n)
        a = (w @ np.swapaxes(w, -1, -2)
             + 0.05 * np.eye(n, dtype=np.float32)).astype(np.float32)
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lamc = np.sort(np.concatenate([np.linspace(0.1, 1, n - 16),
                                       np.full(16, 0.55)]))
        a[0] = ((q * lamc) @ q.T).astype(np.float32)
        lamd = np.repeat(np.linspace(0.2, 2.0, (n + 3) // 4), 4)[:n]
        q2, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a[1] = ((q2 * np.sort(lamd)) @ q2.T).astype(np.float32)

        lam0 = np.linalg.eigvalsh(a.astype(np.float64))
        lam, V = jacobi_eigh(jnp.asarray(a), interpret=True, deflate=True)
        lam = np.asarray(lam, np.float64)
        V = np.asarray(V, np.float64)
        scale = np.abs(lam0).max(axis=-1, keepdims=True)
        assert np.max(np.abs(lam - lam0) / scale) < 2e-5
        r = a.astype(np.float64) @ V - V * lam[:, None, :]
        colres = np.linalg.norm(r, axis=1) / np.linalg.norm(
            a, axis=(1, 2))[:, None]
        assert colres.max() < 2e-5, colres.max()
        for i in range(B):
            orth = np.linalg.norm(V[i].T @ V[i] - np.eye(n))
            assert orth < 5e-5, orth


def test_deflated_eigh_rejects_complex_and_gate():
    import importlib

    JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")

    a = jnp.eye(64, dtype=jnp.complex64)[None]
    with pytest.raises(ValueError, match="deflate"):
        jacobi_eigh(a, deflate=True)
    # auto gate: None window means deflate stays off unless requested
    assert JE._DEFLATE_WIN is None or (
        isinstance(JE._DEFLATE_WIN, tuple) and len(JE._DEFLATE_WIN) == 2)


def test_jacobi_svd_complex_packed_planes():
    """Complex Hestenes SVD on the packed-plane complex-pair kernel
    (interpret mode): rectangular both ways + square, f32-grade quality
    vs the f64 oracle (VERDICT r4 item 4b)."""
    import numpy as np

    from xitorch_tpu.ops.jacobi_eigh import jacobi_svd

    rng = np.random.default_rng(3)
    hi = jax.lax.Precision.HIGHEST
    for (m, n) in [(96, 64), (64, 96), (80, 80)]:
        a = (rng.standard_normal((2, m, n))
             + 1j * rng.standard_normal((2, m, n))).astype(np.complex64)
        u, s, v = jacobi_svd(jnp.asarray(a), interpret=True)
        sref = np.sort(np.linalg.svd(a.astype(np.complex128),
                                     compute_uv=False), axis=-1)
        assert np.max(np.abs(np.asarray(s) - sref) / sref[:, -1:]) < 2e-5
        r = min(m, n)
        rec = jnp.einsum("bmi,bi,bni->bmn", u, jnp.asarray(s), v.conj(),
                         precision=hi)
        assert float(jnp.max(jnp.abs(rec - a))) < 1e-4 * float(sref.max())
        for q in (u, v):
            orth = jnp.max(jnp.abs(jnp.einsum(
                "bmi,bmj->bij", q.conj(), q, precision=hi)
                - jnp.eye(r, dtype=q.dtype)))
            assert float(orth) < 5e-6, float(orth)
