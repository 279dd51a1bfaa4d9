"""Tests for the MXU spectral divide-and-conquer preconditioner
(ops/spectral_dc.py XLA reference + ops/dc_kernel.py Pallas port) and its
integration into jacobi_eigh.

The preconditioner is performance-only: correctness is borne by the
Jacobi finisher.  These tests pin down (a) the basis really is
orthonormal and really concentrates A near block-diagonal, (b) the
Pallas port agrees with the XLA reference, (c) the preconditioned
jacobi_eigh keeps the exacteig quality contract, including on clustered
spectra and under vmap/jit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu.ops.spectral_dc import spectral_sort_basis, dc_precondition
from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu
from xitorch_tpu.ops.jacobi_eigh import jacobi_eigh

HI = jax.lax.Precision.HIGHEST


def _spd(key, B, n, dtype=jnp.float32):
    a = jax.random.normal(key, (B, n, n), dtype) / n ** 0.5
    return a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(n, dtype=dtype)


def _offmass(T):
    d = jnp.diagonal(T, axis1=-2, axis2=-1)
    off = T - jnp.eye(T.shape[-1], dtype=T.dtype) * d[:, :, None]
    return float(jnp.sqrt(jnp.sum(off ** 2)))


class TestSpectralSortBasis:
    def test_orthonormal_and_concentrating(self):
        A = _spd(jax.random.PRNGKey(0), 3, 128)
        Q = spectral_sort_basis(A, levels=5, min_seg=2)
        QtQ = jnp.matmul(jnp.swapaxes(Q, -1, -2), Q, precision=HI)
        assert float(jnp.max(jnp.abs(QtQ - jnp.eye(128)))) < 1e-4
        T = jnp.matmul(jnp.swapaxes(Q, -1, -2),
                       jnp.matmul(A, Q, precision=HI), precision=HI)
        assert _offmass(T) < 0.25 * _offmass(A)

    def test_diag_roughly_sorted(self):
        # after the sort, the diagonal approximates ascending eigenvalues
        A = _spd(jax.random.PRNGKey(1), 2, 96)
        Q = spectral_sort_basis(A, levels=5, min_seg=2)
        T = jnp.matmul(jnp.swapaxes(Q, -1, -2),
                       jnp.matmul(A, Q, precision=HI), precision=HI)
        d = np.asarray(jnp.diagonal(T, axis1=-2, axis2=-1))
        lam = np.linalg.eigvalsh(np.asarray(A, np.float64))
        # Spearman-style check: the diagonal correlates strongly with the
        # sorted spectrum (soft splits allow local misorderings)
        for b in range(d.shape[0]):
            corr = np.corrcoef(d[b], lam[b])[0, 1]
            assert corr > 0.98, corr

    def test_degenerate_clusters(self):
        # tight clusters straddling split points must not break
        # orthogonality (the archetypal soft-projector case)
        n = 128
        w = jnp.concatenate([jnp.ones(40), jnp.ones(40) * (1 + 1e-4),
                             jnp.linspace(2.0, 3.0, 48)])
        q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(7),
                                               (n, n)))
        A = ((q * w[None, :]) @ q.T)[None].astype(jnp.float32)
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        Q = spectral_sort_basis(A, levels=5, min_seg=2)
        QtQ = jnp.matmul(jnp.swapaxes(Q, -1, -2), Q, precision=HI)
        assert float(jnp.max(jnp.abs(QtQ - jnp.eye(n)))) < 1e-4


class TestDcKernel:
    def test_matches_xla_reference(self):
        A = _spd(jax.random.PRNGKey(2), 2, 96)
        gk = dc_precondition_tpu(A, levels=4, min_seg=2, interpret=True)
        gx = dc_precondition(A, levels=4, min_seg=2)
        # same algorithm/mixer/schedules; precision paths differ
        assert float(jnp.max(jnp.abs(gk - gx))) < 0.1
        # the warm panel must satisfy G0^T G0 == A^2 (Q orthonormal)
        gtg = jnp.einsum("bij,bik->bjk", gk, gk, precision=HI)
        a2 = jnp.einsum("bij,bjk->bik", A, A, precision=HI)
        rel = float(jnp.max(jnp.abs(gtg - a2)) / jnp.max(jnp.abs(a2)))
        assert rel < 1e-4, rel

    def test_concentrates(self):
        A = _spd(jax.random.PRNGKey(3), 2, 128)
        g = dc_precondition_tpu(A, levels=6, min_seg=2, interpret=True)
        # G0 G0^T = Q^T A^2 Q: its off-diagonal mass shrinks vs A^2's
        gg = jnp.einsum("bij,bkj->bik", g, g, precision=HI)
        a2 = jnp.einsum("bij,bjk->bik", A, A, precision=HI)
        assert _offmass(gg) < 0.25 * _offmass(a2)

    def test_per_level_contract_and_concentration(self):
        # the HBM-streamed per-level variant (512 < n <= 1024 on TPU)
        # uses a cubic-only sign schedule, so it differs numerically from
        # the single-shot kernel; test its contract instead: G0 = Q^T A
        # with Q orthonormal, and concentration
        A = _spd(jax.random.PRNGKey(11), 2, 96)
        g = dc_precondition_tpu(A, levels=4, min_seg=2, interpret=True,
                                per_level=True)
        gtg = jnp.einsum("bij,bik->bjk", g, g, precision=HI)
        a2 = jnp.einsum("bij,bjk->bik", A, A, precision=HI)
        rel = float(jnp.max(jnp.abs(gtg - a2)) / jnp.max(jnp.abs(a2)))
        assert rel < 1e-4, rel
        gg = jnp.einsum("bij,bkj->bik", g, g, precision=HI)
        assert _offmass(gg) < 0.3 * _offmass(a2)

    def test_per_level_through_jacobi(self, monkeypatch):
        # end-to-end: force the per-level auto threshold down so the
        # preconditioned jacobi_eigh path runs the HBM-streamed variant
        from xitorch_tpu.ops import dc_kernel
        monkeypatch.setattr(dc_kernel, "_PER_LEVEL_MIN_N", 0)
        A = _spd(jax.random.PRNGKey(12), 2, 96)
        lam, V = jacobi_eigh(A, precondition=True)
        lam0 = np.linalg.eigvalsh(np.asarray(A, np.float64))
        assert float(jnp.max(jnp.abs(lam - lam0))) < 5e-5
        R = jnp.einsum("bij,bjk->bik", A, V, precision=HI) \
            - V * lam[:, None, :]
        assert float(jnp.max(jnp.abs(R))) < 5e-4


class TestJacobiPreconditioned:
    @pytest.mark.parametrize("n", [96, 129])
    def test_quality_matches_cold(self, n):
        A = _spd(jax.random.PRNGKey(4), 2, n)
        lamc, Vc = jacobi_eigh(A, precondition=False)
        lamw, Vw = jacobi_eigh(A, precondition=True)
        lam0 = np.linalg.eigvalsh(np.asarray(A, np.float64))
        assert float(jnp.max(jnp.abs(lamw - lam0))) < 5e-5
        R = jnp.einsum("bij,bjk->bik", A, Vw, precision=HI) \
            - Vw * lamw[:, None, :]
        assert float(jnp.max(jnp.abs(R))) < 5e-4
        orth = jnp.einsum("bji,bjk->bik", Vw, Vw, precision=HI) \
            - jnp.eye(n)
        assert float(jnp.max(jnp.abs(orth))) < 5e-6
        # warm vs cold parity: same eigenvalues to kernel tolerance, and
        # the warm residual is no worse than 2x the cold one
        assert float(jnp.max(jnp.abs(lamw - lamc))) < 5e-5
        Rc = jnp.einsum("bij,bjk->bik", A, Vc, precision=HI) \
            - Vc * lamc[:, None, :]
        rw = float(jnp.max(jnp.abs(R)))
        rc = float(jnp.max(jnp.abs(Rc)))
        assert rw < max(2.0 * rc, 1e-5), (rw, rc)

    def test_complex_precondition_rejected(self):
        a = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64))
        A = (a + 1j * a).astype(jnp.complex64)
        A = A @ jnp.swapaxes(A, -1, -2).conj()
        with pytest.raises(ValueError, match="complex"):
            jacobi_eigh(A, precondition=True)

    def test_per_level_vmap(self, monkeypatch):
        # the per-level kernel indexes HBM refs by program_id(0); the
        # custom_vmap rule must fold the vmap axis into the batch axis
        # (without it, Pallas's batching rule prepends the vmap axis to
        # the grid and every program would address the wrong matrix)
        from xitorch_tpu.ops import dc_kernel
        monkeypatch.setattr(dc_kernel, "_PER_LEVEL_MIN_N", 0)
        A = _spd(jax.random.PRNGKey(13), 3, 96)
        lam_b, _ = jacobi_eigh(A, precondition=True)
        lam_v, _ = jax.vmap(
            lambda m: jacobi_eigh(m, precondition=True))(A[:, None])
        assert jnp.allclose(lam_b, lam_v[:, 0], atol=1e-4)

    def test_clustered_spectrum(self):
        n = 96
        w = jnp.concatenate([jnp.full((30,), 1.0),
                             jnp.full((30,), 1.0 + 2e-4),
                             jnp.linspace(1.5, 2.0, 36)])
        q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(9),
                                               (n, n)))
        A = ((q * w[None, :]) @ q.T)[None].astype(jnp.float32)
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        lam, V = jacobi_eigh(A, precondition=True)
        lam0 = np.linalg.eigvalsh(np.asarray(A, np.float64))
        assert float(jnp.max(jnp.abs(lam - lam0))) < 5e-5
        R = jnp.einsum("bij,bjk->bik", A, V, precision=HI) \
            - V * lam[:, None, :]
        assert float(jnp.max(jnp.abs(R))) < 5e-4

    def test_jit_and_vmap(self):
        A = _spd(jax.random.PRNGKey(5), 4, 96)
        f = jax.jit(lambda m: jacobi_eigh(m, precondition=True))
        lam, V = f(A)
        lamv, Vv = jax.vmap(
            lambda m: jacobi_eigh(m, precondition=True))(A[:, None])
        assert jnp.allclose(lam, lamv[:, 0], atol=1e-4)

    def test_pathological_spectra(self):
        # scaled identity: every split is maximally soft (all eigenvalues
        # equal); the preconditioner must stay orthonormal and harmless
        A = (3.0 * jnp.eye(96))[None].astype(jnp.float32)
        lam, V = jacobi_eigh(A, precondition=True)
        assert float(jnp.max(jnp.abs(lam - 3.0))) < 1e-5
        orth = jnp.einsum("bji,bjk->bik", V, V, precision=HI) - jnp.eye(96)
        assert float(jnp.max(jnp.abs(orth))) < 5e-6
        # rank-deficient PSD: half the spectrum exactly zero
        q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(0),
                                               (96, 96)))
        w = jnp.concatenate([jnp.zeros(48), jnp.linspace(1, 2, 48)])
        A3 = ((q * w[None]) @ q.T)[None].astype(jnp.float32)
        A3 = 0.5 * (A3 + jnp.swapaxes(A3, -1, -2))
        lam3, _ = jacobi_eigh(A3, precondition=True)
        lam30 = np.linalg.eigvalsh(np.asarray(A3, np.float64))
        assert float(jnp.max(jnp.abs(lam3 - lam30))) < 5e-5
        # negative definite, odd n, odd batch
        a = jax.random.normal(jax.random.PRNGKey(3), (3, 97, 97),
                              jnp.float32) / 10
        A4 = (-(a @ jnp.swapaxes(a, -1, -2))
      - jnp.eye(97, dtype=jnp.float32))
        lam4, _ = jacobi_eigh(A4, precondition=True)
        lam40 = np.linalg.eigvalsh(np.asarray(A4, np.float64))
        assert float(jnp.max(jnp.abs(lam4 - lam40))) < 5e-5

    def test_blend_keeps_invariant_in_validated_window(self):
        # ADVICE r2: the _RANK_SAFE_BETA blend changes the preconditioner
        # output across the whole window — pin that the G-invariant and
        # concentration still meet the healthy floor with the blend on
        import math
        for n in (192, 256):
            A = _spd(jax.random.PRNGKey(30 + n), 2, n)
            levels = max(3, math.ceil(math.log2(n)))  # as jacobi_eigh uses
            g = dc_precondition_tpu(A, levels=levels, min_seg=2,
                                    interpret=True)
            gtg = jnp.einsum("bij,bik->bjk", g, g, precision=HI)
            a2 = jnp.einsum("bij,bjk->bik", A, A, precision=HI)
            rel = float(jnp.max(jnp.abs(gtg - a2)) / jnp.max(jnp.abs(a2)))
            assert rel < 1e-4, (n, rel)
            gg = jnp.einsum("bij,bkj->bik", g, g, precision=HI)
            assert _offmass(gg) < 0.25 * _offmass(a2), n

    def test_broken_preconditioner_fails_safe(self, monkeypatch):
        # a warm panel whose implicit Q lost rank (the failure mode the
        # blend exists for, observed pre-fix at n=704/768 on hardware)
        # must be caught by the runtime G-invariant guard in jacobi_eigh
        # and fall back to the cold sweep — decomposition unaffected
        from xitorch_tpu.ops import dc_kernel

        def broken(a, **kw):
            n = a.shape[-1]
            q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(0),
                                                   (n, n), a.dtype))
            q = q.at[:, 0].set(0.0)  # rank-deficient "orthogonal" factor
            return jnp.einsum("ji,bjk->bik", q, a)

        monkeypatch.setattr(dc_kernel, "dc_precondition_tpu", broken)
        A = _spd(jax.random.PRNGKey(21), 2, 96)
        lam, V = jacobi_eigh(A, precondition=True)
        lam0 = np.linalg.eigvalsh(np.asarray(A, np.float64))
        assert float(jnp.max(jnp.abs(lam - lam0))) < 5e-5
        R = jnp.einsum("bij,bjk->bik", A, V, precision=HI) \
            - V * lam[:, None, :]
        assert float(jnp.max(jnp.abs(R))) < 5e-4

    def test_grad_through_degen_eigh_dispatch(self):
        # the symeig path wraps jacobi via degen_eigh custom_jvp; ensure
        # the preconditioner stays invisible to autodiff
        from xitorch_tpu._impls.linalg.symeig import degen_eigh
        A = _spd(jax.random.PRNGKey(6), 1, 64).astype(jnp.float64)

        def f(m):
            lam, V = degen_eigh(0.5 * (m + jnp.swapaxes(m, -1, -2)))
            return jnp.sum(lam ** 2)

        g = jax.grad(f)(A)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestReturnT:
    def test_t_export_invariants(self):
        """return_t exports the UNMASKED first-power T = Q^T A Q:
        G0 G0^T == T^2 (orthogonal Q), T symmetric, spectrum preserved,
        and the G panel identical to the return_t=False call."""
        rng = np.random.default_rng(7)
        B, n = 3, 128
        w = rng.standard_normal((B, n, n)).astype(np.float32) / np.sqrt(n)
        a = (w @ np.swapaxes(w, -1, -2)
             + 0.05 * np.eye(n, dtype=np.float32)).astype(np.float32)
        a_j = jnp.asarray(a)

        g_only = dc_precondition_tpu(a_j, levels=2, min_seg=2,
                                     interpret=True)
        g, t = dc_precondition_tpu(a_j, levels=2, min_seg=2,
                                   interpret=True, return_t=True)
        assert np.allclose(np.asarray(g), np.asarray(g_only))

        t64 = np.asarray(t, np.float64)
        g64 = np.asarray(g, np.float64)
        # symmetry
        assert np.abs(t64 - np.swapaxes(t64, -1, -2)).max() < 1e-4
        # spectrum preserved (orthogonal conjugation)
        lam_a = np.linalg.eigvalsh(a.astype(np.float64))
        lam_t = np.linalg.eigvalsh(t64)
        scale = np.abs(lam_a).max()
        assert np.abs(lam_a - lam_t).max() / scale < 1e-4
        # G-invariant: G0 G0^T = Q^T A^2 Q = T^2
        gg = g64 @ np.swapaxes(g64, -1, -2)
        tt = t64 @ t64
        assert np.abs(gg - tt).max() / (scale ** 2) < 1e-4

    def test_return_t_rejects_per_level(self):
        a = jnp.eye(128, dtype=jnp.float32)[None]
        with pytest.raises(ValueError, match="return_t"):
            dc_precondition_tpu(a, levels=2, per_level=True, return_t=True)
