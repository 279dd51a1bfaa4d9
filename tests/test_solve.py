"""linalg.solve tests (model: reference xitorch/_tests/test_linop_fcns.py solve section).

Every method is checked against the dense solution, and gradients (1st and
2nd order) are checked through the implicit-diff path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import solve
from tests.utils import assert_allclose, gradcheck2


def make_spd(rng, batch, n, dtype=jnp.float64):
    a = rng.standard_normal((*batch, n, n))
    a = a + np.swapaxes(a, -2, -1)
    a = a + n * np.eye(n)
    return jnp.asarray(a, dtype=dtype)


def dense_solve_ABE(Am, Bm, Em=None, Mm=None):
    """Dense reference solution of A X - M X E = B, column by column."""
    n, nc = Bm.shape[-2:]
    if Em is None:
        return jnp.linalg.solve(Am, Bm)
    cols = []
    for c in range(nc):
        M_ = Mm if Mm is not None else jnp.eye(n, dtype=Am.dtype)
        AE = Am - Em[..., c][..., None, None] * M_
        cols.append(jnp.linalg.solve(AE, Bm[..., c:c + 1]))
    return jnp.concatenate(cols, axis=-1)


class SPDOp(LinearOperator):
    """Matrix-free SPD operator: A = aa^T + n*I parameterized by a."""

    def __init__(self, a):
        n = a.shape[-1]
        super().__init__(shape=(*a.shape[:-2], n, n), is_hermitian=True,
                         dtype=a.dtype)
        self.a = a

    def _getparamnames(self, prefix=""):
        return [prefix + "a"]

    def dense(self):
        n = self.a.shape[-1]
        return self.a @ jnp.swapaxes(self.a, -2, -1) + n * jnp.eye(n, dtype=self.a.dtype)

    def _mv(self, x):
        at_x = jnp.einsum("...qp,...q->...p", self.a, x)
        return jnp.einsum("...pq,...q->...p", self.a, at_x) + self.a.shape[-1] * x


@pytest.mark.parametrize("method", ["cg", "bicgstab", "gmres", "exactsolve", "scipy_gmres"])
def test_solve_methods_match_dense(method, rng):
    n, nc = 12, 3
    Am = make_spd(rng, (), n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    A = LinearOperator.m(Am)
    x = solve(A, Bm, method=method, rtol=1e-10, atol=1e-12, max_niter=200)
    assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method", ["cg", "bicgstab", "gmres"])
def test_solve_batched(method, rng):
    n, nc, b = 10, 2, 4
    Am = make_spd(rng, (b,), n)
    Bm = jnp.asarray(rng.standard_normal((b, n, nc)))
    A = LinearOperator.m(Am, is_hermitian=True)
    x = solve(A, Bm, method=method, rtol=1e-10, atol=1e-12, max_niter=300)
    assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method", ["cg", "bicgstab", "exactsolve"])
@pytest.mark.parametrize("with_m", [False, True])
def test_solve_with_E_M(method, with_m, rng):
    n, nc = 8, 2
    Am = make_spd(rng, (), n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    Em = jnp.asarray(rng.standard_normal((nc,)) * 0.1)
    Mm = make_spd(rng, (), n) / n if with_m else None
    A = LinearOperator.m(Am, is_hermitian=True)
    M = LinearOperator.m(Mm, is_hermitian=True) if with_m else None
    x = solve(A, Bm, E=Em, M=M, method=method, rtol=1e-11, atol=1e-13, max_niter=500)
    expected = dense_solve_ABE(Am, Bm, Em, Mm)
    assert_allclose(x, expected, rtol=1e-5, atol=1e-7)


def test_solve_nonhermitian(rng):
    n, nc = 10, 2
    Am = jnp.asarray(rng.standard_normal((n, n))) + n * jnp.eye(n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    A = LinearOperator.m(Am)
    for method in ["bicgstab", "gmres"]:
        x = solve(A, Bm, method=method, rtol=1e-10, atol=1e-12, max_niter=300)
        assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-6, atol=1e-8)


def test_solve_jit_vmap(rng):
    n, nc = 8, 2
    Am = make_spd(rng, (3,), n)
    Bm = jnp.asarray(rng.standard_normal((3, n, nc)))

    @jax.jit
    def f(Am, Bm):
        A = LinearOperator.m(Am, is_hermitian=True)
        return solve(A, Bm, method="cg", rtol=1e-10, atol=1e-12)

    assert_allclose(f(Am, Bm), jnp.linalg.solve(Am, Bm), rtol=1e-6)

    g = jax.vmap(lambda a, b: solve(LinearOperator.m(a, is_hermitian=True), b,
                                    method="cg", rtol=1e-10, atol=1e-12))(Am, Bm)
    assert_allclose(g, jnp.linalg.solve(Am, Bm), rtol=1e-6)


@pytest.mark.parametrize("method", ["cg", "bicgstab"])
def test_solve_grad_matrixfree(method, rng):
    """Implicit gradients through a matrix-free solve: check vs dense autodiff."""
    n, nc = 6, 2
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.3)
    B = jnp.asarray(rng.standard_normal((n, nc)))

    def with_op(a, B):
        return solve(SPDOp(a), B, method=method, rtol=1e-12, atol=1e-14,
                     max_niter=500, posdef=True)

    def with_dense(a, B):
        return jnp.linalg.solve(SPDOp(a).dense(), B)

    assert_allclose(with_op(a, B), with_dense(a, B), rtol=1e-7)

    g1 = jax.grad(lambda a, B: jnp.sum(with_op(a, B) ** 3))(a, B)
    g2 = jax.grad(lambda a, B: jnp.sum(with_dense(a, B) ** 3))(a, B)
    assert_allclose(g1, g2, rtol=1e-5, atol=1e-7)

    gB1 = jax.grad(lambda B: jnp.sum(with_op(a, B) ** 3))(B)
    gB2 = jax.grad(lambda B: jnp.sum(with_dense(a, B) ** 3))(B)
    assert_allclose(gB1, gB2, rtol=1e-5, atol=1e-7)

    # second order vs dense
    h1 = jax.hessian(lambda a: jnp.sum(with_op(a, B) ** 3))(a)
    h2 = jax.hessian(lambda a: jnp.sum(with_dense(a, B) ** 3))(a)
    assert_allclose(h1, h2, rtol=1e-4, atol=1e-6)


def test_solve_grad_E_M(rng):
    n, nc = 6, 2
    Am = make_spd(rng, (), n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    Em = jnp.asarray(rng.standard_normal((nc,)) * 0.1)
    Mm = make_spd(rng, (), n) / n

    def with_op(Am, Bm, Em, Mm):
        A = LinearOperator.m(Am, is_hermitian=True)
        M = LinearOperator.m(Mm, is_hermitian=True)
        return jnp.sum(solve(A, Bm, E=Em, M=M, method="cg",
                             rtol=1e-12, atol=1e-14, max_niter=500) ** 2)

    def with_dense(Am, Bm, Em, Mm):
        return jnp.sum(dense_solve_ABE(Am, Bm, Em, Mm) ** 2)

    for argnum in range(4):
        g1 = jax.grad(with_op, argnums=argnum)(Am, Bm, Em, Mm)
        g2 = jax.grad(with_dense, argnums=argnum)(Am, Bm, Em, Mm)
        assert_allclose(g1, g2, rtol=1e-5, atol=1e-7,
                        msg="grad argnum %d" % argnum)


def test_solve_gradcheck_fd(rng):
    """Finite-difference gradcheck (order 2) on the implicit path."""
    n, nc = 5, 1
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.3)
    B = jnp.asarray(rng.standard_normal((n, nc)))

    def f(a, B):
        return solve(SPDOp(a), B, method="cg", rtol=1e-13, atol=1e-15,
                     max_niter=1000, posdef=True)

    gradcheck2(f, (a, B), order=2, atol=1e-4, rtol=1e-3, eps=1e-5)


def test_solve_cg_ir_mixed_precision(rng):
    """Mixed-precision iterative refinement reaches working-precision
    accuracy with bf16 inner solves."""
    n, nc = 16, 2
    Am = make_spd(rng, (), n, dtype=jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((n, nc)), dtype=jnp.float32)
    A = LinearOperator.m(Am, is_hermitian=True)
    x = solve(A, Bm, method="cg_ir", rtol=1e-6, atol=1e-7, posdef=True)
    resid = jnp.linalg.norm(A.mm(x) - Bm, axis=-2)
    assert float(jnp.max(resid)) < 1e-4
    # gradients still flow (implicit path independent of forward method)
    g = jax.grad(lambda B: jnp.sum(solve(A, B, method="cg_ir", posdef=True) ** 2))(Bm)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("method", ["cg", "bicgstab", "gmres", "cg_ir", "exactsolve"])
def test_solve_return_info_converged(method, rng):
    """(solution, info) convention: jit-safe converged flag + iteration count
    (SURVEY §5; reference warns on non-convergence from inside solvers)."""
    n, nc = 12, 2
    Am = make_spd(rng, (), n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    A = LinearOperator.m(Am, is_hermitian=True)

    @jax.jit
    def f(Bm):
        return solve(A, Bm, method=method, rtol=1e-9, atol=1e-11,
                     max_niter=300, return_info=True)

    x, info = f(Bm)
    assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-6, atol=1e-8)
    assert float(info["converged"]) == 1.0
    assert set(info) == {"converged", "iterations", "resid", "resid_rel"}

    # gradients flow through x (info has zero grads), matching the plain path
    def loss(Bm, with_info):
        if with_info:
            xx, _ = solve(A, Bm, method=method, rtol=1e-11, atol=1e-13,
                          max_niter=500, return_info=True)
        else:
            xx = solve(A, Bm, method=method, rtol=1e-11, atol=1e-13,
                       max_niter=500)
        return jnp.sum(xx ** 3)

    g1 = jax.grad(loss)(Bm, True)
    g2 = jax.grad(loss)(Bm, False)
    assert_allclose(g1, g2, rtol=1e-6, atol=1e-9)


def test_solve_return_info_param_grads_second_order(rng):
    """Implicit grads (params of A, 2nd order) through the info path match
    the dense oracle."""
    n, nc = 6, 1
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.3)
    B = jnp.asarray(rng.standard_normal((n, nc)))

    def with_op(a):
        x, info = solve(SPDOp(a), B, method="cg", rtol=1e-12, atol=1e-14,
                        max_niter=500, posdef=True, return_info=True)
        return jnp.sum(x ** 3)

    def with_dense(a):
        return jnp.sum(jnp.linalg.solve(SPDOp(a).dense(), B) ** 3)

    assert_allclose(jax.grad(with_op)(a), jax.grad(with_dense)(a),
                    rtol=1e-5, atol=1e-7)
    assert_allclose(jax.hessian(with_op)(a), jax.hessian(with_dense)(a),
                    rtol=1e-4, atol=1e-6)


def test_solve_nonconvergence_warns_and_flags(rng):
    from xitorch_tpu.utils.exceptions import ConvergenceWarning

    n, nc = 30, 2
    Am = make_spd(rng, (), n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    A = LinearOperator.m(Am, is_hermitian=True)
    import warnings as _warnings
    with pytest.warns(ConvergenceWarning):
        x, info = solve(A, Bm, method="cg", rtol=1e-14, atol=1e-16,
                        max_niter=2, return_info=True)
    assert float(info["converged"]) == 0.0
    assert float(info["iterations"]) == 2.0
    # the plain path (no info) also warns in eager mode via a residual check
    with pytest.warns(ConvergenceWarning):
        solve(A, Bm, method="cg", rtol=1e-14, atol=1e-16, max_niter=1)
    # converged solves do not warn
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        solve(A, Bm, method="cg", rtol=1e-9, atol=1e-11, max_niter=300,
              return_info=True)


def test_solve_return_info_unsupported_method(rng):
    n = 8
    Am = make_spd(rng, (), n)
    A = LinearOperator.m(Am, is_hermitian=True)
    Bm = jnp.asarray(rng.standard_normal((n, 1)))
    with pytest.raises(RuntimeError, match="return_info"):
        solve(A, Bm, method="scipy_gmres", return_info=True)


def test_solve_cg_ir_nonhermitian_falls_back(rng):
    """cg_ir on a non-hermitian operator must still solve correctly (it
    falls back to cg's normal-equation path; refining plain-A corrections
    against an A^H A outer residual would be inconsistent)."""
    n, nc = 10, 2
    Am = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.float64)
    Am = Am + n * jnp.eye(n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)), dtype=jnp.float64)
    A = LinearOperator.m(Am)
    assert not A.is_hermitian
    x = solve(A, Bm, method="cg_ir", rtol=1e-9, atol=1e-11, max_niter=400)
    assert_allclose(x, jnp.linalg.solve(Am, Bm), rtol=1e-5, atol=1e-7)


def test_gmres_restarted(rng):
    """GMRES(k) with restarts matches the full-memory solve (and its info
    reports total iterations across cycles)."""
    n, nc = 24, 2
    Am = jnp.asarray(rng.standard_normal((n, n))) + n * jnp.eye(n)
    Bm = jnp.asarray(rng.standard_normal((n, nc)))
    A = LinearOperator.m(Am)
    x_full, info_full = solve(A, Bm, method="gmres", rtol=1e-10, atol=1e-12,
                              max_niter=200, return_info=True)
    x_rst, info_rst = solve(A, Bm, method="gmres", rtol=1e-10, atol=1e-12,
                            max_niter=200, restart=8, return_info=True)
    expected = jnp.linalg.solve(Am, Bm)
    assert_allclose(x_full, expected, rtol=1e-6, atol=1e-8)
    assert_allclose(x_rst, expected, rtol=1e-6, atol=1e-8)
    assert float(info_rst["converged"]) == 1.0
    # grads flow through the restarted path too
    g = jax.grad(lambda B: jnp.sum(solve(A, B, method="gmres", restart=8,
                                         max_niter=200) ** 2))(Bm)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_linop_dense_folding_and_heuristic(rng):
    """Explicit-operator algebra folds to explicit operators (reference
    linop.py:432-444) and the default-method heuristic keys on the
    is_fullmatrix_implemented capability flag."""
    from xitorch_tpu import MatrixLinearOperator

    n = 6
    Am = make_spd(rng, (), n)
    Bm2 = make_spd(rng, (), n)
    A = LinearOperator.m(Am, is_hermitian=True)
    B = LinearOperator.m(Bm2, is_hermitian=True)
    S = A + B
    D = A - B
    T = 2.0 * A
    assert isinstance(S, MatrixLinearOperator)
    assert isinstance(D, MatrixLinearOperator)
    assert isinstance(T, MatrixLinearOperator)
    assert S.is_hermitian and D.is_hermitian and T.is_hermitian
    assert_allclose(S.fullmatrix(), Am + Bm2)
    assert_allclose(D.fullmatrix(), Am - Bm2)
    assert_allclose(T.fullmatrix(), 2.0 * Am)

    # custom subclass with its own _fullmatrix -> exactsolve default
    class FullOp(SPDOp):
        def _fullmatrix(self):
            return self.dense()

    a = jnp.asarray(rng.standard_normal((n, n)) * 0.3)
    b = jnp.asarray(rng.standard_normal((n, 1)))
    x = solve(FullOp(a), b)  # default method -> exactsolve (dense path)
    assert_allclose(x, jnp.linalg.solve(FullOp(a).dense(), b), rtol=1e-8)
    assert FullOp(a).is_fullmatrix_implemented
    assert not SPDOp(a).is_fullmatrix_implemented


def test_minres_indefinite():
    # symmetric indefinite spectrum: cg must fall back to the normal
    # equations (squared conditioning); minres solves it directly
    rng = np.random.default_rng(11)
    n = 80
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = np.concatenate([np.linspace(-1, -0.1, n // 2),
                         np.linspace(0.1, 1, n - n // 2)])
    mat = jnp.asarray((q * ev) @ q.T)
    A = LinearOperator.m(mat, is_hermitian=True)
    B = jnp.asarray(rng.standard_normal((n, 4)))

    x, info = solve(A, B, method="minres", rtol=1e-9, atol=1e-11,
                    return_info=True)
    assert float(info["converged"]) == 1.0
    assert jnp.max(jnp.abs(A.mm(x) - B)) < 1e-7

    # per-column shifts (the symeig implicit-gradient shape)
    E = jnp.asarray([0.05, -0.03])
    Bs = jnp.asarray(rng.standard_normal((n, 2)))
    xs = solve(A, Bs, E=E, method="minres", rtol=1e-9, atol=1e-11)
    assert jnp.max(jnp.abs(A.mm(xs) - xs * E[None, :] - Bs)) < 1e-7

    # batched + jit
    mats = jnp.stack([mat, mat + 0.05 * jnp.eye(n)])
    xb = jax.jit(lambda m, b: solve(LinearOperator.m(m, is_hermitian=True),
                                    b, method="minres", rtol=1e-9,
                                    atol=1e-11))(mats, B)
    assert xb.shape == (2, n, 4)
    Ab = LinearOperator.m(mats, is_hermitian=True)
    assert jnp.max(jnp.abs(Ab.mm(xb) - B)) < 1e-7

    # non-hermitian operators are rejected with a clear message
    with pytest.raises(RuntimeError):
        solve(LinearOperator.m(jnp.asarray(rng.standard_normal((5, 5)))),
              jnp.ones((5, 1)), method="minres")


def test_minres_grads():
    rng = np.random.default_rng(12)
    n = 12
    mat = jnp.asarray(rng.standard_normal((n, n)))
    B = jnp.asarray(rng.standard_normal((n, 2)))

    def loss(matm, Bm):
        m2 = (matm + matm.T) / 2 - 0.3 * jnp.eye(n)  # indefinite
        return jnp.sum(solve(LinearOperator.m(m2, is_hermitian=True), Bm,
                             method="minres", rtol=1e-11, atol=1e-13) ** 2)

    gradcheck2(loss, (mat, B), order=2, atol=2e-4, rtol=2e-3, eps=1e-5)


def test_minres_complex_hermitian():
    # complex hermitian input: the Lanczos diagonal and Givens state must
    # stay real-typed (regression: complex davidson grads route here via
    # the E-shifted default)
    rng = np.random.default_rng(13)
    n = 24
    a = jnp.asarray(rng.standard_normal((n, n))
                    + 1j * rng.standard_normal((n, n)))
    mat = (a + a.conj().T) / 2
    A = LinearOperator.m(mat, is_hermitian=True)
    B = jnp.asarray(rng.standard_normal((n, 2))
                    + 1j * rng.standard_normal((n, 2)))
    x = solve(A, B, method="minres", rtol=1e-10, atol=1e-12)
    assert jnp.max(jnp.abs(A.mm(x) - B)) < 1e-7
    E = jnp.asarray([0.1, -0.2])
    xs = solve(A, B, E=E, method="minres", rtol=1e-10, atol=1e-12)
    assert jnp.max(jnp.abs(A.mm(xs) - xs * E[None, :] - B)) < 1e-7


def test_info_honesty_no_slack():
    """Library-wide rule (_make_info): converged = resid_rel < 1.0 at every
    call site, with resid the MEASURED residual of the returned iterate —
    a solve a few x over tolerance must report converged=0 on every method
    (regression: minres / tridiag-Thomas / kron_direct carried a 10x slack
    that blinded assert_converged on exactly the paths it guards)."""
    import warnings as _warnings

    from xitorch_tpu import KronSumOperator, TridiagLowRankOperator

    # --- minres: cap iterations, then re-run with rtol placing the
    # measured residual a few x over tolerance (rel in (1, 10))
    rng = np.random.default_rng(21)
    n = 60
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = np.concatenate([np.linspace(-1, -0.1, n // 2),
                         np.linspace(0.1, 1, n - n // 2)])
    A = LinearOperator.m(jnp.asarray((q * ev) @ q.T), is_hermitian=True)
    B = jnp.asarray(rng.standard_normal((n, 2)))
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        _, info0 = solve(A, B, method="minres", rtol=1e-30, atol=1e-30,
                         max_niter=10, return_info=True)
        resid = float(info0["resid"])
        bnorm = float(jnp.max(jnp.linalg.norm(B, axis=-2)))
        # same iteration budget, tolerance set 5x below the residual
        _, info = solve(A, B, method="minres", rtol=resid / (5 * bnorm),
                        atol=0.0, max_niter=10, return_info=True)
    rel = float(info["resid_rel"])
    assert 1.0 < rel < 10.0
    assert float(info["converged"]) == 0.0

    # --- tridiag Thomas direct path: a near-singular shifted system whose
    # measured residual sits over tolerance must not report success
    n = 16
    d = jnp.full((n,), 2.0, jnp.float32)
    c = jnp.full((n - 1,), -1.0, jnp.float32)
    At = TridiagLowRankOperator(d, c)
    lam0 = float(jnp.linalg.eigvalsh(At.fullmatrix())[0])
    b = jnp.ones((n, 1), jnp.float32)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        _, info_t = solve(At, b, E=jnp.asarray([lam0], jnp.float32),
                          method="structured_cg", return_info=True,
                          interpret=True)
    assert float(info_t["resid_rel"]) > 1.0
    assert float(info_t["converged"]) == 0.0

    # --- kron_direct is normwise backward-stable (its info documents the
    # ||A||*||x|| backward-error scale), so its failure mode is the
    # singular pencil — an E shift AT an eigenvalue sum must be flagged
    # converged=0 by the explicit singularity detector, never excused
    n1 = n2 = 8
    h1 = jnp.asarray(make_spd(rng, (), n1), jnp.float64)
    h2 = jnp.asarray(make_spd(rng, (), n2), jnp.float64)
    Ak = KronSumOperator(h1, h2, is_hermitian=True)
    comb, _ = Ak.combined_eigendecomposition()
    lam_exact = jnp.min(comb)
    Bk = jnp.ones((n1 * n2, 1), jnp.float64)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        _, info_k = solve(Ak, Bk, E=lam_exact[None],
                          method="kron_direct", return_info=True)
    assert float(info_k["converged"]) == 0.0
    # a regular solve on the same operator reports success
    _, info_k2 = solve(Ak, Bk, method="kron_direct", return_info=True)
    assert float(info_k2["converged"]) == 1.0

    # consistency across the info-reporting methods: converged must equal
    # (resid_rel < 1) — no per-method slack (kron_direct's singularity
    # flag is additionally allowed to force 0)
    for info_i in (info0, info, info_t, info_k2):
        assert float(info_i["converged"]) == float(
            float(info_i["resid_rel"]) < 1.0)
