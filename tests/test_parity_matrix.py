"""Systematic reference-parity matrix (VERDICT r3 item 4).

One parametrized sweep per public functional covering EVERY method string
shared with the torch reference at /root/reference: values <= 1e-6
rel-err, first-order gradients <= 1e-6, and gradgrad on the
implicit-differentiation core entry points (rootfinder / solve / symeig),
all at float64 on CPU — the reference's own oracle pattern
(/root/reference/xitorch/_tests/test_optimize.py:315-443,
test_linop_fcns.py:477, test_integrate.py:220) as a single table.

Methods ours registers beyond the reference (lbfgs, minres, cg_ir,
scipy_gmres, chebfsi, kron_exact, tanhsinh, pchip, bwd_euler,
trapezoidal, sdirk2) have no reference cell to pin against and are
covered by the self-consistency method matrices in their own test files.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
xitorch_ref = pytest.importorskip("xitorch")

from tests.utils import assert_allclose  # noqa: E402

from xitorch_tpu import LinearOperator as LinOpTPU  # noqa: E402
from xitorch_tpu.integrate import mcquad as mcquad_tpu  # noqa: E402
from xitorch_tpu.integrate import quad as quad_tpu  # noqa: E402
from xitorch_tpu.integrate import solve_ivp as ivp_tpu  # noqa: E402
from xitorch_tpu.integrate import SQuad as SQuadTPU  # noqa: E402
from xitorch_tpu.interpolate import Interp1D as InterpTPU  # noqa: E402
from xitorch_tpu.linalg import solve as solve_tpu  # noqa: E402
from xitorch_tpu.linalg import symeig as symeig_tpu  # noqa: E402
from xitorch_tpu.optimize import equilibrium as eq_tpu  # noqa: E402
from xitorch_tpu.optimize import minimize as min_tpu  # noqa: E402
from xitorch_tpu.optimize import rootfinder as rf_tpu  # noqa: E402

RT = dict(rtol=1e-6, atol=1e-9)

A_NP = np.asarray([[1.1, 0.4], [0.3, 0.8]], dtype=np.float64)
B_NP = np.asarray([[0.3], [-0.2]], dtype=np.float64)


# ---------------------------------------------------------------- optimize

ROOT_METHODS = ["broyden1", "broyden2", "linearmixing", "newton"]
EQ_METHODS = ROOT_METHODS + ["anderson_acc"]
MIN_METHODS = ROOT_METHODS + ["gd", "adam"]


def _rf_opts(method):
    # linearmixing's unit-step fixed-point mixing needs more iterations
    # on the same contraction than the quasi-Newton family
    o = {"f_tol": 1e-12, "maxiter": 20000}
    if method == "linearmixing":
        o["alpha"] = -0.3
    if method == "newton":
        # the reference's TerminationCondition also gates on the step norm
        # with a default x_tol=1e-6 (rootsolver.py:366) — newton converges
        # quadratically, so it stops one iteration short (~4e-8 iterate
        # error -> ~2e-6 gradient error) unless x_tol is tightened to
        # match f_tol
        o["x_tol"] = 1e-13
    return o


@pytest.mark.parametrize("method", ROOT_METHODS)
def test_rootfinder_matrix(method):
    from xitorch.optimize import rootfinder as rf_ref

    def fcn_t(y, A):
        return torch.tanh(A @ y + 0.1) + y / 2.0

    def fcn_j(y, A):
        return jnp.tanh(A @ y + 0.1) + y / 2.0

    A_t = torch.tensor(A_NP, requires_grad=True)
    y_ref = rf_ref(fcn_t, torch.zeros((2, 1), dtype=torch.float64),
                   params=(A_t,), method=method, **_rf_opts(method))
    loss_ref = (y_ref ** 2).sum()
    g_ref, = torch.autograd.grad(loss_ref, (A_t,), create_graph=True)
    gg_ref, = torch.autograd.grad(g_ref.sum(), (A_t,))

    def loss_j(A):
        y = rf_tpu(fcn_j, jnp.zeros((2, 1)), params=(A,), method=method,
                   **_rf_opts(method))
        return jnp.sum(y ** 2)

    A_j = jnp.asarray(A_NP)
    y_j = rf_tpu(fcn_j, jnp.zeros((2, 1)), params=(A_j,), method=method,
                 **_rf_opts(method))
    assert_allclose(y_j, y_ref.detach().numpy(), **RT)
    assert_allclose(jax.grad(loss_j)(A_j), g_ref.detach().numpy(), **RT)
    gg_j = jax.grad(lambda A: jnp.sum(jax.grad(loss_j)(A)))(A_j)
    assert_allclose(gg_j, gg_ref.detach().numpy(), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method", EQ_METHODS)
def test_equilibrium_matrix(method):
    from xitorch.optimize import equilibrium as eq_ref

    def fcn_t(y, A):
        return torch.tanh(A @ y + 0.1)

    def fcn_j(y, A):
        return jnp.tanh(A @ y + 0.1)

    A_t = torch.tensor(A_NP, requires_grad=True)
    y_ref = eq_ref(fcn_t, torch.zeros((2, 1), dtype=torch.float64),
                   params=(A_t,), method=method, **_rf_opts(method))
    g_ref, = torch.autograd.grad((y_ref ** 2).sum(), (A_t,))

    def loss_j(A):
        y = eq_tpu(fcn_j, jnp.zeros((2, 1)), params=(A,), method=method,
                   **_rf_opts(method))
        return jnp.sum(y ** 2)

    A_j = jnp.asarray(A_NP)
    y_j = eq_tpu(fcn_j, jnp.zeros((2, 1)), params=(A_j,), method=method,
                 **_rf_opts(method))
    assert_allclose(y_j, y_ref.detach().numpy(), **RT)
    assert_allclose(jax.grad(loss_j)(A_j), g_ref.detach().numpy(), **RT)


def _min_opts(method):
    if method == "gd":
        return {"step": 0.08, "maxiter": 40000, "f_rtol": 0, "x_rtol": 0,
                "f_tol": 0, "x_tol": 1e-13}
    if method == "adam":
        return {"step": 0.05, "maxiter": 60000, "f_rtol": 0, "x_rtol": 0,
                "f_tol": 0, "x_tol": 1e-13}
    return _rf_opts(method)


@pytest.mark.parametrize("method", MIN_METHODS)
def test_minimize_matrix(method):
    from xitorch.optimize import minimize as min_ref

    # strongly convex with a non-quadratic term so gd/adam converge to a
    # unique interior minimum both sides can hit to ~x_tol
    def fcn_t(y, A):
        z = A @ y - torch.tensor(B_NP)
        return (z ** 2).sum() + 0.1 * (y ** 4).sum()

    def fcn_j(y, A):
        z = A @ y - jnp.asarray(B_NP)
        return jnp.sum(z ** 2) + 0.1 * jnp.sum(y ** 4)

    A_t = torch.tensor(A_NP, requires_grad=True)
    y_ref = min_ref(fcn_t, torch.zeros((2, 1), dtype=torch.float64),
                    params=(A_t,), method=method, **_min_opts(method))
    g_ref, = torch.autograd.grad((y_ref ** 2).sum(), (A_t,))

    def loss_j(A):
        y = min_tpu(fcn_j, jnp.zeros((2, 1)), params=(A,), method=method,
                    **_min_opts(method))
        return jnp.sum(y ** 2)

    A_j = jnp.asarray(A_NP)
    y_j = min_tpu(fcn_j, jnp.zeros((2, 1)), params=(A_j,), method=method,
                  **_min_opts(method))
    assert_allclose(y_j, y_ref.detach().numpy(), rtol=1e-6, atol=1e-7)
    assert_allclose(jax.grad(loss_j)(A_j), g_ref.detach().numpy(),
                    rtol=1e-6, atol=1e-7)


# ------------------------------------------------------------------ linalg

SOLVE_METHODS = ["exactsolve", "cg", "bicgstab", "gmres", "scipy_gmres"]


def _spd(n, seed):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, n))
    return (w @ w.T / n + np.eye(n)).astype(np.float64)


@pytest.mark.parametrize("method", SOLVE_METHODS)
def test_solve_matrix(method):
    from xitorch.linalg import solve as solve_ref

    a_np = _spd(4, 0)
    # the reference's scipy bridge requires one explicit batch dim
    # (/root/reference/xitorch/_impls/linalg/solve.py:36)
    bshape = (1, 4, 2) if method == "scipy_gmres" else (4, 2)
    b_np = np.asarray(
        np.random.default_rng(1).standard_normal((4, 2))).reshape(bshape)
    opts = {} if method in ("exactsolve", "scipy_gmres") \
        else {"rtol": 1e-12, "atol": 1e-13}

    def loss_j(a, b):
        x = solve_tpu(LinOpTPU.m(a, is_hermitian=True), b, method=method,
                      **opts)
        return jnp.sum(x ** 2)

    a_j, b_j = jnp.asarray(a_np), jnp.asarray(b_np)
    x_j = solve_tpu(LinOpTPU.m(a_j, is_hermitian=True), b_j, method=method,
                    **opts)
    g_j = jax.grad(loss_j, argnums=(0, 1))(a_j, b_j)

    if method == "gmres":
        # The reference's own gmres cannot be pinned at 1e-6: its solution
        # reconstruction drops the last Krylov direction (`for i in
        # range(k)` over q[0..k-1] after the Arnoldi loop,
        # /root/reference/xitorch/_impls/linalg/solve.py:396-410), so on a
        # 4x4 it is structurally truncated to a 3-dim Krylov space
        # (measured ~4e-2 rel error at rtol=1e-12).  Pin our gmres against
        # the f64 direct oracle and the exact implicit-diff gradients
        # instead.
        x_star = np.linalg.solve(a_np, b_np)
        assert_allclose(x_j, x_star, **RT)
        g_star = jax.grad(
            lambda a, b: jnp.sum(solve_tpu(LinOpTPU.m(a, is_hermitian=True),
                                           b, method="exactsolve") ** 2),
            argnums=(0, 1))(a_j, b_j)
        assert_allclose(g_j[0], g_star[0], **RT)
        assert_allclose(g_j[1], g_star[1], **RT)
        return

    a_t = torch.tensor(a_np, requires_grad=True)
    b_t = torch.tensor(b_np, requires_grad=True)
    try:
        x_ref = solve_ref(
            xitorch_ref.LinearOperator.m(a_t, is_hermitian=True),
            b_t, method=method, **opts)
    except TypeError:
        # the reference's scipy bridge passes the pre-1.12 `tol=` kwarg
        # (/root/reference/xitorch/_impls/linalg/solve.py:57), which the
        # installed scipy removed — the reference cell cannot run here;
        # pin ours against the f64 direct oracle instead
        assert method == "scipy_gmres"
        assert_allclose(x_j, np.linalg.solve(a_np, b_np[0])[None], **RT)
        return
    loss_ref = (x_ref ** 2).sum()
    g_ref = torch.autograd.grad(loss_ref, (a_t, b_t),
                                create_graph=(method == "exactsolve"))
    if method == "exactsolve":
        gg_ref, = torch.autograd.grad(g_ref[0].sum(), (a_t,))

    assert_allclose(x_j, x_ref.detach().numpy(), **RT)
    assert_allclose(g_j[0], g_ref[0].detach().numpy(), **RT)
    assert_allclose(g_j[1], g_ref[1].detach().numpy(), **RT)
    if method == "exactsolve":
        gg_j = jax.grad(
            lambda a: jnp.sum(jax.grad(loss_j, argnums=0)(a, b_j)))(a_j)
        assert_allclose(gg_j, gg_ref.detach().numpy(), rtol=1e-6, atol=1e-8)


SYMEIG_METHODS = ["exacteig", "custom_exacteig", "davidson"]


@pytest.mark.parametrize("method", SYMEIG_METHODS)
def test_symeig_matrix(method):
    from xitorch.linalg import symeig as symeig_ref

    a_np = _spd(6, 3)
    neig = 2 if method == "davidson" else 6
    opts = {"min_eps": 1e-11, "max_niter": 10000} if method == "davidson" \
        else {}

    a_t = torch.tensor(a_np, requires_grad=True)
    val_ref, vec_ref = symeig_ref(
        xitorch_ref.LinearOperator.m(a_t, is_hermitian=True), neig=neig,
        method=method, **opts)
    loss_ref = (val_ref ** 2).sum() + (vec_ref ** 4).sum()
    g_ref, = torch.autograd.grad(loss_ref, (a_t,),
                                 create_graph=(method != "davidson"))
    if method != "davidson":
        gg_ref, = torch.autograd.grad(g_ref.sum(), (a_t,))

    def loss_j(a):
        val, vec = symeig_tpu(LinOpTPU.m(a, is_hermitian=True), neig=neig,
                              method=method, **opts)
        return jnp.sum(val ** 2) + jnp.sum(vec ** 4)

    a_j = jnp.asarray(a_np)
    val_j, vec_j = symeig_tpu(LinOpTPU.m(a_j, is_hermitian=True), neig=neig,
                              method=method, **opts)
    assert_allclose(val_j, val_ref.detach().numpy(), **RT)
    # eigenvector sign is arbitrary on both sides; compare |v|
    assert_allclose(jnp.abs(vec_j), np.abs(vec_ref.detach().numpy()),
                    rtol=1e-6, atol=1e-7)
    # The operator is constrained hermitian, so the gradient of an
    # eigenVECTOR-dependent loss is only defined up to the symmetrization
    # convention: torch returns the symmetrized gradient, ours the raw
    # one; both produce identical directional derivatives for symmetric
    # perturbations dA_ij = dA_ji (verified against a symmetric-FD oracle
    # to 2e-8 this session) and agree to 6e-14 after symmetrization.
    def _sym(g):
        g = np.asarray(g)
        return (g + g.T) / 2

    assert_allclose(_sym(jax.grad(loss_j)(a_j)),
                    _sym(g_ref.detach().numpy()), rtol=1e-6, atol=1e-7)
    if method != "davidson":
        # sum(g) is symmetrization-invariant, so the inner gradgrad scalar
        # matches; the outer gradient needs the same symmetrization
        gg_j = jax.grad(lambda a: jnp.sum(jax.grad(loss_j)(a)))(a_j)
        assert_allclose(_sym(gg_j), _sym(gg_ref.detach().numpy()),
                        rtol=1e-6, atol=1e-7)


# --------------------------------------------------------------- integrate

IVP_METHODS = ["euler", "rk4", "rk38", "rk23", "rk45"]


@pytest.mark.parametrize("method", IVP_METHODS)
def test_solve_ivp_matrix(method):
    from xitorch.integrate import solve_ivp as ivp_ref

    ts_np = np.linspace(0.0, 1.5, 7)
    a_val = 1.3
    # fixed-step methods integrate the ts grid identically; adaptive
    # methods are pinned by tight rtol/atol so both land within 1e-7 of
    # the exact flow
    opts = {} if method in ("euler", "rk4", "rk38") \
        else {"rtol": 1e-10, "atol": 1e-12}

    def fcn_t(t, y, a):
        return -a * y + torch.sin(t)

    def fcn_j(t, y, a):
        return -a * y + jnp.sin(t)

    a_t = torch.tensor(a_val, dtype=torch.float64, requires_grad=True)
    y0_t = torch.tensor([[1.0]], dtype=torch.float64, requires_grad=True)
    ts_t = torch.tensor(ts_np)
    yt_ref = ivp_ref(fcn_t, ts_t, y0_t, params=(a_t,), method=method,
                     **opts)
    g_ref = torch.autograd.grad((yt_ref ** 2).sum(), (a_t, y0_t))

    def loss_j(a, y0):
        yt = ivp_tpu(fcn_j, jnp.asarray(ts_np), y0, params=(a,),
                     method=method, **opts)
        return jnp.sum(yt ** 2)

    a_j = jnp.asarray(a_val)
    y0_j = jnp.asarray([[1.0]])
    yt_j = ivp_tpu(fcn_j, jnp.asarray(ts_np), y0_j, params=(a_j,),
                   method=method, **opts)
    tol = RT if method in ("euler", "rk4", "rk38") \
        else dict(rtol=1e-6, atol=1e-7)
    assert_allclose(yt_j, yt_ref.detach().numpy(), **tol)
    g_j = jax.grad(loss_j, argnums=(0, 1))(a_j, y0_j)
    if method in ("euler", "rk4", "rk38"):
        # Gradient METHODS differ by design: the reference always solves a
        # continuous adjoint ODE discretized with the same stepper
        # (/root/reference/xitorch/integrate/solve_ivp.py:129), so its
        # gradient carries O(h^p) truncation error relative to the exact
        # gradient of the discrete trajectory BOTH sides return (measured
        # 0.18 rel for euler, 4.3e-4 for rk4 on this grid); ours
        # differentiates the discrete steps exactly.  Pin ours against the
        # symmetric-FD oracle of the discrete loss (exactness), and against
        # torch only at the adjoint's truncation order.
        h = 1e-6
        fd_a = (float(loss_j(a_j + h, y0_j))
                - float(loss_j(a_j - h, y0_j))) / (2 * h)
        fd_y = (float(loss_j(a_j, y0_j + h))
                - float(loss_j(a_j, y0_j - h))) / (2 * h)
        assert_allclose(g_j[0], fd_a, rtol=1e-7, atol=1e-9)
        assert_allclose(np.asarray(g_j[1]).ravel()[0], fd_y,
                        rtol=1e-7, atol=1e-9)
        trunc_rtol = 0.25 if method == "euler" else 2e-3
        assert_allclose(g_j[0], g_ref[0].detach().numpy(),
                        rtol=trunc_rtol, atol=1e-9)
        assert_allclose(g_j[1], g_ref[1].detach().numpy(),
                        rtol=trunc_rtol, atol=1e-9)
    else:
        assert_allclose(g_j[0], g_ref[0].detach().numpy(), **tol)
        assert_allclose(g_j[1], g_ref[1].detach().numpy(), **tol)


@pytest.mark.parametrize("n", [16, 64, 100])
def test_quad_matrix(n):
    from xitorch.integrate import quad as quad_ref

    def fcn_t(x, a):
        return torch.exp(-a * x ** 2) * torch.cos(x)

    def fcn_j(x, a):
        return jnp.exp(-a * x ** 2) * jnp.cos(x)

    a_t = torch.tensor(0.7, dtype=torch.float64, requires_grad=True)
    val_ref = quad_ref(fcn_t, torch.tensor(-1.0, dtype=torch.float64),
                       torch.tensor(2.0, dtype=torch.float64),
                       params=(a_t,), method="leggauss", n=n)
    g_ref, = torch.autograd.grad(val_ref.sum(), (a_t,))

    def loss_j(a):
        return jnp.sum(quad_tpu(fcn_j, -1.0, 2.0, params=(a,),
                                method="leggauss", n=n))

    a_j = jnp.asarray(0.7)
    assert_allclose(loss_j(a_j), val_ref.detach().numpy().sum(), **RT)
    assert_allclose(jax.grad(loss_j)(a_j), g_ref.detach().numpy(), **RT)


def test_mcquad_dummy1d_matrix():
    # dummy1d is DETERMINISTIC (leggauss nodes on the atan-compactified
    # axis: /root/reference/xitorch/_impls/integrate/mcsamples/mcmc.py:100),
    # so exact parity applies; mh/mhcustom draw different RNG streams by
    # construction and are covered statistically in test_mcquad.py
    from xitorch.integrate import mcquad as mcquad_ref

    w_t = torch.tensor(1.1, dtype=torch.float64, requires_grad=True)

    def logp_t(x, w):
        return -0.5 * (x / w) ** 2

    def f_t(x, w):
        # must genuinely depend on w: the reference's backward autograds
        # the re-integrated ffcn wrt fparams without allow_unused
        return w * x * x

    # the reference registers the deterministic sampler under "_dummy1d"
    # (/root/reference/xitorch/integrate/mcquad.py:119); we register both
    # spellings — use the shared one for the parity cell
    val_ref = mcquad_ref(f_t, logp_t,
                         torch.tensor(0.3, dtype=torch.float64),
                         fparams=(w_t,), pparams=(w_t,), method="_dummy1d",
                         nsamples=400)
    g_ref, = torch.autograd.grad(val_ref, (w_t,))

    def logp_j(x, w):
        return -0.5 * (x / w) ** 2

    def f_j(x, w):
        return w * x * x

    def loss_j(w):
        return mcquad_tpu(f_j, logp_j, jnp.asarray(0.3), fparams=(w,),
                          pparams=(w,), method="_dummy1d", nsamples=400)

    w_j = jnp.asarray(1.1)
    assert_allclose(loss_j(w_j), val_ref.detach().numpy(), **RT)
    assert_allclose(jax.grad(loss_j)(w_j), g_ref.detach().numpy(), **RT)


@pytest.mark.parametrize("op", ["integrate", "cumsum"])
def test_squad_matrix(op):
    from xitorch.integrate import SQuad as SQuadRef

    x_np = np.sort(np.random.default_rng(5).uniform(0, 3, 25))
    y_np = np.sin(x_np) * np.exp(-0.3 * x_np)

    y_t = torch.tensor(y_np, requires_grad=True)
    sq_ref = SQuadRef(torch.tensor(x_np))
    out_ref = getattr(sq_ref, op)(y_t, dim=-1)
    g_ref, = torch.autograd.grad(out_ref.sum(), (y_t,))

    def loss_j(y):
        return jnp.sum(getattr(SQuadTPU(jnp.asarray(x_np)), op)(y, dim=-1))

    y_j = jnp.asarray(y_np)
    out_j = getattr(SQuadTPU(jnp.asarray(x_np)), op)(y_j, dim=-1)
    assert_allclose(out_j, out_ref.detach().numpy(), **RT)
    assert_allclose(jax.grad(loss_j)(y_j), g_ref.detach().numpy(), **RT)


# -------------------------------------------------------------- interpolate

INTERP_CASES = [("cspline", "natural"), ("cspline", "clamped"),
                ("cspline", "not-a-knot"), ("cspline", "periodic"),
                ("linear", None)]


@pytest.mark.parametrize("method,bc", INTERP_CASES)
def test_interp1d_matrix(method, bc):
    from xitorch.interpolate import Interp1D as InterpRef

    rng = np.random.default_rng(6)
    x_np = np.sort(rng.uniform(0, 2, 20))
    y_np = np.cos(2 * x_np) + 0.1 * rng.standard_normal(20)
    if bc == "periodic":
        y_np[-1] = y_np[0]
    xq_np = np.linspace(x_np[0], x_np[-1], 37)
    kw = {"bc_type": bc} if bc else {}

    y_t = torch.tensor(y_np, requires_grad=True)
    out_ref = InterpRef(torch.tensor(x_np), y_t, method=method,
                        **kw)(torch.tensor(xq_np))
    g_ref, = torch.autograd.grad(out_ref.sum(), (y_t,))

    def loss_j(y):
        return jnp.sum(InterpTPU(jnp.asarray(x_np), y, method=method,
                                 **kw)(jnp.asarray(xq_np)))

    y_j = jnp.asarray(y_np)
    out_j = InterpTPU(jnp.asarray(x_np), y_j, method=method,
                      **kw)(jnp.asarray(xq_np))
    assert_allclose(out_j, out_ref.detach().numpy(), **RT)
    assert_allclose(jax.grad(loss_j)(y_j), g_ref.detach().numpy(), **RT)


# ------------------------------------------- degeneracy + complex cells
# (VERDICT r4 item 5: the reference's hardest test surface — degenerate
# eigenvalue gradients (_tests/test_linop_fcns.py:182-348) and complex
# dtypes — pinned against live torch at f64/c128.)

DEGEN_METHODS = ["exacteig", "custom_exacteig"]


@pytest.mark.parametrize("withM", [False, True])
@pytest.mark.parametrize("method", DEGEN_METHODS)
def test_symeig_degenerate_grad_matrix(method, withM):
    """Reference test_symeig_A_degenerate / _AM_degenerate pattern: an
    EXACTLY degenerate spectrum [1, 2, 2, 3, 3] and a loss invariant
    under rotations inside the degenerate subspaces — the gradient is
    then well-defined and the two implementations' degenerate-grad
    conventions must agree in VALUE (not just pass their own FD
    checks)."""
    from xitorch.linalg import symeig as symeig_ref

    n, neig = 5, 3
    rng = np.random.default_rng(42)
    mat_np = rng.standard_normal((n, n))
    matM_np = rng.uniform(size=(n, n))
    P2_np = rng.standard_normal((n, n))
    a_np = np.asarray([1.0, 2.0, 3.0])

    def build_ref(a, mat, matM, P2):
        P, _ = torch.linalg.qr(mat)
        b = torch.cat((a[:2], a[1:2], a[2:], a[2:]))
        A = P.T @ torch.diag_embed(b) @ P
        Al = xitorch_ref.LinearOperator.m(A, is_hermitian=True)
        kw = {}
        if withM:
            PM, _ = torch.linalg.qr(matM)
            M = PM.T @ PM
            kw["M"] = xitorch_ref.LinearOperator.m(M, is_hermitian=True)
        eivals, eivecs = symeig_ref(Al, neig=neig, method=method,
                                    bck_options={"method": "exactsolve"},
                                    **kw)
        U = eivecs[:, 1:3]
        return torch.einsum("rc,rc->", P2 @ U, U) + (eivals ** 2).sum()

    a_t = torch.tensor(a_np, requires_grad=True)
    mat_t = torch.tensor(mat_np, requires_grad=True)
    matM_t = torch.tensor(matM_np, requires_grad=True)
    P2_t = torch.tensor(P2_np, requires_grad=True)
    loss_ref = build_ref(a_t, mat_t, matM_t, P2_t)
    g_ref = torch.autograd.grad(loss_ref, (a_t, mat_t, P2_t),
                                create_graph=True)
    gg_ref, = torch.autograd.grad(
        (g_ref[0] ** 2).sum() + (g_ref[1] ** 2).sum(), (mat_t,))

    def loss_j(a, mat, matM, P2):
        P, _ = jnp.linalg.qr(mat)
        b = jnp.concatenate((a[:2], a[1:2], a[2:], a[2:]))
        A = P.T @ (b[:, None] * P)
        Al = LinOpTPU.m(A, is_hermitian=True)
        kw = {}
        if withM:
            PM, _ = jnp.linalg.qr(matM)
            kw["M"] = LinOpTPU.m(PM.T @ PM, is_hermitian=True)
        eivals, eivecs = symeig_tpu(Al, neig=neig, method=method,
                                    bck_options={"method": "exactsolve"},
                                    **kw)
        U = eivecs[:, 1:3]
        return jnp.einsum("rc,rc->", P2 @ U, U) + jnp.sum(eivals ** 2)

    args = (jnp.asarray(a_np), jnp.asarray(mat_np), jnp.asarray(matM_np),
            jnp.asarray(P2_np))
    assert_allclose(loss_j(*args), loss_ref.detach().numpy(), **RT)
    g_j = jax.grad(loss_j, argnums=(0, 1, 3))(*args)
    for ours, ref in zip(g_j, g_ref):
        assert_allclose(ours, ref.detach().numpy(), rtol=1e-6, atol=1e-8)
    gg_j = jax.grad(lambda m: sum(
        jnp.sum(g ** 2) for g in jax.grad(
            loss_j, argnums=(0, 1))(args[0], m, args[2], args[3])
    ))(args[1])
    assert_allclose(gg_j, gg_ref.detach().numpy(), rtol=1e-6, atol=1e-7)


def _herm_c(ar, ai, xp):
    """Hermitian matrix from real parameter planes (both frameworks)."""
    A = ar + 1j * ai
    return (A + xp.swapaxes(A, -1, -2).conj() if xp is jnp
            else A + A.transpose(-2, -1).conj()) * 0.5


@pytest.mark.parametrize("method", ["exactsolve", "cg", "gmres"])
def test_solve_complex_matrix(method):
    """c128 solve cells: values + gradients wrt the REAL AND IMAGINARY
    parameter planes (convention-free across autodiff systems) pinned
    against live torch.  Reference complex handling:
    xitorch/linalg/solve.py + _tests include_complex cells."""
    from xitorch.linalg import solve as solve_ref

    n, nc = 6, 2
    rng = np.random.default_rng(7)
    ar_np = rng.standard_normal((n, n)) + np.eye(n) * n
    ai_np = rng.standard_normal((n, n))
    br_np = rng.standard_normal((n, nc))
    bi_np = rng.standard_normal((n, nc))
    opts = {} if method == "exactsolve" else \
        {"rtol": 1e-12, "atol": 1e-14, "max_niter": 3000}

    def loss_ref(ar, ai, br, bi):
        A = _herm_c(ar, ai, torch)
        x = solve_ref(xitorch_ref.LinearOperator.m(A, is_hermitian=True),
                      (br + 1j * bi).to(A.dtype), method=method, **opts)
        return (x * x.conj()).real.sum()

    import warnings as _w

    ts = [torch.tensor(v, requires_grad=True)
          for v in (ar_np, ai_np, br_np, bi_np)]
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        lref = loss_ref(*ts)
        g_ref = torch.autograd.grad(lref, ts)

    def loss_j(ar, ai, br, bi):
        A = _herm_c(ar, ai, jnp)
        x = solve_tpu(LinOpTPU.m(A, is_hermitian=True),
                      (br + 1j * bi).astype(A.dtype), method=method,
                      **opts)
        return jnp.sum(jnp.real(x * x.conj()))

    args = tuple(jnp.asarray(v) for v in (ar_np, ai_np, br_np, bi_np))

    # DOCUMENTED DEVIATION: the reference's scipy-ported gmres stalls at
    # ~9e-3 residual on this well-conditioned c128 hermitian system
    # (ConvergenceWarning after 3000 iters this session), so its value
    # and grads are not a usable oracle for that one cell; ours solves
    # it to ~7e-16 and is pinned against the direct f64 oracle instead.
    A_c = (ar_np + 1j * ai_np)
    A_c = (A_c + A_c.conj().T) / 2
    x_direct = np.linalg.solve(A_c, br_np + 1j * bi_np)
    l_direct = float(np.sum((x_direct * x_direct.conj()).real))
    ref_ok = abs(float(lref.detach()) - l_direct) <= 1e-6 * abs(l_direct)
    if ref_ok:
        assert_allclose(loss_j(*args), lref.detach().numpy(), **RT)
        g_j = jax.grad(loss_j, argnums=(0, 1, 2, 3))(*args)
        for ours, ref in zip(g_j, g_ref):
            assert_allclose(ours, ref.detach().numpy(), rtol=1e-6,
                            atol=1e-8)
    else:
        assert method == "gmres", \
            "only the reference gmres cell is known to stall"
        assert_allclose(loss_j(*args), l_direct, **RT)
        # grads vs the exactsolve route (itself torch-pinned above)
        def loss_direct(ar, ai, br, bi):
            A = _herm_c(ar, ai, jnp)
            x = solve_tpu(LinOpTPU.m(A, is_hermitian=True),
                          (br + 1j * bi).astype(A.dtype),
                          method="exactsolve")
            return jnp.sum(jnp.real(x * x.conj()))
        g_j = jax.grad(loss_j, argnums=(0, 1, 2, 3))(*args)
        g_o = jax.grad(loss_direct, argnums=(0, 1, 2, 3))(*args)
        for ours, oracle in zip(g_j, g_o):
            assert_allclose(ours, oracle, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("method", ["exacteig", "davidson"])
def test_symeig_complex_matrix(method):
    """c128 symeig cells: values + gauge-invariant eigenvector-loss
    gradients wrt real/imag planes vs live torch, + gradgrad on the
    dense route.  Reference: symeig complex offset
    xitorch/linalg/symeig.py:360-363."""
    from xitorch.linalg import symeig as symeig_ref

    n, neig = 6, 2
    rng = np.random.default_rng(11)
    ar_np = rng.standard_normal((n, n))
    ai_np = rng.standard_normal((n, n))
    p2 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    P2_np = (p2 + p2.conj().T) / 2
    opts = {"min_eps": 1e-12, "max_niter": 10000} if method == "davidson" \
        else {}

    def loss_ref(ar, ai):
        A = _herm_c(ar, ai, torch)
        val, vec = symeig_ref(
            xitorch_ref.LinearOperator.m(A, is_hermitian=True),
            neig=neig, method=method,
            bck_options={"method": "exactsolve"}, **opts)
        quad = torch.einsum("ri,rc,ci->", vec.conj(),
                            torch.tensor(P2_np), vec)
        return (val ** 2).sum() + quad.real

    def loss_j(ar, ai, m=None):
        A = _herm_c(ar, ai, jnp)
        val, vec = symeig_tpu(LinOpTPU.m(A, is_hermitian=True),
                              neig=neig, method=(m or method),
                              bck_options={"method": "exactsolve"}, **opts)
        quad = jnp.einsum("ri,rc,ci->", vec.conj(), jnp.asarray(P2_np),
                          vec)
        return jnp.sum(val ** 2) + jnp.real(quad)

    args = (jnp.asarray(ar_np), jnp.asarray(ai_np))
    if method == "davidson":
        # DOCUMENTED DEVIATION: the reference's davidson CRASHES on
        # complex input — its tallqr Gram is V^T M V without conj
        # (/root/reference/xitorch/_utils/tensor.py:15-16), which is not
        # hermitian-PSD for complex V, so torch.linalg.cholesky raises.
        # Ours fixes the conj (utils/tensor.tallqr) and is pinned here
        # against our exacteig route (itself torch-pinned below).
        with pytest.raises(Exception, match="positive-definite"):
            ts = [torch.tensor(v, requires_grad=True)
                  for v in (ar_np, ai_np)]
            loss_ref(*ts)
        assert_allclose(loss_j(*args),
                        loss_j(*args, m="exacteig"), **RT)
        g_j = jax.grad(loss_j, argnums=(0, 1))(*args)
        g_o = jax.grad(lambda x, y: loss_j(x, y, m="exacteig"),
                       argnums=(0, 1))(*args)
        for ours, oracle in zip(g_j, g_o):
            assert_allclose(ours, oracle, rtol=1e-6, atol=1e-7)
        return

    ts = [torch.tensor(v, requires_grad=True) for v in (ar_np, ai_np)]
    lref = loss_ref(*ts)
    g_ref = torch.autograd.grad(lref, ts, create_graph=True)
    gg_ref, = torch.autograd.grad((g_ref[0] ** 2).sum(), (ts[0],))
    assert_allclose(loss_j(*args), lref.detach().numpy(), **RT)
    g_j = jax.grad(loss_j, argnums=(0, 1))(*args)
    for ours, ref in zip(g_j, g_ref):
        assert_allclose(ours, ref.detach().numpy(), rtol=1e-6, atol=1e-8)
    gg_j = jax.grad(lambda x: jnp.sum(
        jax.grad(loss_j, argnums=0)(x, args[1]) ** 2))(args[0])
    assert_allclose(gg_j, gg_ref.detach().numpy(), rtol=1e-6,
                    atol=1e-7)


def test_svd_complex_matrix():
    """c128 svd cell: ascending singular values + a gauge-invariant
    U-loss gradient vs live torch (reference svd: symeig.py:146-250;
    ours takes the native complex degen_svd route)."""
    from xitorch.linalg import svd as svd_ref

    m, n, k = 7, 5, 5
    rng = np.random.default_rng(13)
    ar_np = rng.standard_normal((m, n))
    ai_np = rng.standard_normal((m, n))
    p2 = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    P2_np = (p2 + p2.conj().T) / 2
    w = 1.0 + 0.1 * np.arange(k)

    def loss_ref(ar, ai):
        A = (ar + 1j * ai)
        u, s, vh = svd_ref(xitorch_ref.LinearOperator.m(A), k=k)
        quad = torch.einsum("ri,rc,ci->", u.conj(), torch.tensor(P2_np), u)
        return (s * torch.tensor(w)).sum() + quad.real

    ts = [torch.tensor(v, requires_grad=True) for v in (ar_np, ai_np)]
    lref = loss_ref(*ts)
    g_ref = torch.autograd.grad(lref, ts)

    def loss_j(ar, ai):
        u, s, vh = __import__("xitorch_tpu").linalg.svd(
            LinOpTPU.m(ar + 1j * ai), k=k)
        quad = jnp.einsum("ri,rc,ci->", u.conj(), jnp.asarray(P2_np), u)
        return jnp.sum(s * jnp.asarray(w)) + jnp.real(quad)

    args = (jnp.asarray(ar_np), jnp.asarray(ai_np))
    assert_allclose(loss_j(*args), lref.detach().numpy(), **RT)
    g_j = jax.grad(loss_j, argnums=(0, 1))(*args)
    for ours, ref in zip(g_j, g_ref):
        assert_allclose(ours, ref.detach().numpy(), rtol=1e-6, atol=1e-8)
