"""rootfinder/equilibrium/minimize tests (model: reference
xitorch/_tests/test_optimize.py).  The tanh rootfinder is BASELINE config 1:
forward + 1st + 2nd order gradients must match the dense implicit solution.
"""
import jax
import jax.numpy as jnp
import pytest

from xitorch_tpu.optimize import rootfinder, equilibrium, minimize
from tests.utils import assert_allclose, gradcheck2


def tanh_fcn(y, A):
    # the README example of the reference (README.md:16-33)
    return jnp.tanh(A @ y + 0.1) + y / 2.0


A0 = jnp.asarray([[1.1, 0.4], [0.3, 0.8]])
y0_2x1 = jnp.zeros((2, 1))


@pytest.mark.parametrize("method", ["broyden1", "broyden2", "newton", "linearmixing"])
def test_rootfinder_methods(method):
    opts = {"f_tol": 1e-12, "maxiter": 5000}
    # linearmixing default alpha=-1.0 gives the converging x <- x - f step
    yroot = rootfinder(tanh_fcn, y0_2x1, params=(A0,), method=method, **opts)
    assert_allclose(tanh_fcn(yroot, A0), jnp.zeros_like(yroot), atol=1e-7,
                    msg="residual not zero for %s" % method)


def test_rootfinder_readme_values():
    yroot = rootfinder(tanh_fcn, y0_2x1, params=(A0,), f_tol=1e-12)
    # reference README value: [[-0.0459], [-0.0663]]
    assert_allclose(yroot, jnp.asarray([[-0.04593078], [-0.06633125]]), atol=1e-4)


def _implicit_dense_root(A):
    """Oracle: solve the same root with plain Newton via jax.scipy-free dense
    iteration, differentiable through lax.custom_root-free manual IFT is
    avoided — instead iterate to convergence with unrolled fixed steps so
    plain autodiff gives the true implicit gradient."""
    y = jnp.zeros((2, 1), dtype=A.dtype)
    for _ in range(60):
        f = tanh_fcn(y, A)
        J = jax.jacobian(lambda yy: tanh_fcn(yy.reshape(2, 1), A).reshape(-1))(y.reshape(-1))
        y = y - jnp.linalg.solve(J, f.reshape(-1, 1)).reshape(2, 1)
    return y


def test_rootfinder_grad_1st_2nd():
    def via_rf(A):
        y = rootfinder(tanh_fcn, y0_2x1, params=(A,), f_tol=1e-13, maxiter=10000)
        return jnp.sum(y ** 2)

    def via_dense(A):
        y = _implicit_dense_root(A)
        return jnp.sum(y ** 2)

    assert_allclose(via_rf(A0), via_dense(A0), rtol=1e-8)
    g1 = jax.grad(via_rf)(A0)
    g2 = jax.grad(via_dense)(A0)
    assert_allclose(g1, g2, rtol=1e-6, atol=1e-9)

    h1 = jax.hessian(via_rf)(A0)
    h2 = jax.hessian(via_dense)(A0)
    assert_allclose(h1, h2, rtol=1e-4, atol=1e-7)


def test_rootfinder_gradcheck_fd():
    def f(A):
        return rootfinder(tanh_fcn, y0_2x1, params=(A,), f_tol=1e-13, maxiter=10000)

    gradcheck2(f, (A0,), order=2, atol=2e-4, rtol=2e-3, eps=1e-5)


def test_rootfinder_closure_state():
    """Hidden state captured in the fcn closure must receive gradients
    (the closure_convert path — PureFunction parity)."""
    def via_closure(A):
        fcn = lambda y: tanh_fcn(y, A)  # A hidden in closure
        return jnp.sum(rootfinder(fcn, y0_2x1, f_tol=1e-13, maxiter=10000) ** 2)

    def via_params(A):
        return jnp.sum(rootfinder(tanh_fcn, y0_2x1, params=(A,),
                                  f_tol=1e-13, maxiter=10000) ** 2)

    assert_allclose(jax.grad(via_closure)(A0), jax.grad(via_params)(A0), rtol=1e-7)


def test_equilibrium_broyden():
    def fcn(y, A):
        return jnp.tanh(A @ y + 0.1) + y / 2.0

    yeq = equilibrium(fcn, y0_2x1, params=(A0,), method="broyden1",
                      f_tol=1e-11, maxiter=2000)
    assert_allclose(fcn(yeq, A0), yeq, atol=1e-6)
    # reference README value for equilibrium: [[0.2313], [-0.5957]]
    assert_allclose(yeq, jnp.asarray([[0.23134409], [-0.59570324]]), atol=1e-3)


def contractive_fcn(y, A):
    return 0.5 * jnp.tanh(A @ y) + 0.2


@pytest.mark.parametrize("method", ["broyden1", "anderson_acc", "linearmixing"])
def test_equilibrium_methods(method):
    yeq = equilibrium(contractive_fcn, y0_2x1, params=(A0,), method=method,
                      f_tol=1e-11, x_tol=1e-11, maxiter=5000)
    assert_allclose(contractive_fcn(yeq, A0), yeq, atol=1e-6,
                    msg="fixed point not reached for %s" % method)


def test_equilibrium_grad():
    def loss(A, method):
        y = equilibrium(contractive_fcn, y0_2x1, params=(A,), method=method,
                        f_tol=1e-13, x_tol=1e-13, maxiter=5000)
        return jnp.sum(y ** 2)

    g_b = jax.grad(lambda A: loss(A, "broyden1"))(A0)
    g_a = jax.grad(lambda A: loss(A, "anderson_acc"))(A0)
    assert_allclose(g_b, g_a, rtol=1e-4, atol=1e-7)
    gradcheck2(lambda A: loss(A, "broyden1"), (A0,), order=2, atol=2e-4, rtol=2e-3,
               eps=1e-5)


@pytest.mark.parametrize("method", ["broyden1", "gd", "adam", "lbfgs"])
def test_minimize(method):
    def fcn(y, A):
        Ay = A @ y
        return jnp.sum(Ay ** 2) + jnp.sum(y ** 4) + jnp.sum(y) / 2.0

    opts = {"maxiter": 20000}
    if method in ("gd", "adam"):
        opts.update({"step": 2e-2, "f_rtol": 1e-14, "x_rtol": 1e-12})
    elif method == "lbfgs":
        opts.update({"f_rtol": 1e-15, "x_rtol": 1e-13, "gtol": 1e-10})
    else:
        opts.update({"f_tol": 1e-12})
    ymin = minimize(fcn, jnp.zeros((2, 1)), params=(A0,), method=method, **opts)
    g = jax.grad(lambda y: fcn(y, A0))(ymin)
    assert_allclose(g, jnp.zeros_like(g), atol=5e-4,
                    msg="stationarity failed for %s" % method)


def test_minimize_grad():
    def fcn(y, A):
        Ay = A @ y
        return jnp.sum(Ay ** 2) + jnp.sum(y ** 4) + jnp.sum(y) / 2.0

    def loss(A):
        y = minimize(fcn, jnp.zeros((2, 1)), params=(A,), method="broyden1",
                     f_tol=1e-13, maxiter=10000)
        return jnp.sum((y - 1.0) ** 2)

    gradcheck2(loss, (A0,), order=2, atol=2e-4, rtol=2e-3, eps=1e-5)


def test_minimize_lbfgs_rosenbrock_and_grads():
    # curvature-exploiting method: Rosenbrock from the classic start in
    # O(50) iterations (adam needs ~10k), plus 2nd-order implicit grads
    def rosen(y, a, b):
        return (a - y[0]) ** 2 + b * (y[1] - y[0] ** 2) ** 2

    a, b = jnp.asarray(1.0), jnp.asarray(100.0)
    y0 = jnp.asarray([-1.2, 1.0])
    y, info = minimize(rosen, y0, params=(a, b), method="lbfgs",
                       maxiter=200, return_info=True)
    assert_allclose(y, jnp.ones(2), atol=1e-5)
    assert float(info["converged"]) == 1.0
    assert float(info["iterations"]) < 120

    def quad(y, A, bb):
        return 0.5 * jnp.sum(y * (A @ y)) - jnp.sum(bb * y)

    M = jax.random.normal(jax.random.PRNGKey(0), (6, 6))
    A = M @ M.T + 6 * jnp.eye(6)
    bb = jax.random.normal(jax.random.PRNGKey(1), (6,))

    def loss(bb):
        y = minimize(quad, jnp.zeros(6), params=(A, bb), method="lbfgs",
                     f_rtol=1e-15, x_rtol=1e-14, gtol=1e-12)
        return jnp.sum((y - 0.3) ** 2)

    gradcheck2(loss, (bb,), order=2, atol=2e-4, rtol=2e-3, eps=1e-5)


def test_rootfinder_jit_vmap():
    @jax.jit
    def froot(A):
        return rootfinder(tanh_fcn, y0_2x1, params=(A,), f_tol=1e-12, maxiter=5000)

    assert_allclose(tanh_fcn(froot(A0), A0), jnp.zeros((2, 1)), atol=1e-7)

    As = jnp.stack([A0, A0 * 0.9, A0 * 1.1])
    ys = jax.vmap(froot)(As)
    res = jax.vmap(tanh_fcn)(ys, As)
    assert_allclose(res, jnp.zeros_like(res), atol=1e-7)


def test_rootfinder_complex():
    """Complex-root support via real packing (reference rootsolver.py:54-68)."""
    def fcn(y, c):
        return y ** 2 - c

    c = jnp.asarray(0.5 + 0.8j)
    y0 = jnp.asarray(1.0 + 1.0j)
    y = rootfinder(fcn, y0, params=(c,), method="broyden1", f_tol=1e-12)
    assert_allclose(y ** 2, c, atol=1e-7)


def test_return_info():
    """jit-safe (solution, info) convention (SURVEY §5): converged flag,
    iteration count, best residual norm — with zero tangents."""
    y, info = rootfinder(tanh_fcn, y0_2x1, params=(A0,), method="broyden1",
                         f_tol=1e-12, return_info=True)
    assert float(info["converged"]) == 1.0
    assert float(info["iterations"]) > 0
    assert float(info["best_fnorm"]) < 1e-10
    assert_allclose(tanh_fcn(y, A0), jnp.zeros_like(y), atol=1e-9)

    # non-convergence flagged, best iterate returned
    _, info2 = rootfinder(tanh_fcn, y0_2x1, params=(A0,), method="broyden1",
                          f_tol=1e-12, maxiter=2, return_info=True)
    assert float(info2["converged"]) == 0.0

    # gradients flow through y, info gets zero tangents
    def loss(A):
        y, info = rootfinder(tanh_fcn, y0_2x1, params=(A,), f_tol=1e-13,
                             maxiter=10000, return_info=True)
        return jnp.sum(y ** 2) + 0.0 * info["best_fnorm"]

    g = jax.grad(loss)(A0)
    assert bool(jnp.all(jnp.isfinite(g)))

    # equilibrium + minimize info
    _, ie = equilibrium(contractive_fcn, y0_2x1, params=(A0,),
                        method="anderson_acc", f_tol=1e-10, x_tol=1e-10,
                        return_info=True)
    assert float(ie["converged"]) == 1.0
    _, im = minimize(lambda y, A: jnp.sum((A @ y) ** 2 + y ** 4 + y / 2.0),
                     y0_2x1, params=(A0,), method="adam", step=2e-2,
                     maxiter=20000, f_rtol=1e-14, x_rtol=1e-12,
                     return_info=True)
    assert im["iterations"] is not None


def test_mixed_static_params():
    """Non-array params (ints, strings, None) are closed over statically;
    dict-pytree params reach gradients via closure_convert."""
    def fcn(y, A, power, name, cfg):
        assert name == "tanh"
        z = A @ y + cfg["shift"]
        return jnp.tanh(z) ** power + y / 2.0

    cfg = {"shift": jnp.asarray(0.1)}
    y = rootfinder(fcn, y0_2x1, params=(A0, 1, "tanh", cfg), f_tol=1e-12)
    assert_allclose(fcn(y, A0, 1, "tanh", cfg), jnp.zeros_like(y), atol=1e-9)

    # gradient w.r.t. the dict leaf (hoisted by closure_convert)
    def loss(shift):
        c = {"shift": shift}
        yy = rootfinder(fcn, y0_2x1, params=(A0, 1, "tanh", c),
                        f_tol=1e-13, maxiter=10000)
        return jnp.sum(yy ** 2)

    g = jax.grad(loss)(jnp.asarray(0.1))
    assert bool(jnp.isfinite(g)) and abs(float(g)) > 1e-8


def test_newton_inexact_eisenstat_walker(rng):
    """Newton with an iterative inner solver and no explicit tolerances uses
    the adaptive Eisenstat-Walker forcing (reference rootsolver.py:85-139)
    and still converges to the same root as exact-solve Newton."""
    from xitorch_tpu.optimize import rootfinder

    A = jnp.asarray(rng.standard_normal((6, 6)) * 0.2)
    b = jnp.asarray(rng.standard_normal((6,)))

    def fcn(y, A, b):
        return jnp.tanh(A @ y + b) + y / 2.0

    y0 = jnp.zeros(6)
    y_exact = rootfinder(fcn, y0, params=(A, b), method="newton",
                         solver_method="exactsolve", maxiter=60)
    y_ew, info = rootfinder(fcn, y0, params=(A, b), method="newton",
                            solver_method="gmres", maxiter=60,
                            return_info=True)
    assert float(info["converged"]) == 1.0
    assert_allclose(y_ew, y_exact, rtol=1e-6, atol=1e-8)
    assert_allclose(fcn(y_ew, A, b), jnp.zeros(6), atol=1e-7)


def test_minimize_bck_cg_ir_mixed_precision(rng):
    """bck_options={'method': 'cg_ir'} is now supported on the minimize
    backward (round-1 limitation): the Hessian linop is hermitian-flagged so
    cg_ir applies; closure-converted (dtype-frozen) Jacobians are detected
    by an abstract probe and degrade to full-precision cg — either way the
    grads must match the exactsolve backward."""
    from xitorch_tpu.optimize import minimize

    n = 6
    a = jnp.asarray(rng.standard_normal((n, n)) * 0.4, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y0 = jnp.zeros(n, jnp.float32)

    def fcn(y, a, b):
        r = a @ y - b
        return jnp.sum(r * r) + 0.1 * jnp.sum(y ** 4)

    def loss(a, bck):
        y = minimize(fcn, y0, params=(a, b), method="broyden1",
                     maxiter=400, f_tol=1e-10, bck_options=bck)
        return jnp.sum(y ** 2)

    g_exact = jax.grad(loss)(a, {"method": "exactsolve"})
    g_ir = jax.grad(loss)(a, {"method": "cg_ir", "rtol": 1e-6, "atol": 1e-7})
    assert_allclose(g_ir, g_exact, rtol=1e-3, atol=1e-5)


def test_equilibrium_bck_cg_ir_falls_back(rng):
    """cg_ir in bck_options on a NON-hermitian residual Jacobian
    (equilibrium) falls back to plain cg and still matches."""
    from xitorch_tpu.optimize import equilibrium

    W = jnp.asarray(rng.standard_normal((8, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    y0 = jnp.zeros(8, jnp.float32)

    def f(y, W, b):
        return jnp.tanh(W @ y + b)

    def loss(W, bck):
        return jnp.sum(equilibrium(f, y0, params=(W, b), bck_options=bck) ** 2)

    g1 = jax.grad(loss)(W, {})
    g2 = jax.grad(loss)(W, {"method": "cg_ir"})
    assert_allclose(g2, g1, rtol=1e-4, atol=1e-6)


def test_minimize_rejects_nonscalar_objective():
    # parity with the reference: a vector-valued objective must error,
    # not be silently summed
    with pytest.raises(RuntimeError):
        minimize(lambda y: y ** 2, jnp.asarray([1.0, 2.0]), method="gd",
                 maxiter=3)
