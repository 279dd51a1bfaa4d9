"""integrate tests: quad, solve_ivp, mcquad, SQuad
(model: reference xitorch/_tests/test_integrate.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu.integrate import quad, solve_ivp, mcquad, SQuad
from tests.utils import assert_allclose, gradcheck2


# ------------------------- quad -------------------------

def test_quad_poly():
    # exact for polynomials
    def fcn(x, a, b):
        return a * x ** 3 + b * x

    a, b = jnp.asarray(2.0), jnp.asarray(-1.0)
    xl, xu = jnp.asarray(-1.0), jnp.asarray(2.0)
    res = quad(fcn, xl, xu, params=(a, b), n=64)
    exact = a / 4 * (xu ** 4 - xl ** 4) + b / 2 * (xu ** 2 - xl ** 2)
    assert_allclose(res, exact, rtol=1e-10)


def test_quad_grad_bounds_params():
    def fcn(x, g, w):
        return jnp.exp(-0.5 * ((x - g) / w) ** 2) / w

    g, w = jnp.asarray(0.2), jnp.asarray(1.3)
    xl, xu = jnp.asarray(-3.0), jnp.asarray(4.0)

    def res(xl, xu, g, w):
        return quad(fcn, xl, xu, params=(g, w), n=120)

    gradcheck2(res, (xl, xu, g, w), order=2, atol=1e-4, rtol=1e-3, eps=1e-5)
    # d/dxu = f(xu)
    gxu = jax.grad(res, argnums=1)(xl, xu, g, w)
    assert_allclose(gxu, fcn(xu, g, w), rtol=1e-4)


def test_quad_inf_bounds():
    def fcn(x, w):
        return jnp.exp(-0.5 * (x / w) ** 2)

    w = jnp.asarray(1.1)
    res = quad(fcn, -np.inf, np.inf, params=(w,), n=200)
    assert_allclose(res, jnp.sqrt(2 * jnp.pi) * w, rtol=1e-6)
    g = jax.grad(lambda w: quad(fcn, -np.inf, np.inf, params=(w,), n=200))(w)
    assert_allclose(g, jnp.sqrt(2 * jnp.pi), rtol=1e-5)


def test_quad_multi_output():
    def fcn(x, a):
        return (a * x, jnp.stack([x ** 2, x ** 3]))

    a = jnp.asarray(1.5)
    r1, r2 = quad(fcn, 0.0, 1.0, params=(a,), n=32)
    assert_allclose(r1, a / 2, rtol=1e-9)
    assert_allclose(r2, jnp.asarray([1 / 3, 1 / 4]), rtol=1e-9)


# ------------------------- solve_ivp -------------------------

def exp_fcn(t, y, a):
    return a * y


@pytest.mark.parametrize("method", ["euler", "mid_point", "rk4", "rk38", "rk23", "rk45"])
def test_ivp_methods_exp(method):
    a = jnp.asarray(-0.7)
    y0 = jnp.asarray([1.0, 2.0])
    ts = jnp.linspace(0.0, 2.0, 80 if method in ("euler", "mid_point") else 11)
    opts = {}
    if method in ("rk23", "rk45"):
        opts = {"atol": 1e-10, "rtol": 1e-9, "max_steps": 2048}
    yt = solve_ivp(exp_fcn, ts, y0, params=(a,), method=method, **opts)
    expected = y0 * jnp.exp(a * ts)[:, None]
    tol = {"euler": 2e-2, "mid_point": 1e-3, "rk4": 1e-5, "rk38": 1e-5,
           "rk23": 1e-6, "rk45": 1e-6}[method]
    assert_allclose(yt, expected, rtol=tol, atol=tol)


def test_ivp_decreasing_ts():
    a = jnp.asarray(-0.5)
    y0 = jnp.asarray([1.0])
    ts = jnp.linspace(1.0, 0.0, 7)
    yt = solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk45",
                   atol=1e-10, rtol=1e-9)
    expected = y0 * jnp.exp(a * (ts - ts[0]))[:, None]
    assert_allclose(yt, expected, rtol=1e-6)


@pytest.mark.parametrize("method", ["rk4", "rk45"])
def test_ivp_grad(method):
    a = jnp.asarray(-0.6)
    y0 = jnp.asarray([1.3])
    ts = jnp.linspace(0.0, 1.5, 7)

    def loss(a, y0):
        opts = {"atol": 1e-10, "rtol": 1e-9} if method == "rk45" else {}
        yt = solve_ivp(exp_fcn, ts, y0, params=(a,), method=method, **opts)
        return jnp.sum(yt ** 2)

    # oracle: analytic solution
    def loss_exact(a, y0):
        yt = y0 * jnp.exp(a * ts)[:, None]
        return jnp.sum(yt ** 2)

    assert_allclose(loss(a, y0), loss_exact(a, y0), rtol=1e-5)
    g1 = jax.grad(loss, argnums=(0, 1))(a, y0)
    g2 = jax.grad(loss_exact, argnums=(0, 1))(a, y0)
    assert_allclose(g1[0], g2[0], rtol=1e-4)
    assert_allclose(g1[1], g2[1], rtol=1e-4)


def test_ivp_grad_2nd_order():
    a = jnp.asarray(-0.6)
    ts = jnp.linspace(0.0, 1.0, 5)
    y0 = jnp.asarray([1.0])

    def loss(a):
        yt = solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk4")
        return jnp.sum(yt ** 2)

    def loss_exact(a):
        return jnp.sum((y0 * jnp.exp(a * ts)[:, None]) ** 2)

    assert_allclose(jax.grad(jax.grad(loss))(a),
                    jax.grad(jax.grad(loss_exact))(a), rtol=1e-4)


def test_ivp_pytree_y0():
    def fcn(t, y, a):
        return {"p": a * y["q"], "q": -a * y["p"]}

    a = jnp.asarray(1.0)
    y0 = {"p": jnp.asarray([1.0]), "q": jnp.asarray([0.0])}
    ts = jnp.linspace(0.0, 1.0, 5)
    for method in ["rk4", "rk45"]:
        yt = solve_ivp(fcn, ts, y0, params=(a,), method=method,
                       atol=1e-9, rtol=1e-8)
        assert_allclose(yt["p"][:, 0], jnp.cos(ts), atol=1e-4)
        assert_allclose(yt["q"][:, 0], -jnp.sin(ts), atol=1e-4)


def test_ivp_vmap_adaptive():
    """vmap over adaptive RK45 — an upgrade over the reference."""
    a_batch = jnp.asarray([-0.3, -0.6, -1.0])
    y0 = jnp.asarray([1.0])
    ts = jnp.linspace(0.0, 1.0, 5)

    yt = jax.vmap(lambda a: solve_ivp(exp_fcn, ts, y0, params=(a,),
                                      method="rk45", atol=1e-9, rtol=1e-8))(a_batch)
    expected = jnp.exp(a_batch[:, None] * ts)[..., None]
    assert_allclose(yt, expected, rtol=1e-5)


# ------------------------- mcquad -------------------------

def test_mcquad_dummy1d_exact():
    """Deterministic sampler: E_p[x^2] for p = N(mu, sigma)."""
    mu = jnp.asarray(0.3)
    sigma = jnp.asarray(0.8)

    def logp(x, mu, sigma):
        return -0.5 * ((x - mu) / sigma) ** 2

    def f(x, a):
        return a * x * x

    a = jnp.asarray(2.0)
    x0 = jnp.asarray(0.0)
    epf = mcquad(f, logp, x0, fparams=(a,), pparams=(mu, sigma),
                 method="dummy1d", nsamples=200)
    assert_allclose(epf, a * (sigma ** 2 + mu ** 2), rtol=1e-5)


def test_mcquad_dummy1d_grads():
    def logp(x, mu, sigma):
        return -0.5 * ((x - mu) / sigma) ** 2

    def f(x, a):
        return a * x * x

    x0 = jnp.asarray(0.0)

    def epf(a, mu, sigma):
        return mcquad(f, logp, x0, fparams=(a,), pparams=(mu, sigma),
                      method="dummy1d", nsamples=200)

    a, mu, sigma = jnp.asarray(2.0), jnp.asarray(0.3), jnp.asarray(0.8)
    # oracle: E = a*(sigma^2 + mu^2)
    oracle = lambda a, mu, sigma: a * (sigma ** 2 + mu ** 2)
    for i in range(3):
        g1 = jax.grad(epf, argnums=i)(a, mu, sigma)
        g2 = jax.grad(oracle, argnums=i)(a, mu, sigma)
        assert_allclose(g1, g2, rtol=1e-4, msg="grad argnum %d" % i)
    # second order
    h1 = jax.hessian(epf, argnums=1)(a, mu, sigma)
    h2 = jax.hessian(oracle, argnums=1)(a, mu, sigma)
    assert_allclose(h1, h2, rtol=1e-3)


def test_mcquad_mh_statistical():
    def logp(x, mu):
        return -0.5 * jnp.sum((x - mu) ** 2)

    def f(x):
        return x

    mu = jnp.asarray([0.5, -0.2])
    x0 = jnp.zeros(2)
    epf = mcquad(f, logp, x0, fparams=(), pparams=(mu,),
                 method="mh", nsamples=20000, nburnout=2000, step_size=0.8)
    assert_allclose(epf, mu, atol=0.08)


def test_mcquad_mh_multichain_convergence():
    """Multi-chain MH (VERDICT round-1 item 6): per-chain means must agree
    with each other (a split-Rhat-style between/within check) and the
    pooled estimate must land on the analytic moments."""
    from xitorch_tpu._impls.integrate.mcmc import mh

    mu = jnp.asarray([1.0, -0.5])

    def logp(x, mu):
        return -0.5 * jnp.sum((x - mu) ** 2)

    nchains, spc = 64, 400
    xs, ws = mh(lambda x, m: logp(x, m), jnp.zeros(2), (mu,),
                nsamples=nchains * spc, nburnout=500, step_size=0.8,
                nchains=nchains)
    assert xs.shape == (nchains * spc, 2)
    assert_allclose(jnp.sum(ws), 1.0, rtol=1e-12)
    chains = xs.reshape(nchains, spc, 2)
    cmeans = jnp.mean(chains, axis=1)                    # (nchains, 2)
    # pooled mean and variance hit the analytic standard normal moments
    assert_allclose(jnp.mean(cmeans, axis=0), mu, atol=0.06)
    assert_allclose(jnp.var(xs, axis=0), jnp.ones(2), atol=0.12)
    # between-chain spread consistent with within-chain variance:
    # var of a chain mean ~ var * tau / spc; R-hat-style ratio stays O(1)
    between = jnp.var(cmeans, axis=0)
    within = jnp.mean(jnp.var(chains, axis=1), axis=0)
    ratio = between / (within / spc)
    assert bool(jnp.all(ratio < 30.0)), ratio  # tau(step 0.8) ~ 10

    # nchains=1 reproduces the reference's sequential shape
    xs1, ws1 = mh(lambda x, m: logp(x, m), jnp.zeros(2), (mu,),
                  nsamples=100, nburnout=50, nchains=1)
    assert xs1.shape == (100, 2) and ws1.shape == (100,)

    # mcquad end-to-end through the default (multi-chain) mh sampler,
    # with gradients to pparams
    def ep_x2(mu):
        return mcquad(lambda x: jnp.sum(x ** 2), logp, jnp.zeros(2),
                      fparams=(), pparams=(mu,), method="mh",
                      nsamples=32000, nburnout=500, step_size=0.8)

    val, grad = jax.value_and_grad(ep_x2)(mu)
    # E[|x|^2] = |mu|^2 + d;  d E / d mu = 2 mu (tolerances ~4 sigma of
    # the MC error at this sample count)
    assert_allclose(val, jnp.sum(mu ** 2) + 2.0, atol=0.25)
    assert_allclose(grad, 2 * mu, atol=0.25)


# ------------------------- SQuad -------------------------

@pytest.mark.parametrize("method", ["trapz", "simpson", "cspline"])
def test_squad_integrate_cumsum(method):
    x = jnp.asarray(np.sort(np.concatenate(
        [[0.0, 1.0], np.random.default_rng(3).uniform(0, 1, 29)])))
    y = jnp.sin(3 * x) + 0.5 * x
    exact_cum = (1 - jnp.cos(3 * x)) / 3 + 0.25 * x ** 2
    sq = SQuad(x, method=method)
    tol = {"trapz": 2e-3, "simpson": 5e-4, "cspline": 5e-4}[method]
    assert_allclose(sq.cumsum(y), exact_cum, atol=tol)
    assert_allclose(sq.integrate(y), exact_cum[-1], atol=tol)


def test_squad_grad():
    x = jnp.linspace(0.0, 1.0, 12)
    y = jnp.sin(x)

    def loss(y):
        return jnp.sum(SQuad(x, method="cspline").cumsum(y) ** 2)

    gradcheck2(loss, (y,), order=2, atol=1e-4, rtol=1e-3, eps=1e-5)


def test_squad_batched_dims():
    x = jnp.linspace(0.0, 1.0, 9)
    y = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=0)  # (2, 9)
    sq = SQuad(x, method="trapz")
    c = sq.cumsum(y)
    assert c.shape == (2, 9)
    c0 = sq.cumsum(y.T, dim=0)
    assert_allclose(c0, c.T)
    i = sq.integrate(y, keepdim=True)
    assert i.shape == (2, 1)


def test_squad_integrate_interior_dim():
    """Regression: integrate over an interior dim with keepdim=False must
    restore the axis order (result was silently transposed)."""
    x = jnp.linspace(0.0, 1.0, 5)
    y = jnp.arange(5.0 * 2 * 3).reshape(5, 2, 3)
    sq = SQuad(x, method="trapz")
    expected = sq.integrate(jnp.moveaxis(y, 0, -1))  # reduce last axis
    r = sq.integrate(y, dim=0)
    assert r.shape == (2, 3)
    assert_allclose(r, expected)
    rk = sq.integrate(y, dim=0, keepdim=True)
    assert rk.shape == (1, 2, 3)
    assert_allclose(rk[0], expected)
    # negative interior dim
    r2 = sq.integrate(jnp.moveaxis(y, 0, 1), dim=-2)
    assert r2.shape == (2, 3)
    assert_allclose(r2, expected)


def test_ivp_backsolve_adjoint():
    """Continuous-adjoint (backsolve) gradients match autodiff gradients."""
    a = jnp.asarray(-0.6)
    y0 = jnp.asarray([1.3, 0.7])
    ts = jnp.linspace(0.0, 1.5, 6)

    def run(a, y0, adjoint):
        yt = solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk45",
                       adjoint=adjoint, atol=1e-10, rtol=1e-9)
        return jnp.sum(yt ** 2)

    v1 = run(a, y0, "autodiff")
    v2 = run(a, y0, "backsolve")
    assert_allclose(v1, v2, rtol=1e-10)

    g1 = jax.grad(run, argnums=(0, 1))(a, y0, "autodiff")
    g2 = jax.grad(run, argnums=(0, 1))(a, y0, "backsolve")
    assert_allclose(g1[0], g2[0], rtol=1e-5)
    assert_allclose(g1[1], g2[1], rtol=1e-5)


def test_ivp_backsolve_ts_grad():
    a = jnp.asarray(-0.5)
    y0 = jnp.asarray([1.0])
    ts = jnp.linspace(0.0, 1.0, 5)

    def run(ts):
        yt = solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk45",
                       adjoint="backsolve", atol=1e-11, rtol=1e-10)
        return jnp.sum(yt[-1] ** 2)

    g = jax.grad(run)(ts)
    # analytic: d/dT [y0^2 e^{2a(T-t0)}] = 2a y(T)^2 ; d/dt0 = -that
    yT = float(y0[0] * jnp.exp(a * (ts[-1] - ts[0])))
    assert_allclose(g[-1], 2 * a * yT ** 2, rtol=1e-4)
    assert_allclose(g[0], -2 * a * yT ** 2, rtol=1e-4)


def test_ivp_backsolve_nonautonomous_grads():
    """Backsolve ts/param/y0 grads match autodiff for a t-DEPENDENT fcn
    (regression: grad_ts[0] was computed with an autonomous-only shortcut;
    reference integrates a dL/dt slot, solve_ivp.py:171-199)."""

    def fcn(t, y, a, w):
        return a * y + jnp.sin(w * t) * (1.0 + 0.3 * y)

    a = jnp.asarray(-0.4)
    w = jnp.asarray(2.3)
    y0 = jnp.asarray([0.9, 1.4])
    ts = jnp.linspace(0.15, 1.35, 6)

    def run(ts, a, w, y0, adjoint):
        yt = solve_ivp(fcn, ts, y0, params=(a, w), method="rk45",
                       adjoint=adjoint, atol=1e-11, rtol=1e-10)
        # weight outputs unevenly so every grad_yt[i] is distinct
        wts = jnp.arange(1.0, ts.shape[0] + 1.0)[:, None]
        return jnp.sum(wts * yt ** 2)

    g_auto = jax.grad(run, argnums=(0, 1, 2, 3))(ts, a, w, y0, "autodiff")
    g_back = jax.grad(run, argnums=(0, 1, 2, 3))(ts, a, w, y0, "backsolve")
    for ga, gb in zip(g_auto, g_back):
        assert_allclose(gb, ga, rtol=2e-5, atol=1e-9)


def test_ivp_return_info():
    """solve_ivp(return_info=True): adaptive step accounting, jit-safe."""
    a = jnp.asarray(-0.7)
    y0 = jnp.asarray([1.0, 0.4])
    ts = jnp.linspace(0.0, 2.0, 6)

    @jax.jit
    def f(a):
        return solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk45",
                         atol=1e-9, rtol=1e-8, return_info=True)

    yt, info = f(a)
    assert float(info["converged"]) == 1.0
    assert float(info["iterations"]) > 0
    assert_allclose(yt, y0 * jnp.exp(a * ts)[:, None], rtol=1e-6)

    # budget exhaustion flags non-convergence
    yt2, info2 = solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk45",
                           atol=1e-12, rtol=1e-12, max_steps=3,
                           return_info=True)
    assert float(info2["converged"]) == 0.0

    # fixed-step methods: trivially complete
    yt3, info3 = solve_ivp(exp_fcn, ts, y0, params=(a,), method="rk4",
                           return_info=True)
    assert float(info3["converged"]) == 1.0
    assert float(info3["iterations"]) == ts.shape[0] - 1

    # grads still flow through yt with info requested
    g = jax.grad(lambda a: jnp.sum(f(a)[0] ** 2))(a)
    g2 = jax.grad(lambda a: jnp.sum(solve_ivp(
        exp_fcn, ts, y0, params=(a,), method="rk45", atol=1e-9,
        rtol=1e-8) ** 2))(a)
    assert_allclose(g, g2, rtol=1e-10)

    with pytest.raises(RuntimeError, match="return_info"):
        solve_ivp(exp_fcn, ts, y0, params=(a,), adjoint="backsolve",
                  return_info=True)


def test_ivp_implicit_stiff():
    # stiff linear system: explicit rk4 at this step size diverges, the
    # implicit methods stay stable; L-stable bwd_euler also damps the
    # fast transient (A-stable trapezoidal rings on it, by design)
    import scipy.linalg as sla

    A = jnp.asarray([[-1000.0, 0.0], [1.0, -1.0]])
    fcn = lambda t, y, A: A @ y
    ts = jnp.linspace(0.0, 1.0, 101)
    y0 = jnp.asarray([1.0, 1.0])
    exact = jnp.stack([jnp.asarray(sla.expm(np.asarray(A) * float(t))) @ y0
                       for t in ts])

    y_be = solve_ivp(fcn, ts, y0, params=(A,), method="bwd_euler")
    assert float(jnp.max(jnp.abs(y_be - exact)[5:])) < 5e-3
    y_tr = solve_ivp(fcn, ts, y0, params=(A,), method="trapezoidal")
    # after the transient decays, trapezoidal is accurate at order 2
    assert float(jnp.max(jnp.abs(y_tr - exact)[30:])) < 1e-3
    y_rk4 = solve_ivp(fcn, ts, y0, params=(A,), method="rk4")
    assert float(jnp.max(jnp.abs(y_rk4))) > 1e3  # explicit blows up


def test_ivp_implicit_order_and_grads():
    # trapezoidal converges at order 2 on a smooth nonlinear problem
    fnl = lambda t, y, a: -a * y + jnp.sin(t) * jnp.tanh(y)
    y0 = jnp.asarray([0.7, -0.2])
    a = jnp.asarray(1.3)

    def err(nt):
        ts = jnp.linspace(0.0, 2.0, nt)
        ref = solve_ivp(fnl, ts, y0, params=(a,), method="rk45",
                        rtol=1e-10, atol=1e-12)
        yt = solve_ivp(fnl, ts, y0, params=(a,), method="trapezoidal")
        return float(jnp.max(jnp.abs(yt - ref)))

    e1, e2 = err(21), err(41)
    assert e2 < e1 / 3.0  # ~4x per halving for order 2

    def loss(a):
        ts = jnp.linspace(0.0, 2.0, 21)
        return jnp.sum(solve_ivp(fnl, ts, y0, params=(a,),
                                 method="trapezoidal") ** 2)

    gradcheck2(loss, (a,), order=2, atol=1e-5, rtol=1e-5)

    # pytree state + vmap over initial conditions
    fp = lambda t, y, k: {"a": -k * y["a"], "b": y["a"] - y["b"]}
    ts = jnp.linspace(0.0, 1.0, 11)
    y0s = {"a": jnp.ones((4, 3)), "b": jnp.zeros((4, 3))}
    yt = jax.vmap(lambda yy: solve_ivp(fp, ts, yy, params=(jnp.asarray(5.0),),
                                       method="bwd_euler"))(
        y0s)
    assert yt["a"].shape == (4, 11, 3)


def test_quad_tanhsinh_singular_endpoints():
    from xitorch_tpu.integrate import quad

    # integrable endpoint singularities: exponential convergence where
    # leggauss creeps polynomially (err ~7e-3 at the same 121-node budget)
    r1 = quad(lambda x: 1.0 / jnp.sqrt(x), 0.0, 1.0, method="tanhsinh")
    assert abs(float(r1) - 2.0) < 5e-7  # f64 floor: nodes can't get
    # closer than ~eps to the endpoint through the absolute-x API
    r2 = quad(lambda x: jnp.log(x), 0.0, 1.0, method="tanhsinh")
    assert abs(float(r2) + 1.0) < 1e-11
    r3 = quad(lambda x: 1.0 / jnp.sqrt(1.0 - x * x), -1.0, 1.0,
              method="tanhsinh")
    assert abs(float(r3) - np.pi) < 1e-6

    # smooth integrand: matches leggauss to high accuracy
    import math
    val = quad(lambda x: jnp.exp(-x * x), 0.0, 3.0, method="tanhsinh")
    want = math.sqrt(math.pi) / 2 * math.erf(3.0)
    assert abs(float(val) - want) < 1e-12

    # differentiable (2nd order) like every quad method
    f = lambda w: quad(lambda x, ww: jnp.exp(-ww * x * x), 0.0, 3.0,
                       params=(w,), method="tanhsinh")
    gradcheck2(f, (jnp.asarray(1.3),), order=2, atol=1e-6, rtol=1e-6)


def test_ivp_sdirk2_stiff_and_order():
    # L-stable AND order 2: damps the stiff transient (trapezoidal rings
    # there) while converging at order 2 on smooth problems
    import scipy.linalg as sla

    A = jnp.asarray([[-1000.0, 0.0], [1.0, -1.0]])
    fcn = lambda t, y, A: A @ y
    ts = jnp.linspace(0.0, 1.0, 101)
    y0 = jnp.asarray([1.0, 1.0])
    exact = jnp.stack([jnp.asarray(sla.expm(np.asarray(A) * float(t))) @ y0
                       for t in ts])
    y_s = solve_ivp(fcn, ts, y0, params=(A,), method="sdirk2")
    assert float(jnp.max(jnp.abs(y_s - exact)[5:])) < 1e-3

    fnl = lambda t, y, a: -a * y + jnp.sin(t) * jnp.tanh(y)
    y0b = jnp.asarray([0.7, -0.2])
    a = jnp.asarray(1.3)

    def err(nt):
        tg = jnp.linspace(0.0, 2.0, nt)
        ref = solve_ivp(fnl, tg, y0b, params=(a,), method="rk45",
                        rtol=1e-10, atol=1e-12)
        return float(jnp.max(jnp.abs(
            solve_ivp(fnl, tg, y0b, params=(a,), method="sdirk2") - ref)))

    assert err(41) < err(21) / 3.0

    gradcheck2(lambda aa: jnp.sum(solve_ivp(
        fnl, jnp.linspace(0.0, 2.0, 21), y0b, params=(aa,),
        method="sdirk2") ** 2), (a,), order=2, atol=1e-5, rtol=1e-5)
