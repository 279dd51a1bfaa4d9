"""Interp1D tests (model: reference xitorch/_tests/test_interp.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu.interpolate import Interp1D
from tests.utils import assert_allclose, gradcheck2


@pytest.mark.parametrize("method", ["cspline", "linear"])
def test_interp_exact_at_knots(method, rng):
    x = jnp.asarray(np.sort(rng.uniform(0, 1, 10)))
    y = jnp.asarray(rng.standard_normal(10))
    f = Interp1D(x, y, method=method)
    assert_allclose(f(x), y, atol=1e-9)


@pytest.mark.parametrize("bc_type", ["natural", "clamped", "not-a-knot", "periodic"])
def test_cspline_vs_scipy(bc_type, rng):
    from scipy.interpolate import CubicSpline
    x = np.sort(rng.uniform(0, 1, 12))
    y = rng.standard_normal(12)
    if bc_type == "periodic":
        y[-1] = y[0]
    xq = np.linspace(x[0], x[-1], 37)
    ref = CubicSpline(x, y, bc_type=bc_type)(xq)
    ours = Interp1D(jnp.asarray(x), jnp.asarray(y), method="cspline",
                    bc_type=bc_type)(jnp.asarray(xq))
    assert_allclose(ours, ref, atol=1e-8)


def test_linear_vs_numpy(rng):
    x = np.sort(rng.uniform(0, 1, 15))
    y = rng.standard_normal(15)
    xq = np.linspace(x[0], x[-1], 40)
    ref = np.interp(xq, x, y)
    ours = Interp1D(jnp.asarray(x), jnp.asarray(y), method="linear")(jnp.asarray(xq))
    assert_allclose(ours, ref, atol=1e-9)


def test_interp_unsorted_input(rng):
    x = jnp.asarray(rng.uniform(0, 1, 10))
    y = 2 * x + 1
    f = Interp1D(x, y, method="linear")
    xq = jnp.linspace(float(x.min()), float(x.max()), 20)
    assert_allclose(f(xq), 2 * xq + 1, atol=1e-9)


@pytest.mark.parametrize("extrap,expected", [
    (0.0, "const"), ("nan", "nan"), ("bound", "bound"),
    ("mirror", "mirror"), ("periodic", "periodic"),
])
def test_extrapolation_modes(extrap, expected, rng):
    x = jnp.linspace(0.0, 1.0, 11)
    y = jnp.sin(2 * jnp.pi * x)  # periodic-compatible values
    f = Interp1D(x, y, method="linear", extrap=extrap)
    xq = jnp.asarray([-0.3, 0.5, 1.3])
    out = f(xq)
    assert_allclose(out[1], jnp.sin(jnp.pi), atol=1e-7)  # in-bounds entry
    if expected == "const":
        assert_allclose(out[0], 0.0, atol=1e-9)
        assert_allclose(out[2], 0.0, atol=1e-9)
    elif expected == "nan":
        assert bool(jnp.isnan(out[0])) and bool(jnp.isnan(out[2]))
    elif expected == "bound":
        assert_allclose(out[0], y[0], atol=1e-9)
        assert_allclose(out[2], y[-1], atol=1e-9)
    elif expected == "mirror":
        assert_allclose(out[0], jnp.sin(2 * jnp.pi * 0.3), atol=1e-6)
    elif expected == "periodic":
        assert_allclose(out[0], jnp.sin(2 * jnp.pi * 0.7), atol=1e-6)
        assert_allclose(out[2], jnp.sin(2 * jnp.pi * 0.3), atol=1e-6)


def test_extrap_callable(rng):
    x = jnp.linspace(0.0, 1.0, 5)
    y = x * 0 + 1.0
    f = Interp1D(x, y, method="linear", extrap=lambda xq: xq * 10)
    out = f(jnp.asarray([-1.0, 0.5, 2.0]))
    assert_allclose(out, jnp.asarray([-10.0, 1.0, 20.0]), atol=1e-9)


def test_interp_batched_y(rng):
    x = jnp.linspace(0.0, 1.0, 8)
    y = jnp.asarray(rng.standard_normal((3, 8)))
    f = Interp1D(x, method="cspline", bc_type="natural")
    xq = jnp.linspace(0.0, 1.0, 13)
    out = f(xq, y)
    assert out.shape == (3, 13)
    for i in range(3):
        fi = Interp1D(x, y[i], method="cspline", bc_type="natural")
        assert_allclose(out[i], fi(xq), atol=1e-9)


def test_interp_grad(rng):
    x = jnp.asarray(np.sort(rng.uniform(0, 1, 8)))
    y = jnp.asarray(rng.standard_normal(8))
    xq = jnp.asarray(np.linspace(0.05, 0.95, 11))

    def f(x, y, xq):
        return Interp1D(x, y, method="cspline", bc_type="natural")(xq)

    gradcheck2(f, (x, y, xq), order=2, atol=1e-4, rtol=1e-3, eps=1e-6)


def test_interp_jit_vmap(rng):
    x = jnp.linspace(0.0, 1.0, 9)
    ys = jnp.asarray(rng.standard_normal((4, 9)))
    xq = jnp.linspace(0.0, 1.0, 6)

    @jax.jit
    def apply(y):
        return Interp1D(x, y, method="cspline", bc_type="natural")(xq)

    out = jax.vmap(apply)(ys)
    assert out.shape == (4, 6)
    assert_allclose(out[0], apply(ys[0]), atol=1e-9)

    # Interp1D object crossing a jit boundary (pytree registration)
    f = Interp1D(x, ys[0], method="linear")
    out2 = jax.jit(lambda ff, q: ff(q))(f, xq)
    assert_allclose(out2, f(xq), atol=1e-12)


def test_interp1d_pallas_tridiag_matches_default(rng):
    """Opt-in Pallas Thomas path (ops/tridiag.py) gives the same spline and
    gradients as the default solve."""
    from xitorch_tpu.interpolate import Interp1D

    n = 160
    x = jnp.asarray(np.sort(rng.uniform(0, 1, n)))
    y = jnp.asarray(rng.standard_normal((3, n)))
    xq = jnp.asarray(rng.uniform(0.02, 0.98, 50))
    f_def = Interp1D(x, y, method="cspline", bc_type="natural")(xq)
    f_pal = Interp1D(x, y, method="cspline", bc_type="natural",
                     use_pallas=True)(xq)
    assert_allclose(f_pal, f_def, rtol=1e-8, atol=1e-10)

    g_def = jax.grad(lambda y: jnp.sum(
        Interp1D(x, y, method="cspline", bc_type="natural")(xq) ** 2))(y)
    g_pal = jax.grad(lambda y: jnp.sum(
        Interp1D(x, y, method="cspline", bc_type="natural",
                 use_pallas=True)(xq) ** 2))(y)
    assert_allclose(g_pal, g_def, rtol=1e-8, atol=1e-10)


def test_pchip_matches_scipy_and_monotone():
    from scipy.interpolate import PchipInterpolator

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0, 10, 17)))
    y = jnp.asarray(rng.standard_normal(17))
    xq = jnp.linspace(float(x[0]), float(x[-1]), 301)
    got = Interp1D(x, y, method="pchip")(xq)
    want = PchipInterpolator(np.asarray(x), np.asarray(y))(np.asarray(xq))
    assert_allclose(got, jnp.asarray(want), atol=1e-13)

    # shape preservation: monotone data -> monotone interpolant (the
    # cspline overshoots on this step-like data, pchip must not)
    ystep = jnp.asarray([0.0, 0.0, 0.1, 0.2, 5.0, 5.1, 5.1, 5.2,
                         9.0, 9.1, 9.2, 9.2, 9.3, 9.4, 9.5, 9.6, 9.7])
    g = Interp1D(x, ystep, method="pchip")(xq)
    assert bool(jnp.all(jnp.diff(g) >= -1e-12))
    assert float(jnp.max(g)) <= float(jnp.max(ystep)) + 1e-12
    assert float(jnp.min(g)) >= float(jnp.min(ystep)) - 1e-12


def test_pchip_grad_batch_extrap():
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.sort(rng.uniform(0, 5, 12)))
    y = jnp.asarray(rng.standard_normal(12))
    xq = jnp.linspace(float(x[0]) + 0.05, float(x[-1]) - 0.05, 40)

    gradcheck2(lambda yy: jnp.sum(Interp1D(x, method="pchip")(xq, yy) ** 2),
               (y,), order=2, atol=2e-4, rtol=2e-3, eps=1e-6)

    # batched y, jit, and padded extrapolation
    yb = jnp.stack([y, y * 2.0])
    out = jax.jit(lambda yy: Interp1D(x, yy, method="pchip")(xq))(yb)
    assert out.shape == (2, 40)
    xq2 = jnp.asarray([-1.0, 2.0, 6.0])
    out2 = Interp1D(x, y, method="pchip", extrap=-7.0)(xq2)
    assert float(out2[0]) == -7.0 and float(out2[2]) == -7.0
    assert bool(jnp.isfinite(out2[1]))


def test_interp_unsorted_x_call_time_y():
    # regression: the auto-sort permutation was dropped for call-time y,
    # silently pairing values with the wrong knots
    x = jnp.array([3.0, 1.0, 2.0])
    y = jnp.array([30.0, 10.0, 20.0])
    for method in ("linear", "cspline", "pchip"):
        out_call = Interp1D(x, method=method)(jnp.array([1.5]), y=y)
        out_init = Interp1D(x, y, method=method)(jnp.array([1.5]))
        assert_allclose(out_call, out_init, atol=1e-12)
    assert abs(float(Interp1D(x, method="linear")(jnp.array([1.5]), y=y)[0])
               - 15.0) < 1e-12
    # and through jit (the permutation must survive the pytree round trip)
    f = jax.jit(lambda yy: Interp1D(x, method="linear")(jnp.array([1.5]),
                                                        y=yy))
    assert abs(float(f(y)[0]) - 15.0) < 1e-12
