"""Fixed-order quadrature kernels.

Parity with /root/reference/xitorch/_impls/integrate/fixed_quad.py:6-25,
with the per-node Python accumulation loop (:23-25) replaced by a vmap over
nodes + weighted reduction (parallel on TPU).  Gauss-Legendre nodes are
static numpy constants baked at trace time.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def leggauss(fcn, xl, xu, params, n: int = 100, **unused):
    """n-point Gauss-Legendre quadrature of ``fcn(x, *params)`` over
    [xl, xu].  fcn may return any pytree; differentiable natively (the
    reference needs a recursive-quad backward, quad.py:185-201 — here plain
    AD through the node sum computes the same estimator).

    Keyword arguments
    -----------------
    n: int
        The number of integration points.
    """
    xlg_np, wlg_np = np.polynomial.legendre.leggauss(n)
    dtype = jnp.result_type(xu, xl)
    if not jnp.issubdtype(dtype, jnp.inexact):
        dtype = jnp.result_type(float)
    xlg = jnp.asarray(xlg_np, dtype=dtype)
    wlg = jnp.asarray(wlg_np, dtype=dtype)
    xl = jnp.asarray(xl, dtype=dtype)
    xu = jnp.asarray(xu, dtype=dtype)
    half = 0.5 * (xu - xl)
    mid = 0.5 * (xu + xl)
    xs = xlg * half + mid  # (n,) (bounds are scalars per API contract)
    ws = wlg * half

    ys = jax.vmap(lambda x: fcn(x, *params))(xs)  # pytree with leading n
    return jax.tree_util.tree_map(
        lambda y: jnp.tensordot(ws, y, axes=(0, 0),
                        precision=jax.lax.Precision.HIGHEST), ys)


def tanhsinh(fcn, xl, xu, params, n: int = 121, **unused):
    """n-point tanh-sinh (double-exponential) quadrature over [xl, xu].

    Beyond-reference method (the reference ships leggauss only,
    fixed_quad.py:6-25): the DE substitution x = mid + half*tanh(pi/2 *
    sinh(t)) pushes the endpoints infinitely far away in t, so endpoint
    singularities integrable in the Riemann sense (1/sqrt(x), log(x),
    ...) converge exponentially where Gauss-Legendre creeps
    polynomially.  Nodes/weights are static constants; the node nearest
    an endpoint sits ~2e-14 (f64) / ~1e-7 (f32) away relative to the
    interval, so fcn is never evaluated exactly at a finite singular
    endpoint.

    Keyword arguments
    -----------------
    n: int
        The number of integration points (level h = 2*t_max/(n-1)).
    """
    dtype = jnp.result_type(xu, xl)
    if not jnp.issubdtype(dtype, jnp.inexact):
        dtype = jnp.result_type(float)
    # t_max: where the DE weight underflows the dtype (and the node
    # distance to the endpoint stays representable)
    t_max = 3.0 if jnp.finfo(dtype).bits >= 64 else 2.3
    t = np.linspace(-t_max, t_max, n)
    h = t[1] - t[0]
    st = np.pi / 2.0 * np.sinh(t)
    xs01 = np.tanh(st)                                   # in (-1, 1)
    wts = h * (np.pi / 2.0) * np.cosh(t) / np.cosh(st) ** 2

    xl = jnp.asarray(xl, dtype=dtype)
    xu = jnp.asarray(xu, dtype=dtype)
    half = 0.5 * (xu - xl)
    mid = 0.5 * (xu + xl)
    xs = jnp.asarray(xs01, dtype=dtype) * half + mid
    ws = jnp.asarray(wts, dtype=dtype) * half

    ys = jax.vmap(lambda x: fcn(x, *params))(xs)
    return jax.tree_util.tree_map(
        lambda y: jnp.tensordot(ws, y, axes=(0, 0),
                        precision=jax.lax.Precision.HIGHEST), ys)
