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
