"""Fixed-step explicit Runge-Kutta integrators as lax.scan.

Parity with /root/reference/xitorch/_impls/integrate/ivp/explicit_rk.py:
same Butcher tableaus (rk4, rk38, euler :30-55), but the double Python loop
(:74-92) becomes one ``lax.scan`` over time intervals with the (small,
static) stage loop unrolled — jit/vmap/grad-able; memory bounded via
``jax.checkpoint`` on the step when requested.
"""
from __future__ import annotations

from typing import Callable, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["rk4_ivp", "rk38_ivp", "fwd_euler_ivp", "mid_point_ivp", "explicit_rk"]


class _Tableau(NamedTuple):
    c: List[float]
    b: List[float]
    a: List[List[float]]


rk4_tableau = _Tableau(
    c=[0.0, 0.5, 0.5, 1.0],
    b=[1 / 6., 1 / 3., 1 / 3., 1 / 6.],
    a=[[0.0, 0.0, 0.0, 0.0],
       [0.5, 0.0, 0.0, 0.0],
       [0.0, 0.5, 0.0, 0.0],
       [0.0, 0.0, 1.0, 0.0]],
)
rk38_tableau = _Tableau(
    c=[0.0, 1 / 3, 2 / 3, 1.0],
    b=[1 / 8, 3 / 8, 3 / 8, 1 / 8],
    a=[[0.0, 0.0, 0.0, 0.0],
       [1 / 3, 0.0, 0.0, 0.0],
       [-1 / 3, 1.0, 0.0, 0.0],
       [1.0, -1.0, 1.0, 0.0]],
)
fwd_euler_tableau = _Tableau(c=[0.0], b=[1.0], a=[[0.0]])
mid_point_tableau = _Tableau(
    c=[0.0, 0.5],
    b=[0.0, 1.0],
    a=[[0.0, 0.0],
       [0.5, 0.0]],
)


def explicit_rk(tableau: _Tableau, fcn: Callable, t: jnp.ndarray, y0,
                params: Sequence = (), remat: bool = False, **unused):
    """Integrate dy/dt = fcn(t, y, *params) at times t (nt,), y0 a pytree.
    Returns a pytree with leading dim nt (yt[0] == y0)."""
    c, a, b = tableau.c, tableau.a, tableau.b
    s = len(c)

    def step(y, t0t1):
        t0, t1 = t0t1
        h = t1 - t0
        ks = []
        for j in range(s):
            if j == 0:
                k = fcn(t0, y, *params)
            else:
                ak = jax.tree_util.tree_map(
                    lambda *kk: sum(a[j][m] * kk[m] for m in range(j)), *ks)
                yj = jax.tree_util.tree_map(lambda yy, aa: yy + h * aa, y, ak)
                k = fcn(t0 + c[j] * h, yj, *params)
            ks.append(k)
        ksum = jax.tree_util.tree_map(
            lambda *kk: sum(b[j] * kk[j] for j in range(s) if b[j] != 0), *ks)
        ynew = jax.tree_util.tree_map(lambda yy, kk: yy + h * kk, y, ksum)
        return ynew, ynew

    if remat:
        step = jax.checkpoint(step)

    _, yts = lax.scan(step, y0, (t[:-1], t[1:]))
    # prepend y0
    return jax.tree_util.tree_map(
        lambda y0_, yt_: jnp.concatenate([y0_[None], yt_], axis=0), y0, yts)


def rk4_ivp(fcn, t, y0, params=(), **kwargs):
    """Runge-Kutta steps of order 4 with fixed step size."""
    return explicit_rk(rk4_tableau, fcn, t, y0, params, **kwargs)


def rk38_ivp(fcn, t, y0, params=(), **kwargs):
    """Runge-Kutta 3/8-rule (order 4) with fixed step size."""
    return explicit_rk(rk38_tableau, fcn, t, y0, params, **kwargs)


def fwd_euler_ivp(fcn, t, y0, params=(), **kwargs):
    """Forward Euler with fixed step size."""
    return explicit_rk(fwd_euler_tableau, fcn, t, y0, params, **kwargs)


def mid_point_ivp(fcn, t, y0, params=(), **kwargs):
    """Explicit midpoint method (order 2) with fixed step size."""
    return explicit_rk(mid_point_tableau, fcn, t, y0, params, **kwargs)
