"""Fixed-step implicit (A-stable) integrators as lax.scan: stiff ODEs.

Beyond-reference methods: the reference's solve_ivp ships only explicit
steppers (/root/reference/xitorch/_impls/integrate/ivp/explicit_rk.py,
adaptive_rk.py), so stiff systems force it into tiny adaptive steps.
Here:

* ``bwd_euler_ivp``   — backward Euler (order 1, L-stable)
* ``trapezoidal_ivp`` — trapezoidal / Crank-Nicolson (order 2, A-stable)

Each step solves the implicit equation with a fixed, unrolled Newton
iteration (static shapes, jit/vmap-able): the Jacobian of the flattened
state is built with ``jax.jacfwd`` and factored densely per step —
appropriate for the moderate state sizes where stiff integrators are
used.  Reverse-mode gradients are the exact discrete adjoint through the
unrolled Newton steps (2nd order works), matching the library's
default-autodiff solve_ivp contract.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

__all__ = ["bwd_euler_ivp", "trapezoidal_ivp", "sdirk2_ivp"]


def _newton_solve(f_flat, tt, const, coef, z, eye, newton_iters):
    """Solve z = const + coef * f(tt, z) by ``newton_iters`` unrolled
    Newton steps (dense jacfwd Jacobian of the flattened state)."""

    def newton(z, _):
        g = z - const - coef * f_flat(tt, z)
        J = eye - coef * jax.jacfwd(lambda zz: f_flat(tt, zz))(z)
        dz = jnp.linalg.solve(J, g)
        return z - dz, None

    z, _ = lax.scan(newton, z, None, length=newton_iters)
    return z


def _implicit_theta(fcn: Callable, t: jnp.ndarray, y0,
                    params: Sequence = (), *, theta: float,
                    newton_iters: int = 6, remat: bool = False, **unused):
    """theta-method: y1 = y0 + h*((1-theta) f(t0,y0) + theta f(t1,y1)).
    theta=1: backward Euler; theta=0.5: trapezoidal."""
    y0_flat, unravel = ravel_pytree(y0)
    dtype = y0_flat.dtype
    n = y0_flat.size
    eye = jnp.eye(n, dtype=dtype)

    def f_flat(tt, zf):
        out = fcn(tt, unravel(zf), *params)
        return ravel_pytree(out)[0]

    def step(yf, t0t1):
        t0, t1 = t0t1
        h = t1 - t0
        f0 = f_flat(t0, yf)
        const = yf + h * (1.0 - theta) * f0
        # predictor: explicit Euler
        z = yf + h * f0
        z = _newton_solve(f_flat, t1, const, h * theta, z, eye,
                          newton_iters)
        return z, z

    if remat:
        step = jax.checkpoint(step)

    _, yts = lax.scan(step, y0_flat, (t[:-1], t[1:]))
    yts = jnp.concatenate([y0_flat[None], yts], axis=0)
    return jax.vmap(unravel)(yts)


def sdirk2_ivp(fcn: Callable, t: jnp.ndarray, y0, params: Sequence = (),
               *, newton_iters: int = 6, remat: bool = False, **unused):
    """Two-stage SDIRK (Alexander 1977), gamma = 1 - 1/sqrt(2): both
    L-stable AND order 2 — kills stiff transients (which make the
    A-stable trapezoidal method ring) without backward Euler's order-1
    accuracy loss.  Fixed steps; each stage is one unrolled Newton solve
    with the same diagonal coefficient gamma*h (one Jacobian shape for
    both stages).

    Butcher tableau:  c = [gamma, 1];  a = [[gamma, 0],
    [1-gamma, gamma]];  b = [1-gamma, gamma]  (stiffly accurate:
    y1 = z2).
    """
    gamma = 1.0 - 0.5 ** 0.5
    y0_flat, unravel = ravel_pytree(y0)
    dtype = y0_flat.dtype
    n = y0_flat.size
    eye = jnp.eye(n, dtype=dtype)

    def f_flat(tt, zf):
        out = fcn(tt, unravel(zf), *params)
        return ravel_pytree(out)[0]

    def step(yf, t0t1):
        t0, t1 = t0t1
        h = t1 - t0
        f0 = f_flat(t0, yf)
        # stage 1: z1 = y + gamma*h*f(t0+gamma*h, z1)
        z1 = _newton_solve(f_flat, t0 + gamma * h, yf, gamma * h,
                           yf + gamma * h * f0, eye, newton_iters)
        k1 = f_flat(t0 + gamma * h, z1)
        # stage 2 (stiffly accurate): z2 = y + (1-gamma)*h*k1
        #                                  + gamma*h*f(t1, z2);  y1 = z2
        const = yf + (1.0 - gamma) * h * k1
        z2 = _newton_solve(f_flat, t1, const, gamma * h,
                           const + gamma * h * k1, eye, newton_iters)
        return z2, z2

    if remat:
        step = jax.checkpoint(step)

    _, yts = lax.scan(step, y0_flat, (t[:-1], t[1:]))
    yts = jnp.concatenate([y0_flat[None], yts], axis=0)
    return jax.vmap(unravel)(yts)


def bwd_euler_ivp(fcn, t, y0, params=(), **kwargs):
    """Backward Euler (implicit, L-stable, order 1) with fixed step size.
    Options: newton_iters (default 6), remat."""
    kwargs.pop("theta", None)
    return _implicit_theta(fcn, t, y0, params, theta=1.0, **kwargs)


def trapezoidal_ivp(fcn, t, y0, params=(), **kwargs):
    """Trapezoidal / Crank-Nicolson (implicit, A-stable, order 2) with
    fixed step size.  Options: newton_iters (default 6), remat."""
    kwargs.pop("theta", None)
    return _implicit_theta(fcn, t, y0, params, theta=0.5, **kwargs)
