"""First-order minimizers (gd with momentum, adam) as while_loops.

Parity with /root/reference/xitorch/_impls/optimize/minimizer.py:5-210:
the forward function returns ``(f, grad_f)`` pairs; stopping uses OR
criteria; the best-f iterate is tracked and returned on non-convergence;
``maxiter=0`` returns x0 (the reference's "wrap backprop only" idiom).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

from xitorch_tpu._impls.optimize.rootsolver import _norm

__all__ = ["gd", "adam"]


def _minimize_loop(update_init, update_fcn, fcn, x0, params,
                   maxiter, f_tol, f_rtol, x_tol, x_rtol, return_info=False):
    def cond_fun(state):
        return (~state["stop"]) & (state["i"] < maxiter)

    def body_fun(state):
        x = state["x"]
        f, dfdx = fcn(x, *params)
        aux, v = update_fcn(state["aux"], state["i"], dfdx)
        xnew = x + v

        dxnorm = _norm(xnew - x)
        xnorm = _norm(x)
        df = jnp.abs(state["fprev"] - f)
        converge = ((dxnorm < x_tol) | (dxnorm < x_rtol * xnorm)
                    | (df < f_tol) | (df < f_rtol * jnp.abs(f)))
        stop = (state["i"] > 0) & converge

        better = f < state["best_f"]
        best_x = jnp.where(better, x, state["best_x"])
        best_f = jnp.where(better, f, state["best_f"])

        return {"x": xnew, "aux": aux, "i": state["i"] + 1, "fprev": f,
                "best_x": best_x, "best_f": best_f, "stop": stop}

    state0 = {"x": x0, "aux": update_init, "i": jnp.asarray(0),
              "fprev": jnp.asarray(0.0, dtype=x0.dtype),
              "best_x": x0, "best_f": jnp.asarray(jnp.inf, dtype=x0.dtype),
              "stop": jnp.asarray(maxiter == 0)}
    out = lax.while_loop(cond_fun, body_fun, state0)
    x_final = jnp.where(out["stop"], out["x"], out["best_x"])
    if return_info:
        info = {
            "converged": out["stop"].astype(jnp.float32),
            "iterations": out["i"].astype(jnp.float32),
            "best_fnorm": out["best_f"].astype(jnp.float32),
        }
        return x_final, info
    return x_final


def gd(fcn: Callable, x0: jnp.ndarray, params=(), *,
       step: float = 1e-3,
       gamma: float = 0.9,
       maxiter: int = 1000,
       f_tol: float = 0.0, f_rtol: float = 1e-8,
       x_tol: float = 0.0, x_rtol: float = 1e-8,
       verbose=False, **unused):
    """Gradient descent with momentum:
    ``v <- gamma*v - step*grad; x <- x + v`` (reference minimizer.py:5-65)."""
    v0 = jnp.zeros_like(x0)

    def update(v, i, dfdx):
        v = gamma * v - step * dfdx
        return v, v

    return _minimize_loop(v0, update, fcn, x0, params,
                          maxiter, f_tol, f_rtol, x_tol, x_rtol,
                          return_info=unused.get("return_info", False))


def adam(fcn: Callable, x0: jnp.ndarray, params=(), *,
         step: float = 1e-3,
         beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
         maxiter: int = 1000,
         f_tol: float = 0.0, f_rtol: float = 1e-8,
         x_tol: float = 0.0, x_rtol: float = 1e-8,
         verbose=False, **unused):
    """Adam (Kingma & Ba 2015) on the (f, grad) pair (reference :67-147)."""
    aux0 = (jnp.zeros_like(x0), jnp.zeros_like(x0))

    def update(aux, i, dfdx):
        m, v = aux
        m = beta1 * m + (1 - beta1) * dfdx
        v = beta2 * v + (1 - beta2) * dfdx ** 2
        t = (i + 1).astype(x0.dtype)
        mhat = m / (1 - beta1 ** t)
        vhat = v / (1 - beta2 ** t)
        dx = -step * mhat / (vhat ** 0.5 + eps)
        return (m, v), dx

    return _minimize_loop(aux0, update, fcn, x0, params,
                          maxiter, f_tol, f_rtol, x_tol, x_rtol,
                          return_info=unused.get("return_info", False))
