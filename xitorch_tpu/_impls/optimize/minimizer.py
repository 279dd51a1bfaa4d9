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

__all__ = ["gd", "adam", "lbfgs"]


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


def lbfgs(fcn: Callable, x0: jnp.ndarray, params=(), *,
          history: int = 10,
          maxiter: int = 500,
          max_ls: int = 20,
          c1: float = 1e-4,
          tau: float = 0.5,
          gtol: float = 1e-9,
          f_tol: float = 0.0, f_rtol: float = 1e-9,
          x_tol: float = 0.0, x_rtol: float = 1e-9,
          verbose=False, **unused):
    """Limited-memory BFGS with Armijo backtracking (beyond-reference
    method: the reference ships only gd/adam, minimizer.py:5-210).

    Fixed-capacity ring buffers hold the last ``history`` (s, y) pairs so
    the whole solver is one ``lax.while_loop`` with static shapes; the
    two-loop recursion runs as masked ``fori_loop``s over the ring.
    Curvature pairs with ``s.y <= 1e-10*|s||y|`` are skipped (standard
    safeguard).  Stopping: gradient norm < ``gtol``, or the gd/adam-style
    f/x OR-criteria.  Non-convergence returns the best-f iterate.
    """
    m = int(history)
    dtype = x0.dtype
    n = x0.size
    x0f = x0.reshape(-1)

    def eval_fg(x):
        f, g = fcn(x.reshape(x0.shape), *params)
        return f, g.reshape(-1)

    def _dot(a, b):
        return jnp.sum(a * b)

    def direction(g, S, Y, rho, head, cnt):
        # two-loop recursion; k-th most recent pair lives at
        # (head - 1 - k) % m, masked to identity beyond cnt
        def bwd(k, carry):
            q, alphas = carry
            idx = (head - 1 - k) % m
            valid = (k < cnt).astype(dtype)
            a = rho[idx] * _dot(S[idx], q) * valid
            return q - a * Y[idx], alphas.at[idx].set(a)

        q, alphas = lax.fori_loop(0, m, bwd, (g, jnp.zeros((m,), dtype)))
        newest = (head - 1) % m
        ynorm2 = _dot(Y[newest], Y[newest])
        gamma = jnp.where(cnt > 0,
                          1.0 / jnp.maximum(rho[newest] * ynorm2, 1e-30),
                          jnp.asarray(1.0, dtype))
        r = gamma * q

        def fwd(k2, r):
            k = m - 1 - k2                      # oldest -> newest
            idx = (head - 1 - k) % m
            valid = (k < cnt).astype(dtype)
            b = rho[idx] * _dot(Y[idx], r) * valid
            return r + S[idx] * (alphas[idx] - b)

        return -lax.fori_loop(0, m, fwd, r)

    def body_fun(state):
        x, f, g = state["x"], state["f"], state["g"]
        d = direction(g, state["S"], state["Y"], state["rho"],
                      state["head"], state["cnt"])
        gd_ = _dot(g, d)
        # safeguard: fall back to steepest descent on a non-descent d
        descent = gd_ < 0
        d = jnp.where(descent, d, -g)
        gd_ = jnp.where(descent, gd_, -_dot(g, g))

        # Armijo backtracking: first iteration opens at |g|-scaled step
        gnorm = jnp.sqrt(_dot(g, g))
        t0 = jnp.where(state["i"] == 0,
                       jnp.minimum(jnp.asarray(1.0, dtype),
                                   1.0 / jnp.maximum(gnorm, 1e-30)),
                       jnp.asarray(1.0, dtype))

        # carry both the next trial step and the step the current
        # (ft, gt) were evaluated at — on max_ls exhaustion the returned
        # point must be one that was actually evaluated, or the (s, y)
        # curvature pair and convergence tests use a stale gradient
        def ls_cond(c):
            j, t_next, t_eval, ft, gt, done = c
            return (~done) & (j < max_ls)

        def ls_body(c):
            j, t_next, _, _, _, _ = c
            ft, gt = eval_fg(x + t_next * d)
            ok = ft <= f + c1 * t_next * gd_
            return (j + 1, jnp.where(ok, t_next, t_next * tau), t_next,
                    ft, gt, ok)

        f0t, g0t = eval_fg(x + t0 * d)
        ok0 = f0t <= f + c1 * t0 * gd_
        _, _, t, f_new, g_new, _ = lax.while_loop(
            ls_cond, ls_body,
            (jnp.asarray(1), jnp.where(ok0, t0, t0 * tau), t0,
             f0t, g0t, ok0))
        x_new = x + t * d

        # curvature-guarded ring update
        s = x_new - x
        yv = g_new - g
        sy = _dot(s, yv)
        good = sy > 1e-10 * jnp.sqrt(_dot(s, s) * _dot(yv, yv) + 1e-300)
        head, cnt = state["head"], state["cnt"]
        S = jnp.where(good, state["S"].at[head % m].set(s), state["S"])
        Y = jnp.where(good, state["Y"].at[head % m].set(yv), state["Y"])
        rho = jnp.where(good,
                        state["rho"].at[head % m].set(
                            1.0 / jnp.where(good, sy, 1.0)),
                        state["rho"])
        head = (head + good.astype(head.dtype)) % m
        cnt = jnp.minimum(cnt + good.astype(cnt.dtype), m)

        dxnorm = _norm(s)
        df = jnp.abs(f - f_new)
        converge = ((dxnorm < x_tol) | (dxnorm < x_rtol * _norm(x))
                    | (df < f_tol) | (df < f_rtol * jnp.abs(f_new))
                    | (jnp.sqrt(_dot(g_new, g_new)) < gtol))

        better = f_new < state["best_f"]
        return {"x": x_new, "f": f_new, "g": g_new, "S": S, "Y": Y,
                "rho": rho, "head": head, "cnt": cnt,
                "i": state["i"] + 1, "stop": converge,
                "best_x": jnp.where(better, x_new, state["best_x"]),
                "best_f": jnp.where(better, f_new, state["best_f"])}

    def cond_fun(state):
        return (~state["stop"]) & (state["i"] < maxiter)

    f0, g0 = eval_fg(x0f)
    state0 = {"x": x0f, "f": f0, "g": g0,
              "S": jnp.zeros((m, n), dtype), "Y": jnp.zeros((m, n), dtype),
              "rho": jnp.zeros((m,), dtype),
              "head": jnp.asarray(0), "cnt": jnp.asarray(0),
              "i": jnp.asarray(0), "stop": jnp.asarray(maxiter == 0),
              "best_x": x0f, "best_f": f0}
    out = lax.while_loop(cond_fun, body_fun, state0)
    x_final = jnp.where(out["stop"], out["x"], out["best_x"]).reshape(x0.shape)
    if unused.get("return_info", False):
        info = {
            "converged": out["stop"].astype(jnp.float32),
            "iterations": out["i"].astype(jnp.float32),
            "best_fnorm": out["best_f"].astype(jnp.float32),
        }
        return x_final, info
    return x_final


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
