"""Adaptive Runge-Kutta (RK23 / RK45 Dormand-Prince).

TPU-native redesign of /root/reference/xitorch/_impls/integrate/ivp/
adaptive_rk.py:7-185.  The reference's nested Python accept/reject loops
(:82-125) cannot jit, vmap, or reverse-differentiate; here the whole
trajectory is ONE bounded ``lax.scan`` over a step budget where each slot
performs a single trial step (masked to a no-op once the trajectory is
finished).  Consequences:

* reverse-mode AD works (scan transposes; reference uses a continuous
  adjoint instead), and is exact w.r.t. the discrete solution;
* ``vmap`` works (an upgrade — the reference docstring explicitly says
  adaptive steps cannot be vmapped, solve_ivp.py:34-35);
* steps are clamped to land exactly on each output time (same stepping
  policy as the reference _single_step :88-125, including the
  previous-rejection factor clamp).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["rk23_adaptive", "rk45_adaptive"]

_RK23 = dict(
    order=2,
    C=np.array([0, 1 / 2, 3 / 4]),
    A=np.array([
        [0, 0, 0],
        [1 / 2, 0, 0],
        [0, 3 / 4, 0]]),
    B=np.array([2 / 9, 1 / 3, 4 / 9]),
    E=np.array([5 / 72, -1 / 12, -1 / 9, 1 / 8]),
)

_RK45 = dict(
    order=4,
    C=np.array([0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1]),
    A=np.array([
        [0, 0, 0, 0, 0],
        [1 / 5, 0, 0, 0, 0],
        [3 / 40, 9 / 40, 0, 0, 0],
        [44 / 45, -56 / 15, 32 / 9, 0, 0],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]]),
    B=np.array([35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
    E=np.array([-71 / 57600, 0, 71 / 16695, -71 / 1920, 17253 / 339200, -22 / 525,
                1 / 40]),
)


def _rk_adaptive(fcn: Callable, ts: jnp.ndarray, y0: jnp.ndarray,
                 params: Sequence, tbl: dict,
                 atol: float = 1e-8, rtol: float = 1e-5,
                 max_steps: int = 4096, remat: bool = True,
                 return_info: bool = False, **unused):
    """
    Keyword arguments
    -----------------
    atol, rtol: float
        Error tolerances for step-size control.
    max_steps: int
        Total trial-step budget for the whole trajectory (static).
    remat: bool
        Rematerialize each trial step in reverse mode (O(sqrt)-ish memory).
    return_info: bool
        Also return a jit-safe info pytree {"converged" (budget covered all
        output times), "iterations" (accepted steps), "rejected"}.
    """
    yshape = y0.shape
    y0f = y0.reshape(-1)
    n = y0f.size
    dtype = y0f.dtype
    nt = ts.shape[0]

    # handle decreasing ts by time reflection (reference setup :43-49)
    increasing = ts[-1] >= ts[0]
    sign = jnp.where(increasing, 1.0, -1.0).astype(ts.dtype)
    ts_n = ts * sign

    def func(t, yf):
        return fcn(t * sign, yf.reshape(yshape), *params).reshape(-1) * sign

    n_stages = tbl["C"].shape[0]
    A = jnp.asarray(tbl["A"], dtype=dtype)
    B = jnp.asarray(tbl["B"], dtype=dtype)
    C = jnp.asarray(tbl["C"], dtype=dtype)
    E = jnp.asarray(tbl["E"], dtype=dtype)
    err_exp = -1.0 / (tbl["order"] + 1.0)
    max_factor, min_factor, step_mult = 10.0, 0.2, 0.9

    def rk_step(t, y, f, h):
        K = jnp.zeros((n_stages + 1, n), dtype=dtype)
        K = K.at[0].set(f)
        for s in range(1, n_stages):
            # HIGHEST: stage combinations set the step error; TPU
            # bf16 would inject ~1e-2 noise into every step
            dy = jnp.tensordot(A[s, :s], K[:s], axes=1,
                               precision=jax.lax.Precision.HIGHEST) * h
            K = K.at[s].set(func(t + C[s] * h, y + dy))
        ynew = y + h * jnp.tensordot(B, K[:-1], axes=1,
                                     precision=jax.lax.Precision.HIGHEST)
        fnew = func(t + h, ynew)
        K = K.at[-1].set(fnew)
        # the step-size controller is a discrete control, not part of the
        # differentiable solution: block gradients (also avoids the NaN of
        # d/dx sqrt(x) at x=0 on exact-landing steps)
        err = lax.stop_gradient(jnp.tensordot(
            E, K, axes=1, precision=jax.lax.Precision.HIGHEST) * h)
        return ynew, fnew, jnp.sqrt(jnp.sum(err * err))

    if remat:
        rk_step = jax.checkpoint(rk_step)

    f0 = func(ts_n[0], y0f)
    h0 = ts_n[1] - ts_n[0]

    def body(carry, _):
        t, y, f, h, i, prev_rejected = carry
        done = i >= nt - 1
        t_target = ts_n[jnp.minimum(i + 1, nt - 1)]
        reach = t + h >= t_target
        hstep = jnp.where(reach, t_target - t, h)
        # finished trajectories: zero-length dummy steps keep every fcn
        # evaluation at t_final (inside the integration window) — a fixed
        # hstep=1.0 evaluated fcn beyond ts[-1], and any NaN there (e.g.
        # an interpolated drive with extrap="nan") poisons reverse-mode
        # gradients through the where-mask even though the primal is fine
        hstep = jnp.where(done, jnp.asarray(0.0, dtype=hstep.dtype), hstep)

        ynew, fnew, errnorm = rk_step(t, y, f, hstep)
        scale = lax.stop_gradient(
            atol + jnp.maximum(jnp.linalg.norm(y), jnp.linalg.norm(ynew)) * rtol)
        err = errnorm / scale
        accept = err < 1.0

        # step-size update (reference _single_step :107-122)
        err_safe = jnp.where(err == 0, 1e-30, err)
        factor_acc = jnp.minimum(max_factor, step_mult * err_safe ** err_exp)
        factor_acc = jnp.where(err == 0, max_factor, factor_acc)
        factor_acc = jnp.where(prev_rejected, jnp.minimum(1.0, factor_acc), factor_acc)
        factor_rej = jnp.maximum(min_factor, step_mult * err_safe ** err_exp)
        h_next = jnp.where(accept,
                           jnp.where(reach, h, h * factor_acc),
                           hstep * factor_rej)

        step_ok = accept & (~done)
        t_new = jnp.where(step_ok, t + hstep, t)
        y_new = jnp.where(step_ok, ynew, y)
        f_new = jnp.where(step_ok, fnew, f)
        reached = step_ok & reach
        i_new = jnp.where(reached, i + 1, i)
        carry_new = (t_new, y_new, f_new, jnp.where(done, h, h_next),
                     i_new, (~accept) & (~done))
        # emit output-time writes instead of carrying the yt buffer (keeps
        # reverse-mode memory at O(max_steps * n), not O(max_steps * nt * n))
        out = (reached, jnp.minimum(i + 1, nt - 1),
               jnp.where(reached, ynew, jnp.zeros_like(ynew)),
               step_ok, (~accept) & (~done))
        return carry_new, out

    carry0 = (ts_n[0], y0f, f0, h0, jnp.asarray(0), jnp.asarray(False))
    (tf, yf, ff, hf, i_fin, _), (wrote, idxs, yvals, acc_slots, rej_slots) = \
        lax.scan(body, carry0, None, length=max_steps)

    # scatter the recorded outputs: each output row is written at most once
    yt = jnp.zeros((nt, n), dtype=dtype)
    yt = yt.at[0].set(y0f)
    yt = yt.at[idxs].add(yvals * wrote[:, None].astype(dtype))
    # if the budget ran out, fill remaining outputs with the last state
    filled = jnp.arange(nt)[:, None] <= i_fin
    yt = jnp.where(filled, yt, yf[None, :])
    yt = yt.reshape(nt, *yshape)
    if return_info:
        info = {
            "converged": jnp.asarray(i_fin >= nt - 1, jnp.float32),
            "iterations": jnp.sum(acc_slots).astype(jnp.float32),
            "rejected": jnp.sum(rej_slots).astype(jnp.float32),
        }
        return yt, info
    return yt


def rk23_adaptive(fcn, ts, y0, params=(), **kwargs):
    """Adaptive Runge-Kutta of order 2(3) (Bogacki-Shampine)."""
    return _rk_adaptive(fcn, ts, y0, params, _RK23, **kwargs)


def rk45_adaptive(fcn, ts, y0, params=(), **kwargs):
    """Adaptive Runge-Kutta of order 4(5) (Dormand-Prince)."""
    return _rk_adaptive(fcn, ts, y0, params, _RK45, **kwargs)
