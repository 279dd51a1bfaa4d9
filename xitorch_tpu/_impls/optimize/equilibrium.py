"""Anderson acceleration for fixed-point problems.

TPU-native redesign of /root/reference/xitorch/_impls/optimize/
equilibrium.py:9-134: natively batched (leading batch dims preserved),
fixed-size ``msize`` history buffers carried through one ``lax.while_loop``,
with the regularized Gram system padded to static shape (inactive history
slots get identity rows) so early iterations reuse the same compiled solve.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
from jax import lax

from xitorch_tpu._impls.optimize.rootsolver import TerminationCondition, _norm
from xitorch_tpu.utils.tensor import einsum_hi

__all__ = ["anderson_acc"]


def anderson_acc(fcn: Callable, x0: jnp.ndarray, params=(),
                 feat_ndims: int = 1,
                 msize: int = 5,
                 beta: float = 1.0,
                 lmbda: float = 1e-4,
                 maxiter=None, f_tol=None, f_rtol=None, x_tol=None, x_rtol=None,
                 custom_terminator=None,
                 verbose: bool = False,
                 return_info: bool = False,
                 **unused) -> jnp.ndarray:
    """Solve x = fcn(x, *params) by Anderson acceleration (Walker & Ni).

    Keyword arguments (parity with reference anderson_acc :9-53):
    feat_ndims: number of trailing feature dims (the rest are batch).
    msize: history length; beta: damping; lmbda: Gram regularizer.
    f_* / x_*: stopping tolerances on ``f - x`` and the step.
    """
    featshape = x0.shape[x0.ndim - feat_ndims:]
    batch_shape = x0.shape[:x0.ndim - feat_ndims]
    feat_size = int(math.prod(featshape))
    dtype = x0.dtype

    if maxiter is None:
        maxiter = 100 * (feat_size + 1)

    def _ravel(x):
        return x.reshape(*batch_shape, feat_size)

    def _unravel(xn):
        return xn.reshape(*batch_shape, *featshape)

    def _fcn(xn):
        return _ravel(fcn(_unravel(xn), *params))

    xn = _ravel(x0)
    fn = _fcn(xn)
    xcol = jnp.zeros((*batch_shape, msize, feat_size), dtype=dtype)
    fcol = jnp.zeros((*batch_shape, msize, feat_size), dtype=dtype)
    xcol = xcol.at[..., 0, :].set(xn)
    fcol = fcol.at[..., 0, :].set(fn)
    xn1 = fn
    fn1 = _fcn(xn1)
    xcol = xcol.at[..., 1, :].set(xn1)
    fcol = fcol.at[..., 1, :].set(fn1)

    devnorm = _norm(fn1 - xn1)
    stop_cond = custom_terminator if custom_terminator is not None \
        else TerminationCondition(f_tol, f_rtol, devnorm, x_tol, x_rtol)

    eye_m1 = jnp.eye(msize + 1, dtype=dtype)

    def step(k, xn, xcol, fcol):
        nsize = jnp.minimum(k, msize)
        active = (jnp.arange(msize) < nsize).astype(dtype)  # (m,)
        g = (fcol - xcol) * active[..., :, None]  # (*B, m, feat)
        # HIGHEST precision: a bf16 Gram of near-converged (small) residual
        # differences destroys the mixing weights on TPU (see CLAUDE.md)
        gram = einsum_hi("...nf,...mf->...nm", g, g)
        # bordered system: [[0, 1_act^T], [1_act, G + lmbda I]] alpha' = e0
        hmat = jnp.zeros((*batch_shape, msize + 1, msize + 1), dtype=dtype)
        hmat = hmat.at[..., 0, 1:].set(active)
        hmat = hmat.at[..., 1:, 0].set(active)
        hmat = hmat.at[..., 1:, 1:].set(
            gram + lmbda * jnp.eye(msize, dtype=dtype) * active[:, None] * active[None, :])
        # inactive rows/cols -> identity so the solve stays well-posed
        inact = jnp.concatenate([jnp.zeros((1,), dtype), 1 - active])
        hmat = hmat + eye_m1 * inact
        y = jnp.zeros((*batch_shape, msize + 1, 1), dtype=dtype)
        y = y.at[..., 0, :].set(1.0)
        alpha = jnp.linalg.solve(hmat, y)[..., 1:, 0]  # (*B, m)
        alpha = alpha * active
        xnew = (einsum_hi("...n,...nf->...f", alpha, fcol) * beta
                + einsum_hi("...n,...nf->...f", alpha, xcol) * (1 - beta))
        fnew = _fcn(xnew)
        slot = k % msize
        xcol = xcol.at[..., slot, :].set(xnew)
        fcol = fcol.at[..., slot, :].set(fnew)
        return xnew, fnew, xcol, fcol

    def cond_fun(state):
        k, xn, xcol, fcol, stop, best_x, best_dev = state
        return (~stop) & (k < maxiter)

    def body_fun(state):
        k, xn, xcol, fcol, _, best_x, best_dev = state
        xnew, fnew, xcol, fcol = step(k, xn, xcol, fcol)
        stop = stop_cond.check(xnew, fnew - xnew, xnew - xn)
        # best-iterate tracking (repo solver invariant): aggressive mixing
        # can diverge after passing near the fixed point — return the
        # best deviation seen, never a diverged final iterate
        dev = _norm(fnew - xnew)
        better = dev < best_dev
        best_x = jnp.where(better, xnew, best_x)
        best_dev = jnp.where(better, dev, best_dev)
        return (k + 1, xnew, xcol, fcol, stop, best_x, best_dev)

    state0 = (jnp.asarray(2), xn1, xcol, fcol, devnorm == 0, xn1, devnorm)
    out = lax.while_loop(cond_fun, body_fun, state0)
    kfin, stop, best_x, best_dev = out[0], out[4], out[5], out[6]
    if return_info:
        info = {
            "converged": stop.astype(jnp.float32),
            "iterations": kfin.astype(jnp.float32),
            "best_fnorm": best_dev.astype(jnp.float32),
        }
        return _unravel(best_x), info
    return _unravel(best_x)
