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

    eye_m = jnp.eye(msize, dtype=dtype)

    def _solve_spd_small(A, b):
        """Solve the batched (m, m) SPD system by UNROLLED pivot-free
        Gaussian elimination — XLA's batched small LU runs a slow custom
        call on TPU (measured 817 us vs 129 us per (512, 5, 5) batch for
        this unroll, the dominant cost of an anderson iteration).  SPD +
        the lmbda ridge keeps every pivot >= min(lmbda, 1), so no
        pivoting is needed; msize is static so the loops unroll."""
        Ab = jnp.concatenate([A, b[..., None]], axis=-1)   # (*B, m, m+1)
        for kk in range(msize):
            piv = Ab[..., kk:kk + 1, :] / Ab[..., kk:kk + 1, kk:kk + 1]
            mask = (jnp.arange(msize) > kk).astype(dtype)[:, None]
            Ab = Ab - mask * Ab[..., :, kk:kk + 1] * piv
        x = jnp.zeros_like(b)
        for kk in reversed(range(msize)):
            dot = jnp.einsum("...j,...j->...", Ab[..., kk, :msize], x)
            x = x.at[..., kk].set((Ab[..., kk, msize] - dot)
                                  / Ab[..., kk, kk])
        return x

    def step(k, xn, xcol, fcol):
        nsize = jnp.minimum(k, msize)
        active = (jnp.arange(msize) < nsize).astype(dtype)  # (m,)
        g = (fcol - xcol) * active[..., :, None]  # (*B, m, feat)
        # HIGHEST precision: a bf16 Gram of near-converged (small) residual
        # differences destroys the mixing weights on TPU (see CLAUDE.md)
        gram = einsum_hi("...nf,...mf->...nm", g, g)
        # constrained least squares min ||G alpha|| s.t. sum(alpha) = 1:
        # alpha = z / sum(z) with (G + lmbda I) z = 1_active — the SPD
        # reduction of the reference's bordered KKT system (identical
        # solution: the Lagrange multiplier is -1/sum(z)).  SPD lets the
        # solve run as an unrolled pivot-free elimination instead of
        # XLA's slow batched-small LU custom call.  Inactive history
        # slots get identity rows + zero rhs, so z (hence alpha) is
        # exactly zero there.
        act2 = active[:, None] * active[None, :]
        Greg = (gram * act2 + lmbda * eye_m * act2
                + eye_m * (1 - active))
        rhs = jnp.broadcast_to(active, (*batch_shape, msize))
        z = _solve_spd_small(Greg, rhs)                     # (*B, m)
        denom = jnp.sum(z, axis=-1, keepdims=True)
        # sum(z) = 1^T (G+lmbda I)^{-1} 1 > 0 strictly (SPD); the guard
        # only protects f32 underflow
        denom = jnp.where(jnp.abs(denom) < jnp.finfo(dtype).tiny * 16,
                          jnp.asarray(1.0, dtype), denom)
        alpha = (z / denom) * active
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
