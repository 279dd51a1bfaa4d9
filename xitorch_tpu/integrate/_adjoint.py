"""Continuous (backsolve) adjoint for solve_ivp.

Implements the reference's O(1)-memory backward (_SolveIVP.backward,
/root/reference/xitorch/integrate/solve_ivp.py:128-251): integrate the
augmented state [y, a = dL/dy, dL/dθ] backwards in time segment-by-segment
between output times, re-injecting the incoming cotangent at each output
time, with the SAME solver.

Trade-offs vs the default (reverse-AD through the solver scan):
memory O(state) instead of O(steps), but gradients are only approximate
w.r.t. the discretized forward solution, and — like the reference before
its recursive trick — this custom_vjp path supports FIRST-order reverse
differentiation only (use the default adjoint for grad-of-grad).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["backsolve_ivp"]


def backsolve_ivp(solver: Callable, fcn: Callable, ts: jnp.ndarray,
                  y0: jnp.ndarray, dynparams, **options):
    """Run ``solver(fcn, ts, y0, params)`` forward; backward via the
    continuous adjoint.  y0 must be a flat array; dynparams a pytree."""

    @jax.custom_vjp
    def _run(ts, y0, dynparams):
        return solver(fcn, ts, y0, tuple(dynparams), **options)

    def _run_fwd(ts, y0, dynparams):
        yt = _run(ts, y0, dynparams)
        return yt, (ts, yt, dynparams)

    def _run_bwd(res, grad_yt):
        ts, yt, dynparams = res
        nt = ts.shape[0]
        pflat, punravel = jax.flatten_util.ravel_pytree(dynparams)
        ny = yt.shape[-1]
        npar = pflat.shape[0]

        # augmented dynamics on s = [y (ny), a (ny), gp (npar)], integrated
        # backwards through the solver's decreasing-ts support
        def aug(t, s):
            y = s[:ny]
            a = s[ny:2 * ny]

            def g(yy, pf):
                return fcn(t, yy, *punravel(pf))

            f, vjp_fn = jax.vjp(g, y, pflat)
            aty, atp = vjp_fn(a)
            return jnp.concatenate([f, -aty, -atp])

        def seg(carry, i):
            # integrate from ts[i+1] down to ts[i]
            a, gp = carry
            a = a + grad_yt[i + 1]
            s0 = jnp.concatenate([yt[i + 1], a, gp])
            ts_seg = jnp.stack([ts[i + 1], ts[i]])
            out = solver(lambda t, s: aug(t, s), ts_seg, s0, (), **options)
            s1 = out[-1]
            return (s1[ny:2 * ny], s1[2 * ny:]), None

        a0 = jnp.zeros((ny,), dtype=yt.dtype)
        gp0 = jnp.zeros((npar,), dtype=yt.dtype)
        (a_fin, gp_fin), _ = lax.scan(seg, (a0, gp0),
                                      jnp.arange(nt - 2, -1, -1))
        grad_y0 = a_fin + grad_yt[0]

        # ts gradients: dL/dts[i] = <grad_yt[i], f(ts[i], y_i)> for i>0
        # (sampling-time sensitivity).  For ts[0], shifting the start time
        # with the same y0 perturbs the whole trajectory by
        # -Phi(t_i, t0) f(t0, y0), so dL/dts[0] = -<a(t0), f(t0, y0)> with
        # a(t0) the fully back-integrated adjoint (a_fin, BEFORE the
        # grad_yt[0] injection — the ts[0] output equals y0 and does not
        # move with ts[0]).  Equivalent to the reference's augmented dL/dt
        # slot (/root/reference/xitorch/integrate/solve_ivp.py:171-199,
        # 219-247) but evaluated at the endpoint; exact for non-autonomous
        # fcn too (the old -sum(grad_ts[1:]) shortcut was autonomous-only).
        def dldt(i):
            return jnp.dot(fcn(ts[i], yt[i], *dynparams).reshape(-1),
                           grad_yt[i].reshape(-1))

        grad_ts = jax.vmap(dldt)(jnp.arange(nt))
        f_t0 = fcn(ts[0], yt[0], *dynparams).reshape(-1)
        grad_ts = grad_ts.at[0].set(-jnp.dot(f_t0, a_fin.reshape(-1)))

        return grad_ts, grad_y0, punravel(gp_fin)

    _run.defvjp(_run_fwd, _run_bwd)
    return _run(ts, y0, tuple(dynparams))
