"""Initial value problem (ODE) solver.

API parity with /root/reference/xitorch/integrate/solve_ivp.py:16-95.
Gradient strategy differs from the reference by design:

* The reference implements a continuous (backsolve) adjoint
  (_SolveIVP.backward :128-251) because torch cannot differentiate through
  its Python solver loops.  Here every solver is a ``lax.scan`` (fixed-step)
  or bounded scan (adaptive), so **plain reverse-mode AD through the solver
  is exact w.r.t. the discrete solution**, twice differentiable, vmappable,
  and memory-bounded via rematerialization (``remat=True`` on the adaptive
  solvers by default, opt-in for fixed-step).
* ``y0`` may be a pytree (the reference's tuple-y0 TensorPacker plumbing
  :76-93 is free here); adaptive methods flatten internally.

Methods: "rk45" (default), "rk23" (adaptive, options atol/rtol/max_steps),
"rk4", "rk38", "mid_point", "euler" (fixed-step explicit), "bwd_euler",
"trapezoidal", "sdirk2" (fixed-step implicit, A/L-stable for stiff
systems — beyond-reference), or a custom callable ``(fcn, ts, y0, params, **cfg)``.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence, Union

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from xitorch_tpu._impls.integrate.adaptive_rk import rk23_adaptive, rk45_adaptive
from xitorch_tpu._impls.integrate.explicit_rk import (
    fwd_euler_ivp, mid_point_ivp, rk38_ivp, rk4_ivp,
)
from xitorch_tpu._impls.integrate.implicit_rk import (
    bwd_euler_ivp, sdirk2_ivp, trapezoidal_ivp,
)
from xitorch_tpu.utils.misc import get_method

__all__ = ["solve_ivp"]

_IVP_METHODS = {
    "rk45": rk45_adaptive,
    "rk23": rk23_adaptive,
    "rk4": rk4_ivp,
    "rk38": rk38_ivp,
    "mid_point": mid_point_ivp,
    "euler": fwd_euler_ivp,
    "bwd_euler": bwd_euler_ivp,
    "trapezoidal": trapezoidal_ivp,
    "sdirk2": sdirk2_ivp,
}

_ADAPTIVE = {"rk45", "rk23"}


def solve_ivp(fcn: Callable, ts: jnp.ndarray, y0,
              params: Sequence[Any] = (),
              bck_options: Mapping[str, Any] = {},
              method: Union[str, Callable, None] = None,
              adjoint: str = "autodiff",
              return_info: bool = False,
              **fwd_options):
    r"""Solve dy/dt = fcn(t, y, *params) from y(ts[0]) = y0, returning y at
    every t in ``ts`` with shape ``(nt, *ny)`` (pytree leaves gain a leading
    nt).  ``ts`` must be monotonic (1D).

    adjoint: "autodiff" (default — reverse-AD through the solver: exact
    w.r.t. the discrete solution, any order, vmappable) or "backsolve"
    (the reference's continuous adjoint: O(1) memory, 1st order only).

    With ``return_info=True`` (autodiff adjoint only), returns
    ``(yt, info)`` where info is a jit-safe pytree: for adaptive methods
    ``{"converged"`` (step budget covered all output times),
    ``"iterations"`` (accepted steps), ``"rejected"}``; trivially complete
    for fixed-step methods.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from xitorch_tpu.integrate import solve_ivp
    >>> ts = jnp.linspace(0.0, 1.0, 5)
    >>> yt = solve_ivp(lambda t, y, a: -a * y, ts, jnp.array([1.0]),
    ...                params=(jnp.array(2.0),))
    >>> bool(jnp.max(jnp.abs(yt[:, 0] - jnp.exp(-2.0 * ts))) < 1e-5)
    True
    """
    if ts.ndim != 1:
        raise RuntimeError("Argument ts must be a 1D tensor")
    if method is None:
        method = "rk45"
    from xitorch_tpu.debug.modes import is_debug_enabled
    if is_debug_enabled():
        from xitorch_tpu.utils.assertfuncs import assert_fcn_params
        assert_fcn_params(fcn, (ts[0], y0, *params), what="solve_ivp fcn",
                          expect_like=y0)
    solver = get_method("solve_ivp", _IVP_METHODS, method)

    if return_info and adjoint != "autodiff":
        raise RuntimeError(
            "return_info=True requires adjoint='autodiff'")
    if adjoint == "backsolve":
        from xitorch_tpu.integrate._adjoint import backsolve_ivp
        from xitorch_tpu.optimize.rootfinder import _partition_params

        dynparams, merge = _partition_params(params)
        y0flat, unravel = ravel_pytree(y0)

        def fcn_flat(t, yf, *dp):
            dy = fcn(t, unravel(yf), *merge(dp))
            return ravel_pytree(dy)[0]

        ytflat = backsolve_ivp(solver, fcn_flat, ts, y0flat, dynparams,
                               **fwd_options)
        return jax.vmap(unravel)(ytflat)
    if adjoint != "autodiff":
        raise RuntimeError("Unknown adjoint mode: %s" % adjoint)

    is_adaptive = isinstance(method, str) and method in _ADAPTIVE
    if return_info and is_adaptive:
        fwd_options = dict(fwd_options, return_info=True)

    is_pytree = not hasattr(y0, "shape")
    if is_adaptive and is_pytree:
        # adaptive kernels work on flat arrays; ravel the pytree through
        y0flat, unravel = ravel_pytree(y0)

        def fcn_flat(t, yf, *params):
            dy = fcn(t, unravel(yf), *params)
            return ravel_pytree(dy)[0]

        out = solver(fcn_flat, ts, y0flat, params, **fwd_options)
        ytflat, info = out if return_info else (out, None)
        yt = jax.vmap(unravel)(ytflat)
        return (yt, info) if return_info else yt

    out = solver(fcn, ts, y0, params, **fwd_options)
    if return_info and not is_adaptive:
        # fixed-step (or custom) methods take exactly nt-1 deterministic steps
        info = {"converged": jnp.asarray(1.0, jnp.float32),
                "iterations": jnp.asarray(ts.shape[0] - 1, jnp.float32),
                "rejected": jnp.asarray(0.0, jnp.float32)}
        return out, info
    return out


# docstring completion
from xitorch_tpu._docstr.api_docstr import get_methods_docstr  # noqa: E402

solve_ivp.__doc__ = get_methods_docstr(solve_ivp, _IVP_METHODS)
