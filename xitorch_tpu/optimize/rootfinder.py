"""rootfinder / equilibrium / minimize with implicit-function-theorem
gradients.

API parity with /root/reference/xitorch/optimize/rootfinder.py:35-288.  The
autograd adapter (_RootFinder :290-366) is replaced by a ``jax.custom_jvp``:

* forward: the selected solver (broyden1/2, newton, linearmixing,
  anderson_acc, gd, adam) runs as a gradient-blocked ``lax.while_loop``;
* JVP: ``dy = -J_y^{-1} (∂f/∂θ) dθ`` solved with ``xitorch_tpu.linalg.solve``
  on the matrix-free Jacobian (``grad.jac``) — reverse mode then *transposes*
  this linear rule, reproducing the reference's ``solve(J^H, -grad_y)``
  backward (:346-348) automatically, and remaining differentiable at any
  order (gradgradcheck parity without ``create_graph`` plumbing).
* hidden state of the callable (e.g. flax module params captured in a
  closure, or outer-grad tracers) is hoisted into explicit parameters by
  ``jax.closure_convert`` — the JAX-native PureFunction/EditableModule.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from xitorch_tpu._impls.optimize.equilibrium import anderson_acc
from xitorch_tpu._impls.optimize.minimizer import adam, gd, lbfgs
from xitorch_tpu._impls.optimize.rootsolver import (
    broyden1, broyden2, linearmixing, newton,
)
from xitorch_tpu.debug.modes import is_debug_enabled
from xitorch_tpu.grad.jachess import jac
from xitorch_tpu.linalg.solve import solve
from xitorch_tpu.utils.assertfuncs import assert_fcn_params
from xitorch_tpu.utils.misc import get_method

__all__ = ["rootfinder", "equilibrium", "minimize"]

_RF_METHODS = {
    "newton": newton,
    "broyden1": broyden1,
    "broyden2": broyden2,
    "linearmixing": linearmixing,
}

_EQUIL_METHODS = {
    "anderson_acc": anderson_acc,
}

_OPT_METHODS = {
    "gd": gd,
    "adam": adam,
    "lbfgs": lbfgs,
}


def _is_dynamic(p) -> bool:
    if isinstance(p, (float, complex)):
        return True
    if isinstance(p, (jax.Array, np.ndarray)) or hasattr(p, "aval"):
        return True
    return False


def _partition_params(params: Sequence[Any]):
    """Split params into traced arrays (dynamic) and static python objects,
    with a merge function restoring original order.  JAX-native analog of the
    reference's TensorNonTensorSeparator (misc.py:45-95)."""
    dyn = []
    layout = []
    static = []
    for p in params:
        if _is_dynamic(p):
            layout.append(("d", len(dyn)))
            dyn.append(p)
        else:
            layout.append(("s", len(static)))
            static.append(p)

    def merge(dynparams):
        return tuple(dynparams[i] if kind == "d" else static[i]
                     for kind, i in layout)

    return tuple(dyn), merge


def _implicit_rootsolve(res_fcn: Callable, run_solver: Callable,
                        y0, dynparams, merge, bck_options: Mapping[str, Any],
                        has_info: bool = False, hermitian: bool = False):
    """Run ``run_solver`` forward; differentiate implicitly through the root
    condition ``res_fcn(y*, *params) = 0``.  With ``has_info`` the solver
    returns ``(y, info)`` and info gets zero tangents (jit-safe convergence
    reporting, SURVEY §5).  ``hermitian`` declares the residual Jacobian
    symmetric (minimize: it is the Hessian), letting the backward solve use
    hermitian-only methods (cg / mixed-precision cg_ir) from bck_options."""
    bck_cfg = dict(bck_options)

    @jax.custom_jvp
    def _solve_root(y0, dynparams):
        return run_solver(y0, merge(dynparams))

    @_solve_root.defjvp
    def _solve_root_jvp(primals, tangents):
        y0, dynparams = primals
        _, ddyn = tangents
        out = _solve_root(y0, dynparams)
        ystar = out[0] if has_info else out

        # rhs = (∂f/∂θ) dθ at the solution
        def f_of_params(dp):
            return res_fcn(ystar, *merge(dp))

        _, rhs = jax.jvp(f_of_params, (dynparams,), (ddyn,))

        # solve J dy = -rhs with the matrix-free Jacobian at (y*, θ)
        jlinop = jac(lambda y, *dp: res_fcn(y, *merge(dp)),
                     (ystar, *dynparams), idxs=0, is_hermitian=hermitian)
        dy = solve(jlinop, -rhs.reshape(-1, 1), bck_options=bck_cfg, **bck_cfg)
        dy = dy.reshape(ystar.shape)
        if has_info:
            info = out[1]
            dinfo = jax.tree_util.tree_map(jnp.zeros_like, info)
            return (ystar, info), (dy, dinfo)
        return ystar, dy

    return _solve_root(y0, dynparams)


def _prepare(fcn, y0, params):
    """closure-convert fcn so hidden array state becomes explicit params."""
    dynparams, merge = _partition_params(params)

    def fcn_dyn(y, *dp):
        return fcn(y, *merge(dp))

    converted, consts = jax.closure_convert(fcn_dyn, y0, *dynparams)
    return converted, (*dynparams, *consts)


def rootfinder(fcn: Callable, y0: jnp.ndarray,
               params: Sequence[Any] = (),
               bck_options: Mapping[str, Any] = {},
               method: Union[str, Callable, None] = None,
               **fwd_options) -> jnp.ndarray:
    r"""Solve :math:`\mathbf{0} = \mathbf{f}(\mathbf{y}, \theta)`.

    Parity: reference rootfinder.py:35-102.  ``fcn(y, *params) -> (*ny)``;
    returns ``y`` of shape ``(*ny)`` with implicit 1st/2nd-order gradients.
    Methods: "broyden1" (default), "broyden2", "newton", "linearmixing", or
    a custom callable ``(fcn, x0, params, **cfg) -> x``.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from xitorch_tpu.optimize import rootfinder
    >>> y = rootfinder(lambda y, a: y ** 3 + 2 * y - a, jnp.array([0.0]),
    ...                params=(jnp.array([3.0]),))
    >>> bool(jnp.abs(y[0] - 1.0) < 1e-6)
    True
    """
    if method is None:
        method = "broyden1"
    if is_debug_enabled():
        # debug-gated validation (reference rootfinder.py:96-97): the root
        # residual must evaluate and have y0's structure
        assert_fcn_params(fcn, (y0, *params), what="rootfinder fcn",
                          expect_like=y0)
    pfcn, alldyn = _prepare(fcn, y0, params)
    method_fcn = get_method("rootfinder", _RF_METHODS, method)

    def run_solver(y0_, ps):
        return method_fcn(pfcn, y0_, ps, **fwd_options)

    return _implicit_rootsolve(pfcn, run_solver, y0, alldyn,
                               lambda dp: tuple(dp), bck_options,
                               has_info=bool(fwd_options.get("return_info")))


def equilibrium(fcn: Callable, y0: jnp.ndarray,
                params: Sequence[Any] = (),
                bck_options: Mapping[str, Any] = {},
                method: Union[str, Callable, None] = None,
                **fwd_options) -> jnp.ndarray:
    r"""Solve the fixed point :math:`\mathbf{y} = \mathbf{f}(\mathbf{y},\theta)`.

    Parity: reference rootfinder.py:104-184.  Implemented as the root of
    ``g(y) = y - f(y)``; "anderson_acc" (and custom equilibrium methods)
    iterate on ``f`` directly.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from xitorch_tpu.optimize import equilibrium
    >>> y = equilibrium(lambda y: 0.5 * (y + 2.0 / y), jnp.array([1.0]))
    >>> bool(jnp.abs(y[0] - jnp.sqrt(2.0)) < 1e-6)
    True
    """
    if method is None:
        method = "broyden1"
    if is_debug_enabled():
        assert_fcn_params(fcn, (y0, *params), what="equilibrium fcn",
                          expect_like=y0)
    pfcn, alldyn = _prepare(fcn, y0, params)

    def res_fcn(y, *ps):
        return y - pfcn(y, *ps)

    in_equil = isinstance(method, str) and method.lower() in _EQUIL_METHODS
    if in_equil:
        method_fcn = get_method("equilibrium", _EQUIL_METHODS, method)
        fwd_fcn = pfcn
    else:
        method_fcn = get_method("rootfinder", _RF_METHODS, method)
        fwd_fcn = res_fcn

    def run_solver(y0_, ps):
        return method_fcn(fwd_fcn, y0_, ps, **fwd_options)

    return _implicit_rootsolve(res_fcn, run_solver, y0, alldyn,
                               lambda dp: tuple(dp), bck_options,
                               has_info=bool(fwd_options.get("return_info")))


def minimize(fcn: Callable, y0: jnp.ndarray,
             params: Sequence[Any] = (),
             bck_options: Mapping[str, Any] = {},
             method: Union[str, Callable, None] = None,
             **fwd_options) -> jnp.ndarray:
    r"""Solve :math:`\mathbf{y^*} = \arg\min_y f(\mathbf{y},\theta)`
    (unbounded).

    Parity: reference rootfinder.py:186-288.  Rootfinder methods run on
    ``∇_y f``; optimizer methods ("gd", "adam") receive ``(f, ∇_y f)`` pairs.
    Implicit gradients come from the stationarity condition ``∇_y f = 0``
    (so second-order solves use the Hessian LinearOperator).

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from xitorch_tpu.optimize import minimize
    >>> y = minimize(lambda y, a: jnp.sum((y - a) ** 2), jnp.zeros(2),
    ...              params=(jnp.array([1.0, -2.0]),))
    >>> bool(jnp.max(jnp.abs(y - jnp.array([1.0, -2.0]))) < 1e-6)
    True
    """
    if jnp.issubdtype(jnp.asarray(y0).dtype, jnp.complexfloating):
        raise AssertionError(
            "complex y0 is not supported in minimize (parity with reference)")
    if method is None:
        method = "broyden1"
    if is_debug_enabled():
        assert_fcn_params(fcn, (y0, *params), what="minimize fcn")
    pfcn, alldyn = _prepare(fcn, y0, params)

    def scalar_fcn(y, *ps):
        out = pfcn(y, *ps)
        if hasattr(out, "size") and out.size != 1:
            # parity with the reference: autograd.grad there errors on
            # non-scalar objectives — silently summing would optimize an
            # unintended total
            raise RuntimeError(
                "minimize fcn must return a scalar (got shape %s)"
                % (out.shape,))
        return out.sum()

    def grad_fcn(y, *ps):
        return jax.grad(scalar_fcn)(y, *ps)

    def value_grad_fcn(y, *ps):
        return jax.value_and_grad(scalar_fcn)(y, *ps)

    is_opt = isinstance(method, str) and method.lower() in _OPT_METHODS
    if is_opt:
        method_fcn = get_method("minimizer", _OPT_METHODS, method)
        fwd_fcn = value_grad_fcn
    else:
        method_fcn = get_method("rootfinder", _RF_METHODS, method)
        fwd_fcn = grad_fcn

    def run_solver(y0_, ps):
        return method_fcn(fwd_fcn, y0_, ps, **fwd_options)

    return _implicit_rootsolve(grad_fcn, run_solver, y0, alldyn,
                               lambda dp: tuple(dp), bck_options,
                               has_info=bool(fwd_options.get("return_info")),
                               hermitian=True)


# docstring completion (parity: reference rootfinder.py:388-393)
from xitorch_tpu._docstr.api_docstr import get_methods_docstr  # noqa: E402

rootfinder.__doc__ = get_methods_docstr(rootfinder, _RF_METHODS)
equilibrium.__doc__ = get_methods_docstr(equilibrium, {**_RF_METHODS, **_EQUIL_METHODS})
minimize.__doc__ = get_methods_docstr(minimize, {**_RF_METHODS, **_OPT_METHODS})
