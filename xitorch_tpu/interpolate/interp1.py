"""Interp1D: differentiable 1-D interpolation (API layer).

Parity with /root/reference/xitorch/interpolate/interp1.py:11-86: sorts
unsorted inputs, dispatches to cubic-spline or linear kernels, callable with
``xq`` (and ``y`` if not given at construction).  Registered as a pytree so
instances pass through jit/vmap.
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from xitorch_tpu._impls.interpolate.interp_1d import (
    CubicSpline1D, LinearInterp1D, Pchip1D,
)
from xitorch_tpu.utils.misc import get_method

__all__ = ["Interp1D"]

_INTERP1_METHODS = {
    "cspline": CubicSpline1D,
    "pchip": Pchip1D,
    "linear": LinearInterp1D,
}


class Interp1D:
    """1-D interpolation of ``y`` sampled at ``x`` (last dimension).

    Arguments
    ---------
    x: (*BX, nr) positions (sorted along the last dim or sortable).
    y: (*BY, nr) values, or None to supply at call time.
    method: "cspline" (default; options bc_type, extrap), "pchip"
        (monotone cubic, beyond-reference), or "linear"
        (option extrap), or a custom class.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from xitorch_tpu.interpolate import Interp1D
    >>> x = jnp.linspace(0.0, 1.0, 16)
    >>> f = Interp1D(x, jnp.sin(3 * x))
    >>> bool(jnp.abs(f(jnp.array([0.45]))[0] - jnp.sin(jnp.array(1.35))) < 1e-4)
    True
    """

    def __init__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                 method: Union[str, Callable, None] = None, **fwd_options):
        if method is None:
            method = "cspline"
        clss = get_method("Interp1D", _INTERP1_METHODS, method)

        # sort if needed (parity: interp1.py:51-59); under tracing we sort
        # unconditionally to stay shape-static
        try:
            is_sorted = bool(jnp.all(x[..., 1:] >= x[..., :-1]))
        except jax.errors.TracerBoolConversionError:
            is_sorted = False
        self._sort_idx = None
        if not is_sorted:
            idx = jnp.argsort(x, axis=-1)
            x = jnp.take_along_axis(x, idx, axis=-1)
            # keep the permutation: call-time y must be gathered the same
            # way (reference interp1.py stores self.idx for __call__)
            self._sort_idx = idx
            if y is not None:
                y = self._permute_y(y)

        self.obj = clss(x, y, **fwd_options)

    def _permute_y(self, y):
        idx = self._sort_idx
        yb = jnp.broadcast_to(y, jnp.broadcast_shapes(y.shape, idx.shape))
        idxb = jnp.broadcast_to(idx, yb.shape)
        return jnp.take_along_axis(yb, idxb, axis=-1)

    def __call__(self, xq: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Interpolate at query points xq (*BX, nrq) -> (*BXY, nrq)."""
        if y is not None and self._sort_idx is not None:
            y = self._permute_y(y)
        return self.obj(xq, y)


def _interp_flatten(s):
    d = s.obj.__dict__
    dyn_keys = tuple(sorted(k for k, v in d.items()
                            if isinstance(v, jax.Array) or hasattr(v, "aval")))
    static = tuple(sorted((k, v) for k, v in d.items() if k not in dyn_keys
                          and not isinstance(v, jax.Array)))
    # the wrapper's sort permutation (for call-time y) rides as an extra
    # child so it survives jit/vmap boundaries
    children = tuple(d[k] for k in dyn_keys) + (s._sort_idx,)
    return children, (type(s.obj), dyn_keys, static)


def _interp_unflatten(aux, children):
    objcls, dyn_keys, static = aux
    obj = object.__new__(objcls)
    for k, v in static:
        setattr(obj, k, v)
    for k, v in zip(dyn_keys, children[:-1]):
        setattr(obj, k, v)
    s = object.__new__(Interp1D)
    s.obj = obj
    s._sort_idx = children[-1]
    return s


jax.tree_util.register_pytree_node(Interp1D, _interp_flatten, _interp_unflatten)
