"""SQuad: quadrature of fixed samples (cumulative and full integration).

API parity with /root/reference/xitorch/integrate/squad.py:10-113.  The
object precomputes (nx, nx) weight matrices at construction; cumsum /
integrate are then pure einsums (MXU-friendly), differentiable through both
the samples y and the positions x.  Registered as a pytree so it can cross
jit boundaries.
"""
from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from xitorch_tpu._impls.integrate.samples_quad import (
    CubicSplineSQuad, SimpsonSQuad, TrapzSQuad,
)
from xitorch_tpu.utils.misc import get_method

__all__ = ["SQuad"]

_SQUAD_METHODS = {
    "cspline": CubicSplineSQuad,
    "simpson": SimpsonSQuad,
    "trapz": TrapzSQuad,
}


class SQuad:
    r"""Sampled QUADrature: :math:`\mathbf{z}(x) = \int_{x_0}^{x}
    \mathbf{y}(x')\,dx'` where y is interpolated from samples at ``x``.

    Arguments
    ---------
    x: (nx,) sample positions (1D).
    method: "cspline" (default; option bc_type), "simpson", "trapz", or a
        custom class with (x, **options) -> object with cumsum/integrate.
    """

    def __init__(self, x: jnp.ndarray, method: Union[str, Callable, None] = None,
                 **fwd_options):
        if method is None:
            method = "cspline"
        if x.ndim != 1:
            raise RuntimeError("The input x to SQuad must be a 1D tensor")
        clss = get_method("SQuad", _SQUAD_METHODS, method)
        self.obj = clss(x, **fwd_options)
        self.nx = x.shape[-1]

    def cumsum(self, y: jnp.ndarray, dim: int = -1) -> jnp.ndarray:
        """Cumulative integration of samples ``y`` along ``dim``."""
        swap = dim not in (-1, y.ndim - 1)
        if swap:
            y = jnp.swapaxes(y, dim, -1)
        if y.shape[-1] != self.nx:
            raise RuntimeError(
                "The length of integrated dimension does not match with x")
        res = self.obj.cumsum(y)
        if swap:
            res = jnp.swapaxes(res, dim, -1)
        return res

    def integrate(self, y: jnp.ndarray, dim: int = -1,
                  keepdim: bool = False) -> jnp.ndarray:
        """Full integration of samples ``y`` along ``dim``."""
        swap = dim not in (-1, y.ndim - 1)
        if swap:
            y = jnp.swapaxes(y, dim, -1)
        if y.shape[-1] != self.nx:
            raise RuntimeError(
                "The length of integrated dimension does not match with x")
        res = self.obj.integrate(y)
        if keepdim:
            res = res[..., None]
            if swap:
                res = jnp.swapaxes(res, dim, -1)
        elif swap:
            # the former last axis was parked at position ``dim`` by the
            # swap; after the reduction it must move back to the end, or
            # the result comes out axis-permuted (reference squad.py applies
            # the back-transpose for both keepdim values)
            d = dim % (res.ndim + 1)
            res = jnp.moveaxis(res, d, -1)
        return res


def _squad_flatten(s):
    leaves = {k: v for k, v in s.obj.__dict__.items()
              if isinstance(v, (jax.Array,)) or hasattr(v, "shape")}
    keys = sorted(leaves.keys())
    aux = (type(s.obj), s.nx, tuple(keys),
           tuple(sorted((k, v) for k, v in s.obj.__dict__.items() if k not in leaves)))
    return tuple(leaves[k] for k in keys), aux


def _squad_unflatten(aux, children):
    objcls, nx, keys, static = aux
    obj = object.__new__(objcls)
    for k, v in static:
        setattr(obj, k, v)
    for k, v in zip(keys, children):
        setattr(obj, k, v)
    s = object.__new__(SQuad)
    s.obj = obj
    s.nx = nx
    return s


jax.tree_util.register_pytree_node(SQuad, _squad_flatten, _squad_unflatten)
