"""Jacobian / Hessian as matrix-free LinearOperators.

TPU-native replacement of /root/reference/xitorch/grad/jachess.py:11-224:
the reference needs a double-VJP trick to get Jv products out of torch
autograd; here ``mv`` is a single ``jax.jvp`` (forward mode, exact) and
``rmv`` a single ``jax.vjp`` — both re-differentiable at any order.

The LinearOperator is flattened: shape ``(nout, nin)`` over raveled
input/output, with arbitrary batch dims on ``mv``/``rmv`` inputs.
"""
from __future__ import annotations

import math
from typing import Any, Callable, List, Sequence, Union

import jax
import jax.numpy as jnp

from xitorch_tpu._core.linop import LinearOperator

__all__ = ["jac", "hess"]


def jac(fcn: Callable, params: Sequence[Any],
        idxs: Union[None, int, Sequence[int]] = None,
        is_hermitian: bool = False) -> Union[LinearOperator, List]:
    """Return LinearOperator(s) acting as the Jacobian of ``fcn`` w.r.t.
    ``params[idx]`` evaluated at ``params``.

    Parity: reference ``jac`` (jachess.py:11-43).  ``idxs=None`` selects all
    inexact-array params.  ``is_hermitian=True`` declares the Jacobian
    symmetric (e.g. when fcn is itself a gradient, so J is a Hessian) —
    this unlocks hermitian-only solvers (cg, cg_ir) on the operator.
    """
    idxs_list = _setup_idxs(idxs, params)
    res = [_Jac(fcn, params, idx, is_hermitian=is_hermitian)
           for idx in idxs_list]
    if isinstance(idxs, int):
        return res[0]
    return res


def hess(fcn: Callable, params: Sequence[Any],
         idxs: Union[None, int, Sequence[int]] = None) -> Union[LinearOperator, List]:
    """Return LinearOperator(s) acting as the Hessian of the scalar-output
    ``fcn`` w.r.t. ``params[idx]``.

    Parity: reference ``hess`` (jachess.py:45-96).
    """
    idxs_list = _setup_idxs(idxs, params)

    def gen_grad_fcn(idx):
        def grad_fcn(*ps):
            def scalar(x):
                ps2 = list(ps)
                ps2[idx] = x
                out = fcn(*ps2)
                return out.real.sum() if jnp.iscomplexobj(out) else out.sum()
            return jax.grad(scalar)(ps[idx])
        return grad_fcn

    res = [_Jac(gen_grad_fcn(idx), params, idx, is_hermitian=True)
           for idx in idxs_list]
    if isinstance(idxs, int):
        return res[0]
    return res


class _Jac(LinearOperator):
    def __init__(self, fcn: Callable, params: Sequence[Any], idx: int,
                 is_hermitian: bool = False):
        yparam = params[idx]
        yout_shape = jax.eval_shape(lambda *ps: fcn(*ps), *params)
        nin = int(math.prod(jnp.shape(yparam)))
        nout = int(math.prod(yout_shape.shape))
        super().__init__(shape=(nout, nin),
                         is_hermitian=is_hermitian,
                         dtype=yout_shape.dtype)
        self.fcn = fcn
        self.params = tuple(params)
        self.idx = idx
        self.inshape = tuple(jnp.shape(yparam))
        self.outshape = tuple(yout_shape.shape)
        self.nin = nin
        self.nout = nout

    def _getparamnames(self, prefix: str = "") -> List[str]:
        return [prefix + "params"]

    def _f_of_x(self, x):
        ps = list(self.params)
        ps[self.idx] = x
        return self.fcn(*ps)

    def _mv(self, gy: jnp.ndarray) -> jnp.ndarray:
        # gy: (..., nin) -> (..., nout): J @ gy
        def single(v):
            vx = v.reshape(self.inshape).astype(self.params[self.idx].dtype)
            _, jv = jax.jvp(self._f_of_x, (self.params[self.idx],), (vx,))
            return jv.reshape(-1)

        batch = gy.shape[:-1]
        g2 = gy.reshape((-1, self.nin))
        out = jax.vmap(single)(g2)
        return out.reshape(*batch, self.nout)

    def _rmv(self, gout: jnp.ndarray) -> jnp.ndarray:
        # gout: (..., nout) -> (..., nin): J^H @ gout
        def single(v):
            ct = v.reshape(self.outshape).astype(self.dtype)
            _, vjp_fn = jax.vjp(self._f_of_x, self.params[self.idx])
            if jnp.issubdtype(self.dtype, jnp.complexfloating):
                return jnp.conj(vjp_fn(jnp.conj(ct))[0]).reshape(-1)
            return vjp_fn(ct)[0].reshape(-1)

        batch = gout.shape[:-1]
        g2 = gout.reshape((-1, self.nout))
        out = jax.vmap(single)(g2)
        return out.reshape(*batch, self.nin)


def _setup_idxs(idxs, params) -> List[int]:
    if idxs is None:
        out = []
        for i, p in enumerate(params):
            try:
                if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
                    out.append(i)
            except (TypeError, ValueError):
                continue
        return out
    if isinstance(idxs, int):
        return [idxs]
    return list(idxs)
