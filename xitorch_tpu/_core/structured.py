"""Structured matrix-free operators with fused TPU solve paths.

No reference analog: the reference's operators are either explicit
matrices or fully opaque callables, so its iterative solvers can never
exploit operator structure.  Here a declared structure (diagonal +
tridiagonal coupling + low-rank) lets ``linalg.solve`` dispatch to a
Pallas kernel that keeps the whole CG state AND the operator data in
VMEM (xitorch_tpu/ops/structured_cg.py) — the XLA while_loop path
streams ~10 (B, n) HBM arrays per iteration instead.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from xitorch_tpu._core.linop import LinearOperator

__all__ = ["TridiagLowRankOperator"]


class TridiagLowRankOperator(LinearOperator):
    r"""Hermitian operator :math:`A = \mathrm{diag}(d) + T(c) + V V^T`.

    ``d``: (*B, n) diagonal; ``c``: symmetric nearest-neighbour coupling,
    scalar or (*B, n-1) (``c[..., i]`` couples sites i and i+1); ``V``:
    optional (*B, n, r) low-rank factor.  Typical for tight-binding /
    banded-plus-corrections systems (the BASELINE config-3 operator).

    ``linalg.solve(A, B, method="structured_cg")`` runs the fused Pallas
    CG on TPU for this operator; every other method treats it as a
    regular matrix-free LinearOperator via ``_mv``.
    """

    def __init__(self, d: jnp.ndarray, c=None, V: Optional[jnp.ndarray] = None):
        d = jnp.asarray(d)
        n = d.shape[-1]
        if c is None:
            c = jnp.zeros((0,), d.dtype)  # sentinel: no coupling
        c = jnp.asarray(c, dtype=d.dtype)
        if c.ndim > 0 and c.shape[-1] not in (0, n - 1):
            raise RuntimeError(
                "TridiagLowRankOperator: c must be a scalar or have last "
                "dim n-1=%d (got %s)" % (n - 1, c.shape))
        batch = d.shape[:-1]
        if V is not None:
            V = jnp.asarray(V, dtype=d.dtype)
            if V.shape[-2] != n:
                raise RuntimeError(
                    "TridiagLowRankOperator: V must be (*B, n=%d, r) "
                    "(got %s)" % (n, V.shape))
            batch = jnp.broadcast_shapes(batch, V.shape[:-2])
        if c.ndim > 1:
            batch = jnp.broadcast_shapes(batch, c.shape[:-1])
        super().__init__(shape=(*batch, n, n), is_hermitian=True,
                         dtype=d.dtype, _suppress_hermit_warning=True)
        self.d = d
        self.c = c
        self.V = V

    def _getparamnames(self, prefix: str = "") -> List[str]:
        names = [prefix + "d", prefix + "c"]
        if self.V is not None:
            names.append(prefix + "V")
        return names

    @property
    def has_coupling(self) -> bool:
        return self.c.ndim == 0 or self.c.shape[-1] != 0

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.d * x
        if self.has_coupling:
            c = self.c
            pad = [(0, 0)] * (x.ndim - 1)
            y = y + jnp.pad(c * x[..., 1:], pad + [(0, 1)])
            y = y + jnp.pad(c * x[..., :-1], pad + [(1, 0)])
        if self.V is not None:
            vtx = jnp.einsum("...nk,...n->...k", self.V, x)
            y = y + jnp.einsum("...nk,...k->...n", self.V, vtx)
        return y

    def _fullmatrix(self) -> jnp.ndarray:
        n = self.shape[-1]
        batch = self.shape[:-2]
        out = jnp.zeros((*batch, n, n), self.dtype) \
            + self.d[..., :, None] * jnp.eye(n, dtype=self.dtype)
        if self.has_coupling:
            c = jnp.broadcast_to(self.c, (*batch, n - 1)) if self.c.ndim > 0 \
                else jnp.broadcast_to(self.c, (*batch, n - 1))
            idx = jnp.arange(n - 1)
            out = out.at[..., idx, idx + 1].add(c)
            out = out.at[..., idx + 1, idx].add(c)
        if self.V is not None:
            out = out + jnp.einsum("...nk,...mk->...nm", self.V, self.V)
        return out

    def full_couplings(self):
        """(cl, cu) as full-length (*B, n) arrays with cl[..., 0] =
        cu[..., -1] = 0, the layout the Pallas kernel consumes."""
        n = self.shape[-1]
        batch = self.shape[:-2]
        if not self.has_coupling:
            z = jnp.zeros((*batch, n), self.dtype)
            return z, z
        c = jnp.broadcast_to(self.c, (*batch, n - 1))
        zero = jnp.zeros((*batch, 1), self.dtype)
        cl = jnp.concatenate([zero, c], axis=-1)   # couples to i-1
        cu = jnp.concatenate([c, zero], axis=-1)   # couples to i+1
        return cl, cu
