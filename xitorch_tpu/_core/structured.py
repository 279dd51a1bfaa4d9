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
from xitorch_tpu.utils.tensor import einsum_hi

__all__ = ["TridiagLowRankOperator", "BandedLowRankOperator"]


def _reject_complex(d: jnp.ndarray, name: str) -> None:
    # the declared structure mirrors bands unconjugated and applies
    # V V^T (not V V^H), which is complex-*symmetric*, not hermitian —
    # cg/minres would silently treat it as hermitian and return wrong
    # results (the fused Pallas kernel is f32-only anyway)
    if jnp.issubdtype(d.dtype, jnp.complexfloating):
        raise RuntimeError(
            "%s requires a real dtype (got %s): the structure applies "
            "V V^T and mirrors bands unconjugated, which is not hermitian "
            "for complex data" % (name, d.dtype))


class BandedLowRankOperator(LinearOperator):
    r"""Hermitian operator :math:`A = \mathrm{diag}(d) + \sum_k B_{o_k}(c_k)
    + V V^T` with symmetric bands at arbitrary offsets.

    ``d``: (*B, n) diagonal; ``bands``: mapping ``{offset: coupling}`` with
    offset >= 1 and coupling scalar or (*B, n-offset) (``c[..., i]``
    couples sites i and i+offset, mirrored below the diagonal); ``V``:
    optional (*B, n, r) low-rank factor.  Generalizes
    :class:`TridiagLowRankOperator` (= single band at offset 1); the
    same fused Pallas CG serves ``linalg.solve(..., method=
    "structured_cg")`` with one extra vector op per band per iteration.
    """

    def __init__(self, d: jnp.ndarray, bands=None,
                 V: Optional[jnp.ndarray] = None):
        d = jnp.asarray(d)
        _reject_complex(d, "BandedLowRankOperator")
        n = d.shape[-1]
        bands = dict(bands or {})
        offsets = tuple(sorted(int(o) for o in bands))
        if any(o < 1 or o >= n for o in offsets):
            raise RuntimeError(
                "BandedLowRankOperator: band offsets must be in [1, n-1]"
                " (got %s with n=%d)" % (offsets, n))
        vals = []
        batch = d.shape[:-1]
        for o in offsets:
            c = jnp.asarray(bands[o], dtype=d.dtype)
            if c.ndim > 0 and c.shape[-1] != n - o:
                raise RuntimeError(
                    "BandedLowRankOperator: band %d coupling must be a "
                    "scalar or have last dim n-%d=%d (got %s)"
                    % (o, o, n - o, c.shape))
            if c.ndim > 1:
                batch = jnp.broadcast_shapes(batch, c.shape[:-1])
            vals.append(c)
        if V is not None:
            V = jnp.asarray(V, dtype=d.dtype)
            if V.shape[-2] != n:
                raise RuntimeError(
                    "BandedLowRankOperator: V must be (*B, n=%d, r) "
                    "(got %s)" % (n, V.shape))
            batch = jnp.broadcast_shapes(batch, V.shape[:-2])
        super().__init__(shape=(*batch, n, n), is_hermitian=True,
                         dtype=d.dtype, _suppress_hermit_warning=True)
        self.d = d
        self.offsets = offsets       # static
        self.band_vals = tuple(vals)  # pytree children
        self.V = V

    def _getparamnames(self, prefix: str = "") -> List[str]:
        names = [prefix + "d", prefix + "band_vals"]
        if self.V is not None:
            names.append(prefix + "V")
        return names

    def _mv(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.d * x
        pad = [(0, 0)] * (x.ndim - 1)
        for o, c in zip(self.offsets, self.band_vals):
            y = y + jnp.pad(c * x[..., o:], pad + [(0, o)])
            y = y + jnp.pad(c * x[..., :-o], pad + [(o, 0)])
        if self.V is not None:
            # HIGHEST: this matvec feeds the fallback CG's residuals
            # (CLAUDE.md precision rule for solver-internal contractions)
            vtx = einsum_hi("...nk,...n->...k", self.V, x)
            y = y + einsum_hi("...nk,...k->...n", self.V, vtx)
        return y

    def _fullmatrix(self) -> jnp.ndarray:
        n = self.shape[-1]
        batch = self.shape[:-2]
        out = jnp.zeros((*batch, n, n), self.dtype) \
            + self.d[..., :, None] * jnp.eye(n, dtype=self.dtype)
        for o, c in zip(self.offsets, self.band_vals):
            cb = jnp.broadcast_to(c, (*batch, n - o))
            idx = jnp.arange(n - o)
            out = out.at[..., idx, idx + o].add(cb)
            out = out.at[..., idx + o, idx].add(cb)
        if self.V is not None:
            out = out + jnp.einsum("...nk,...mk->...nm", self.V, self.V)
        return out

    def full_bands(self):
        """(bl, bu) as (*B, nb, n) planes with bl[..., k, :o_k] =
        bu[..., k, n-o_k:] = 0, the layout the Pallas kernel consumes."""
        n = self.shape[-1]
        batch = self.shape[:-2]
        bls, bus = [], []
        for o, c in zip(self.offsets, self.band_vals):
            cb = jnp.broadcast_to(c, (*batch, n - o))
            zero = jnp.zeros((*batch, o), self.dtype)
            bls.append(jnp.concatenate([zero, cb], axis=-1))
            bus.append(jnp.concatenate([cb, zero], axis=-1))
        return jnp.stack(bls, axis=-2), jnp.stack(bus, axis=-2)


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
        _reject_complex(d, "TridiagLowRankOperator")
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
            # HIGHEST: this matvec feeds the fallback CG's residuals
            # (CLAUDE.md precision rule for solver-internal contractions)
            vtx = einsum_hi("...nk,...n->...k", self.V, x)
            y = y + einsum_hi("...nk,...k->...n", self.V, vtx)
        return y

    def _fullmatrix(self) -> jnp.ndarray:
        n = self.shape[-1]
        batch = self.shape[:-2]
        out = jnp.zeros((*batch, n, n), self.dtype) \
            + self.d[..., :, None] * jnp.eye(n, dtype=self.dtype)
        if self.has_coupling:
            c = jnp.broadcast_to(self.c, (*batch, n - 1))
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
