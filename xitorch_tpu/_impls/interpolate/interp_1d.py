"""1-D interpolation kernels: cubic spline (4 boundary conditions) + linear.

TPU-native redesign of /root/reference/xitorch/_impls/interpolate/
interp_1d.py and extrap_utils.py:

* evaluation = ``searchsorted`` + ``take_along_axis`` gathers (jittable,
  vmappable);
* extrapolation is fully vectorized with ``where`` masks — including the
  batched case the reference raises NotImplementedError on (:48-49);
* the spline system (natural / clamped / not-a-knot / periodic,
  reference _get_spline_mat_inv :296-405) is built with vectorized diagonal
  scatters and solved once (dense, construction-time).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from xitorch_tpu.utils.bcast import match_dim

__all__ = ["CubicSpline1D", "LinearInterp1D", "get_spline_mat_inv"]


def _searchsorted_batched(x: jnp.ndarray, xq: jnp.ndarray) -> jnp.ndarray:
    # x: (*B, nr) sorted; xq: (*B, nrq) -> indices (*B, nrq)
    if x.ndim == 1:
        return jnp.searchsorted(x, xq)
    flat_x = x.reshape(-1, x.shape[-1])
    flat_q = xq.reshape(-1, xq.shape[-1])
    idx = jax.vmap(jnp.searchsorted)(flat_x, flat_q)
    return idx.reshape(xq.shape)


def _get_extrap_pos(xq: jnp.ndarray, extrap: str, xmin, xmax) -> jnp.ndarray:
    """Map out-of-bounds positions into [xmin, xmax] (reference
    extrap_utils.get_extrap_pos)."""
    xqnorm = (xq - xmin) / (xmax - xmin)
    if extrap == "periodic":
        xqin = xqnorm % 1.0
    elif extrap == "mirror":
        xqabs = jnp.abs(xqnorm)
        xq_ceil = jnp.floor(xqabs).astype(jnp.int64) + 1
        xqhalf = xq_ceil // 2
        xqin = (2 * xqhalf - xqabs) * (1 - (xq_ceil % 2) * 2)
    elif extrap == "bound":
        xqin = jnp.clip(xqnorm, 0.0, 1.0)
    else:
        raise RuntimeError("get_extrap_pos only works for periodic, mirror, bound")
    return xqin * (xmax - xmin) + xmin


class _BaseInterp1D:
    def __init__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                 extrap=None, **unused):
        self._y_is_given = y is not None
        self._extrap = extrap
        self._xmin = jnp.min(x, axis=-1, keepdims=True)
        self._xmax = jnp.max(x, axis=-1, keepdims=True)
        self._y = y

    def __call__(self, xq: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self._y_is_given:
            y = self._y
        elif y is None:
            raise RuntimeError("y must be given")

        extrap = self._extrap
        inbound = jnp.logical_and(xq >= self._xmin, xq <= self._xmax)

        if extrap in ("mirror", "periodic", "bound"):
            xq2 = jnp.where(inbound, xq, _get_extrap_pos(xq, extrap, self._xmin, self._xmax))
            return self._interp(xq2, y)

        # evaluate on clamped positions, patch extrapolated entries after
        xq_safe = jnp.clip(xq, self._xmin, self._xmax)
        yq = self._interp(xq_safe, y)
        if extrap is None or (isinstance(extrap, str) and extrap == "nan"):
            fill = jnp.full_like(yq, jnp.nan)
        elif isinstance(extrap, (int, float)) or (
                hasattr(extrap, "shape") and jnp.size(extrap) == 1):
            fill = jnp.zeros_like(yq) + extrap
        elif callable(extrap):
            fill = jnp.broadcast_to(extrap(xq), yq.shape)
        else:
            raise RuntimeError(
                "Invalid extrap type (type: %s): %s" % (type(extrap), extrap))
        return jnp.where(jnp.broadcast_to(inbound, yq.shape), yq, fill)

    def _interp(self, xq, y):
        raise NotImplementedError


class CubicSpline1D(_BaseInterp1D):
    """Cubic-spline 1-D interpolation for non-uniform x.

    Keyword arguments
    -----------------
    bc_type: "natural" | "clamped" | "not-a-knot" | "periodic" (default
        "not-a-knot").
    extrap: int/float/scalar array (pad value), "mirror", "periodic",
        "bound", "nan", a callable, or None (default per bc_type:
        clamped->"mirror", periodic->"periodic", else "nan").
    """

    def __init__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                 bc_type: Optional[str] = None, extrap=None,
                 use_tridiag: Optional[bool] = None,
                 use_pallas: bool = False, **unused):
        if bc_type is None:
            bc_type = "not-a-knot"
        bc_types = ["natural", "clamped", "not-a-knot", "periodic"]
        if bc_type not in bc_types:
            raise RuntimeError(
                "Unimplemented %s bc_type. Available options: %s" % (bc_type, bc_types))
        if extrap is None:
            extrap = {"clamped": "mirror", "periodic": "periodic"}.get(bc_type, "nan")
        super().__init__(x, y, extrap=extrap)
        self.x = x
        self.bc_type = bc_type
        # O(n) Thomas path for strictly-tridiagonal boundary conditions on a
        # 1-D knot vector (the reference always inverts the dense (nr, nr)
        # system, interp_1d.py:402); auto-enabled for large grids
        if use_tridiag is None:
            use_tridiag = bc_type in ("natural", "clamped") and x.ndim == 1 \
                and x.shape[-1] >= 128
        self._use_tridiag = use_tridiag and bc_type in ("natural", "clamped") \
            and x.ndim == 1
        # opt-in Pallas Thomas kernel for the tridiagonal path
        # (xitorch_tpu/ops/tridiag.py; VMEM-resident, lanes = batch)
        self._use_pallas = bool(use_pallas) and self._use_tridiag
        if not self._use_tridiag:
            self.spline_mat_inv = get_spline_mat_inv(x, bc_type)  # (*BX, nr, nr)
        if self._y_is_given:
            self.ks = self._solve_ks(y)

    def _solve_ks(self, y):
        if self._use_tridiag:
            return spline_ks_tridiag(self.x, y, self.bc_type,
                                     use_pallas=self._use_pallas)
        # HIGHEST: spline coefficients feed gradient paths; bf16 TPU
        # multiplies would cap interpolation accuracy at ~1e-2
        return jnp.einsum("...ij,...j->...i", self.spline_mat_inv, y,
                          precision=jax.lax.Precision.HIGHEST)

    def _interp(self, xq, y):
        if self._y_is_given:
            ks = self.ks
        else:
            ks = self._solve_ks(y)
        return _hermite_interp(self.x, y, ks, xq)


def _hermite_interp(x, y, ks, xq):
    """Evaluate the cubic Hermite form with knot values y and knot slopes
    ks at query points xq (shared by the cubic spline and pchip)."""
    x, xq_b = match_dim(x, xq)
    nr = x.shape[-1]
    idxr = jnp.clip(_searchsorted_batched(x, xq_b), 1, nr - 1)
    idxl = idxr - 1

    x_b, y_b, ks_b, idxl_b = match_dim(x, y, ks, idxl)
    xl = jnp.take_along_axis(x_b, idxl_b, axis=-1)
    xr = jnp.take_along_axis(x_b, idxl_b + 1, axis=-1)
    yl = jnp.take_along_axis(y_b, idxl_b, axis=-1)
    yr = jnp.take_along_axis(y_b, idxl_b + 1, axis=-1)
    kl = jnp.take_along_axis(ks_b, idxl_b, axis=-1)
    kr = jnp.take_along_axis(ks_b, idxl_b + 1, axis=-1)

    dxrl = xr - xl
    t = (xq_b - xl) / dxrl
    tinv = 1 - t
    tta = t * tinv * tinv
    ttb = t * tinv * t
    tyl = tinv + tta - ttb
    tyr = t - tta + ttb
    tkl = tta * dxrl
    tkr = -ttb * dxrl
    return yl * tyl + yr * tyr + kl * tkl + kr * tkr


class Pchip1D(_BaseInterp1D):
    """Monotone cubic (PCHIP, Fritsch-Carlson) 1-D interpolation.

    No reference analog (the reference ships cspline/linear only,
    interp_1d.py:406-437): shape-preserving — no overshoot between knots,
    monotone data gives a monotone interpolant.  Knot slopes follow
    SciPy's PchipInterpolator: weighted harmonic means of neighbouring
    secants, zeroed at local extrema, with the monotonicity-clamped
    three-point end formula.

    Keyword arguments
    -----------------
    extrap: same options as cspline (default "nan").
    """

    def __init__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                 extrap=None, **unused):
        super().__init__(x, y, extrap=extrap)
        self.x = x
        if self._y_is_given:
            self.ks = self._slopes(y)

    def _slopes(self, y):
        x, y = match_dim(self.x, y)
        h = x[..., 1:] - x[..., :-1]                     # (..., n-1)
        delta = (y[..., 1:] - y[..., :-1]) / h

        dl = delta[..., :-1]                             # (..., n-2)
        dr = delta[..., 1:]
        hl = h[..., :-1]
        hr = h[..., 1:]
        w1 = 2.0 * hr + hl
        w2 = hr + 2.0 * hl
        same_sign = (dl * dr) > 0
        # weighted harmonic mean where the secants agree in sign, else 0
        safe_dl = jnp.where(same_sign, dl, 1.0)
        safe_dr = jnp.where(same_sign, dr, 1.0)
        interior = jnp.where(
            same_sign, (w1 + w2) / (w1 / safe_dl + w2 / safe_dr), 0.0)

        def edge(h0, h1, d0, d1):
            d = ((2.0 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
            d = jnp.where(d * d0 <= 0, 0.0,
                          jnp.where((d0 * d1 < 0) & (jnp.abs(d)
                                                     > 3.0 * jnp.abs(d0)),
                                    3.0 * d0, d))
            return d

        k0 = edge(h[..., :1], h[..., 1:2], delta[..., :1], delta[..., 1:2])
        kn = edge(h[..., -1:], h[..., -2:-1], delta[..., -1:],
                  delta[..., -2:-1])
        return jnp.concatenate([k0, interior, kn], axis=-1)

    def _interp(self, xq, y):
        ks = self.ks if self._y_is_given else self._slopes(y)
        return _hermite_interp(self.x, y, ks, xq)


class LinearInterp1D(_BaseInterp1D):
    """Linear 1-D interpolation for non-uniform x.

    Keyword arguments
    -----------------
    extrap: same options as CubicSpline1D (default "nan").
    """

    def __init__(self, x, y=None, extrap=None, **unused):
        super().__init__(x, y, extrap=extrap)
        self.x = x

    def _interp(self, xq, y):
        x, xq_b = match_dim(self.x, xq)
        nr = x.shape[-1]
        idxr = jnp.clip(_searchsorted_batched(x, xq_b), 1, nr - 1)
        idxl = idxr - 1

        x_b, y_b, idxl_b = match_dim(x, y, idxl)
        xl = jnp.take_along_axis(x_b, idxl_b, axis=-1)
        xr = jnp.take_along_axis(x_b, idxl_b + 1, axis=-1)
        yl = jnp.take_along_axis(y_b, idxl_b, axis=-1)
        yr = jnp.take_along_axis(y_b, idxl_b + 1, axis=-1)
        t = (xq_b - xl) / (xr - xl)
        return yl + (yr - yl) * t


def get_spline_mat_inv(x: jnp.ndarray, bc_type: str = "not-a-knot") -> jnp.ndarray:
    """Matrix S with ks = S @ y giving the spline gradients at the knots.

    Vectorized port of the reference's _get_spline_mat_inv (:296-405): builds
    the tridiagonal-ish lhs and rhs with diagonal scatters, modifies rows for
    the boundary condition, and solves densely once.
    """
    nr = x.shape[-1]
    dtype = x.dtype

    inv_dx = 1.0 / (x[..., 1:] - x[..., :-1])  # (*BX, nr-1)
    pad0 = jnp.zeros_like(inv_dx[..., :1])
    inv_dx_pad = jnp.concatenate([pad0, inv_dx, pad0], axis=-1)
    lhs_diag = (inv_dx_pad[..., :-1] + inv_dx_pad[..., 1:]) * 2  # (*BX, nr)
    lhs_off = inv_dx  # (*BX, nr-1)

    lhs = (_diag_embed(lhs_diag)
           + _offdiag_embed(lhs_off, 1)
           + _offdiag_embed(lhs_off, -1))

    inv_dx2_pad = (inv_dx_pad * inv_dx_pad) * 3
    rhs_diag = inv_dx2_pad[..., :-1] - inv_dx2_pad[..., 1:]
    rhs_off = inv_dx2_pad[..., 1:-1]
    rhs = (_diag_embed(rhs_diag)
           + _offdiag_embed(rhs_off, 1)
           - _offdiag_embed(rhs_off, -1))

    if bc_type == "natural":
        pass
    elif bc_type == "clamped":
        e0 = jnp.zeros((nr,), dtype=dtype).at[0].set(1.0)
        en = jnp.zeros((nr,), dtype=dtype).at[-1].set(1.0)
        lhs = lhs.at[..., 0, :].set(e0)
        lhs = lhs.at[..., -1, :].set(en)
        rhs = rhs.at[..., 0, :].set(0.0)
        rhs = rhs.at[..., -1, :].set(0.0)
    elif bc_type == "not-a-knot":
        h0 = inv_dx[..., 0]
        h1 = inv_dx[..., 1]
        hn = inv_dx[..., -1]
        hn1 = inv_dx[..., -2]
        sq = lambda v: v * v
        cube = lambda v: v * v * v
        lhs = lhs.at[..., 0, :].set(0.0)
        lhs = lhs.at[..., -1, :].set(0.0)
        lhs = lhs.at[..., 0, 0].set(sq(h0))
        lhs = lhs.at[..., 0, 1].set(sq(h0) - sq(h1))
        lhs = lhs.at[..., 0, 2].set(-sq(h1))
        lhs = lhs.at[..., -1, -1].set(-sq(hn))
        lhs = lhs.at[..., -1, -2].set(sq(hn1) - sq(hn))
        lhs = lhs.at[..., -1, -3].set(sq(hn1))
        rhs = rhs.at[..., 0, :].set(0.0)
        rhs = rhs.at[..., -1, :].set(0.0)
        rhs = rhs.at[..., 0, 0].set(2 * (-cube(h0)))
        rhs = rhs.at[..., 0, 1].set(2 * (cube(h0) + cube(h1)))
        rhs = rhs.at[..., 0, 2].set(2 * (-cube(h1)))
        rhs = rhs.at[..., -1, -1].set(2 * (-cube(hn)))
        rhs = rhs.at[..., -1, -2].set(2 * (cube(hn) + cube(hn1)))
        rhs = rhs.at[..., -1, -3].set(2 * (-cube(hn1)))
    elif bc_type == "periodic":
        h1 = inv_dx[..., -1]
        h0 = inv_dx[..., 0]
        lhs = lhs.at[..., 0, -2].add(h1)
        lhs = lhs.at[..., 0, 0].add(h1 * 2)
        lhs = lhs.at[..., -1, 1].add(h0)
        lhs = lhs.at[..., -1, -1].add(h0 * 2)
        h1_sq3 = 3 * h1 * h1
        h0_sq3 = 3 * h0 * h0
        rhs = rhs.at[..., 0, -2].add(-h1_sq3)
        rhs = rhs.at[..., 0, 0].add(h1_sq3)
        rhs = rhs.at[..., -1, 1].add(h0_sq3)
        rhs = rhs.at[..., -1, -1].add(-h0_sq3)
    else:
        raise RuntimeError("Unknown boundary condition: %s" % bc_type)

    return jnp.linalg.solve(lhs, rhs)


def _diag_embed(d: jnp.ndarray) -> jnp.ndarray:
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


def _offdiag_embed(d: jnp.ndarray, offset: int) -> jnp.ndarray:
    n = d.shape[-1] + abs(offset)
    eye = jnp.eye(n, k=offset, dtype=d.dtype)
    if offset > 0:
        dd = jnp.concatenate([d, jnp.zeros_like(d[..., :offset])], axis=-1)
    else:
        dd = jnp.concatenate([jnp.zeros_like(d[..., :(-offset)]), d], axis=-1)
    return dd[..., :, None] * eye


def spline_ks_tridiag(x: jnp.ndarray, y: jnp.ndarray, bc_type: str,
                      use_pallas: bool = False) -> jnp.ndarray:
    """Spline gradients ks for natural/clamped bc via an O(n) tridiagonal
    solve (lax.linalg.tridiagonal_solve, or the Pallas Thomas kernel with
    ``use_pallas=True``) instead of the dense inverse.

    x: (nr,); y: (*BY, nr) -> ks: (*BY, nr).
    """
    from jax.lax.linalg import tridiagonal_solve

    nr = x.shape[-1]
    dtype = x.dtype
    dxinv0 = 1.0 / (x[1:] - x[:-1])  # (nr-1,)
    zero = jnp.zeros((1,), dtype)
    dxinv = jnp.concatenate([zero, dxinv0, zero])  # (nr+1,)
    diag = (dxinv[:-1] + dxinv[1:]) * 2  # (nr,)
    # lhs diagonals in tridiagonal_solve layout: dl[0] == 0, du[-1] == 0
    dl = jnp.concatenate([zero, dxinv0])
    du = jnp.concatenate([dxinv0, zero])

    dxinv2 = (dxinv * dxinv) * 3
    diagr = dxinv2[:-1] - dxinv2[1:]  # (nr,)
    udiagr = dxinv2[1:-1]  # (nr-1,)

    yb = jnp.asarray(y)
    r = diagr * yb
    r = r.at[..., :-1].add(udiagr * yb[..., 1:])
    r = r.at[..., 1:].add(-udiagr * yb[..., :-1])

    if bc_type == "clamped":
        one = jnp.ones((), dtype)
        diag = diag.at[0].set(one).at[-1].set(one)
        du = du.at[0].set(0.0)
        dl = dl.at[-1].set(0.0)
        r = r.at[..., 0].set(0.0).at[..., -1].set(0.0)
    elif bc_type != "natural":
        raise RuntimeError("tridiagonal spline path supports natural/clamped only")

    batch_shape = yb.shape[:-1]
    if use_pallas:
        # differentiable Pallas Thomas kernel; the shared diagonals
        # broadcast across the flattened batch lanes
        from xitorch_tpu.ops.tridiag import tridiag_solve

        return tridiag_solve(dl, diag, du, r)
    # solve for all batch rows at once: b must be (nr, k)
    b2 = jnp.moveaxis(r.reshape(-1, nr), 0, -1)  # (nr, nbatch)
    ks = tridiagonal_solve(dl, diag, du, b2)  # (nr, nbatch)
    return jnp.moveaxis(ks, -1, 0).reshape(*batch_shape, nr)
