"""Sampled-quadrature weight matrices (cumulative integration of samples).

Parity with /root/reference/xitorch/_impls/integrate/samples_quad.py.
The trapz / cubic-spline weight builders (:136-145, :189-200) are fully
vectorized with broadcasted index masks (the reference uses Python loops
over nx); the irregular composite-Simpson builder (:148-186) keeps the
static loop (construction-time only).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from xitorch_tpu._impls.interpolate.interp_1d import get_spline_mat_inv

__all__ = ["CubicSplineSQuad", "TrapzSQuad", "SimpsonSQuad",
           "get_trapz_weights", "get_simpson_weights", "get_cspline_grad_weights"]


def get_trapz_weights(x: jnp.ndarray) -> jnp.ndarray:
    """W (.., nx, nx) with z_i = sum_j W[i,j] y_j the cumulative trapezoid."""
    nx = x.shape[-1]
    dx = x[..., 1:] - x[..., :-1]  # (..., nx-1)
    dxp = jnp.pad(dx, [(0, 0)] * (dx.ndim - 1) + [(0, 1)])  # dx_j (j=nx-1 -> 0)
    dxm = jnp.pad(dx, [(0, 0)] * (dx.ndim - 1) + [(1, 0)])  # dx_{j-1} (j=0 -> 0)
    i = jnp.arange(nx)[:, None]
    j = jnp.arange(nx)[None, :]
    # coeff of y_j in z_i: 0.5*(dx_j [j<i] + dx_{j-1} [j<=i])
    w = 0.5 * (dxp[..., None, :] * (j < i) + dxm[..., None, :] * (j <= i))
    return w


def get_cspline_grad_weights(x: jnp.ndarray) -> jnp.ndarray:
    """Weights on the spline gradients k: coeff (dx^2/12)(k_j - k_{j+1})
    accumulated (Holmes quadrature, reference :189-200)."""
    nx = x.shape[-1]
    dx = x[..., 1:] - x[..., :-1]
    f = dx * dx / 12.0
    fp = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, 1)])   # f_j, j=nx-1 -> 0
    fm = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(1, 0)])   # f_{j-1}, j=0 -> 0
    i = jnp.arange(nx)[:, None]
    j = jnp.arange(nx)[None, :]
    # z_i += sum_{k<i} f_k (k_k - k_{k+1}): coeff of k_j = f_j [j<i] - f_{j-1} [j<=i]
    w = fp[..., None, :] * (j < i) - fm[..., None, :] * (j <= i)
    return w


def get_simpson_weights(x: jnp.ndarray) -> jnp.ndarray:
    """Composite Simpson weights for irregularly spaced samples
    (reference :148-186; static python loop, construction-time only)."""
    h = x[..., 1:] - x[..., :-1]
    h1 = h[..., 1::2]
    h0 = h[..., :-1:2]
    h1_2, h0_2 = h1 * h1, h0 * h0
    h1_3, h0_3 = h1_2 * h1, h0_2 * h0
    alpha = (2 * h1_3 - h0_3 + 3 * h0 * h1_2) / (6 * h1 * (h1 + h0))
    eta = (2 * h0_3 - h1_3 + 3 * h1 * h0_2) / (6 * h0 * (h1 + h0))
    beta = (h1_3 + h0_3 + 3 * h1 * h0 * (h1 + h0)) / (6 * h1 * h0)
    hN1 = h[..., 2::2]
    hN2 = h[..., 1:-1:2]
    alpha_l = (2 * hN1 * hN1 + 3 * hN1 * hN2) / (6 * (hN1 + hN2))
    eta_l = hN1 * hN1 * hN1 / (6 * hN2 * (hN1 + hN2))
    beta_l = (hN1 * hN1 + 3 * hN1 * hN2) / (6 * hN2)

    nx = x.shape[-1]
    shape = (*x.shape[:-1], nx, nx)
    res = jnp.zeros(shape, dtype=x.dtype)
    rows = jnp.arange(nx)
    for i in range(2, nx, 2):
        j = i // 2 - 1
        rmask = (rows >= i).astype(x.dtype)  # (nx,)
        res = res.at[..., :, i - 2].add(rmask * eta[..., j:j + 1])
        res = res.at[..., :, i - 1].add(rmask * beta[..., j:j + 1])
        res = res.at[..., :, i].add(rmask * alpha[..., j:j + 1])
    for i in range(3, nx, 2):
        j = i // 2 - 1
        res = res.at[..., i, i - 2].add(-eta_l[..., j])
        res = res.at[..., i, i - 1].add(beta_l[..., j])
        res = res.at[..., i, i].add(alpha_l[..., j])
    # trapezoidal for the first interval
    res = res.at[..., 1, 0].set(0.5 * h[..., 0])
    res = res.at[..., 1, 1].set(0.5 * h[..., 0])
    return res


class _SQuadBase:
    def cumsum(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def integrate(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


class CubicSplineSQuad(_SQuadBase):
    r"""Cumulative integration assuming cubic-spline interpolation (Holmes
    quadrature): S = sum[ (y_i+y_{i+1})/2 + (k_i - k_{i+1}) dx^2/12 ].

    Keyword arguments
    -----------------
    bc_type: str
        Boundary condition for the spline (default "natural").
    """

    def __init__(self, x: jnp.ndarray, bc_type: str = "natural", **unused):
        self.spline_mat = get_spline_mat_inv(x, bc_type=bc_type)  # (nx, nx)
        self.wy = get_trapz_weights(x)
        self.wk = get_cspline_grad_weights(x)

    def cumsum(self, y):
        ks = jnp.einsum("...ij,...j->...i", self.spline_mat, y,
                      precision=jax.lax.Precision.HIGHEST)
        return (jnp.einsum("...ij,...j->...i", self.wk, ks,
                      precision=jax.lax.Precision.HIGHEST)
                + jnp.einsum("...ij,...j->...i", self.wy, y,
                      precision=jax.lax.Precision.HIGHEST))

    def integrate(self, y):
        ks = jnp.einsum("...ij,...j->...i", self.spline_mat, y,
                      precision=jax.lax.Precision.HIGHEST)
        return (jnp.einsum("...j,...j->...", self.wk[..., -1, :], ks,
                      precision=jax.lax.Precision.HIGHEST)
                + jnp.einsum("...j,...j->...", self.wy[..., -1, :], y,
                      precision=jax.lax.Precision.HIGHEST))


class _WeightBasedSQuad(_SQuadBase):
    def __init__(self, x: jnp.ndarray, **options):
        self.w = self.get_weights(x, **options)

    def get_weights(self, x, **options):
        raise NotImplementedError

    def cumsum(self, y):
        return jnp.einsum("...ij,...j->...i", self.w, y,
                      precision=jax.lax.Precision.HIGHEST)

    def integrate(self, y):
        return jnp.einsum("...j,...j->...", self.w[..., -1, :], y,
                      precision=jax.lax.Precision.HIGHEST)


class TrapzSQuad(_WeightBasedSQuad):
    """Cumulative trapezoidal integration."""

    def get_weights(self, x, **unused):
        return get_trapz_weights(x)


class SimpsonSQuad(_WeightBasedSQuad):
    """Composite Simpson integration for irregular samples."""

    def get_weights(self, x, **unused):
        return get_simpson_weights(x)
