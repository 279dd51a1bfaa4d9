"""Pure-XLA batched one-sided Jacobi eigh for SMALL symmetric matrices.

Why this exists: XLA's TPU `eigh` lowers batched small decompositions to
a slow custom call — measured 4,020 us per (64, 32, 32) batch on a v5e,
which was ~85% of chebfsi's total runtime (one Rayleigh-Ritz eigh per
filter round) and the per-iteration cost of davidson's subspace solve.
The Pallas sweep kernel (ops/jacobi_eigh.py) cannot take these shapes
(it needs n >= 64 for lane occupancy), so this module re-implements the
SAME one-sided tournament iteration in plain XLA vector ops: per round,
half the rows rotate against the other half elementwise ((B, h, m)
shapes, no custom call, no matmul), and the Brent-Luk shuffle is two
static-slice concatenates.  At m <= 64 the whole decomposition is a few
hundred fused elementwise ops — measured ~8x faster than the XLA eigh
custom call at (64, 32, 32) (bench note in BASELINE.md round 5).

Scope: an internal helper for solver-internal Rayleigh-Ritz /subspace
eigendecompositions (chebfsi, davidson).  It runs a FIXED sweep budget
(quadratic convergence makes 9-12 sweeps plenty at these sizes; the
iterative consumers have their own outer residual loops, so a
pathological under-convergence costs outer iterations, never
correctness).  `degen_eigh` keeps the XLA path for general use.

Math (same invariants as the Pallas kernel, see ops/jacobi_eigh.py):
Gershgorin PSD shift, one-sided row-pair rotations on G = A + sigma*I
(at convergence row i = lam'_i v_i^T), carried row norms with analytic
updates + per-sweep refresh, Newton orthonormalization polish and
Rayleigh quotients on the UNSHIFTED input.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["small_eigh"]


def small_eigh(A: jnp.ndarray, sweeps: Optional[int] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigendecomposition, ``jnp.linalg.eigh`` contract
    (ascending eigenvalues, column eigenvectors), for small m (<= ~64).

    ``A``: (*B, m, m) real symmetric.  Fixed ``sweeps`` budget (default
    ``9 + m // 16``); see the module docstring for scope.
    """
    if A.ndim < 2 or A.shape[-1] != A.shape[-2]:
        raise ValueError("small_eigh expects (*B, m, m), got %s"
                         % (A.shape,))
    batch = A.shape[:-2]
    m = A.shape[-1]
    dt = A.dtype
    if sweeps is None:
        sweeps = 9 + m // 16
    Bflat = math.prod(batch) if batch else 1
    a = A.reshape(Bflat, m, m)

    # Gershgorin PSD shift (kernel-identical): sigma >= -lambda_min + 1%
    absa = jnp.abs(a)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, axis=-1) - jnp.abs(diag)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = (jnp.maximum(-lower, 0.0) + jnp.asarray(0.01, dt) * frob
             + jnp.asarray(1e-30, dt)).astype(dt)
    upper = jnp.max(diag + offsum, axis=-1)
    top_pad = (jnp.maximum(upper, 0.0) + sigma).astype(dt)

    mp = m + (m % 2)
    if mp != m:
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 1)))
        # padding eigenvalue above the spectrum, sliced off after sort
        a = a.at[:, m, m].set(2.0 * top_pad)
    P = a + sigma[:, None, None] * jnp.eye(mp, dtype=dt)

    h = mp // 2
    eps_floor = jnp.asarray(jnp.finfo(dt).tiny * 16.0, dt)
    tol2 = (float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(mp)) ** 2

    def one_round(carry, _):
        top, bot, nt, nb = carry
        gamma = jnp.sum(top * bot, axis=-1)                # (B, h)
        gam2 = gamma * gamma
        ab = nt * nb
        ratio = gam2 / jnp.maximum(ab, eps_floor)
        live = ratio > jnp.asarray(tol2 * 0.01, dt)
        zeta = (nb - nt) / jnp.where(live, 2.0 * gamma, 1.0)
        t = jnp.where(zeta >= 0, 1.0, -1.0) / (
            jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
        c = lax.rsqrt(1.0 + t * t)
        s = c * t
        c = jnp.where(live, c, jnp.asarray(1.0, dt))
        s = jnp.where(live, s, jnp.asarray(0.0, dt))
        cs = 2.0 * c * s * gamma
        ntop = c[..., None] * top - s[..., None] * bot
        nbot = s[..., None] * top + c[..., None] * bot
        nt_new = c * c * nt + s * s * nb - cs
        nb_new = s * s * nt + c * c * nb + cs
        if h == 1:
            # a single pair: no tournament to rotate
            return (ntop, nbot, nt_new, nb_new), None
        # Brent-Luk shuffle (jacobi_eigh._shuffle, axis -2)
        st = jnp.concatenate([ntop[..., 0:1, :], nbot[..., 0:1, :],
                              ntop[..., 1:h - 1, :]], axis=-2)
        sb = jnp.concatenate([nbot[..., 1:h, :], ntop[..., h - 1:h, :]],
                             axis=-2)
        snt = jnp.concatenate([nt_new[..., 0:1], nb_new[..., 0:1],
                               nt_new[..., 1:h - 1]], axis=-1)
        snb = jnp.concatenate([nb_new[..., 1:h], nt_new[..., h - 1:h]],
                              axis=-1)
        return (st, sb, snt, snb), None

    def one_sweep(P, _):
        top, bot = P[:, :h, :], P[:, h:, :]
        nt = jnp.sum(top * top, axis=-1)   # per-sweep norm refresh
        nb = jnp.sum(bot * bot, axis=-1)
        (top, bot, nt, nb), _ = lax.scan(one_round, (top, bot, nt, nb),
                                         None, length=mp - 1)
        return jnp.concatenate([top, bot], axis=1), None

    P, _ = lax.scan(one_sweep, P, None, length=sweeps)

    # rows -> eigenpairs (kernel-identical extraction + polish)
    lam = jnp.sqrt(jnp.sum(P * P, axis=-1))                # (B, mp)
    vt = P / jnp.maximum(lam, eps_floor)[..., None]
    if mp != m:
        order = jnp.argsort(lam, axis=-1)
        vt = jnp.take_along_axis(vt, order[..., None], axis=-2)
    vt = vt[:, :m, :m]
    V = jnp.swapaxes(vt, -2, -1)
    hi = jax.lax.Precision.HIGHEST
    a0 = A.reshape(Bflat, m, m)
    eye_m = jnp.eye(m, dtype=dt)
    VtV = jnp.matmul(jnp.swapaxes(V, -2, -1), V, precision=hi)
    V = jnp.matmul(V, 1.5 * eye_m - 0.5 * VtV, precision=hi)
    AV = jnp.matmul(a0, V, precision=hi)
    lam = jnp.sum(V * AV, axis=-2)
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return lam.reshape(*batch, m), V.reshape(*batch, m, m)


def use_small_eigh_for(A: jnp.ndarray) -> bool:
    """Gate for solver-internal RR/subspace decompositions: real
    f32-precision input on TPU, m <= 64 (the regime where XLA's batched
    eigh custom call dominates the caller — see module docstring)."""
    return bool(jax.default_backend() == "tpu"
                and A.ndim >= 2
                and A.shape[-1] == A.shape[-2]
                and A.shape[-1] <= 64
                and not jnp.iscomplexobj(A)
                and A.dtype == jnp.float32)
