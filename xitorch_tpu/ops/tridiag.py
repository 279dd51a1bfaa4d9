"""Pallas TPU kernel: batched tridiagonal (Thomas) solve.

SURVEY §7 planned kernel (c); spec: the cubic-spline system of
/root/reference/xitorch/_impls/interpolate/interp_1d.py:296-405.  Layout is
``(n, K)``: K independent systems live in the *lane* dimension, so every
step of the sequential Thomas sweep is one (1, K) VPU row operation — the
recurrence is serial in n but fully vectorized across systems, and all
state stays in VMEM (the XLA `lax.linalg.tridiagonal_solve` lowering
round-trips carries through loop plumbing instead).

Differentiability: `tridiag_solve` wraps the kernel in
``lax.custom_linear_solve`` with the tridiagonal matvec, so gradients to
the rhs AND the diagonals come from the implicit rule (transpose solve =
same kernel with dl/du swapped) at any order.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["tridiag_solve", "tridiag_matvec", "tridiag_solve_pallas"]


def tridiag_matvec(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray,
                   x: jnp.ndarray) -> jnp.ndarray:
    """y_i = dl_i x_{i-1} + d_i x_i + du_i x_{i+1} along the last dim.
    Convention: dl[..., 0] and du[..., -1] are ignored (treated as 0)."""
    y = d * x
    y = y.at[..., 1:].add(dl[..., 1:] * x[..., :-1])
    y = y.at[..., :-1].add(du[..., :-1] * x[..., 1:])
    return y


def _thomas_kernel(dl_ref, d_ref, du_ref, b_ref, x_ref, cp_ref,
                   *, n: int, eps: float):
    # forward sweep; the transformed rhs lives directly in x_ref (it is
    # consumed in reverse order by the back substitution), saving one
    # (n, tile) VMEM scratch buffer
    d0 = d_ref[0, :]
    d0 = jnp.where(d0 == 0, eps, d0)
    cp_ref[0, :] = du_ref[0, :] / d0
    x_ref[0, :] = b_ref[0, :] / d0

    def fwd(i, _):
        m = d_ref[i, :] - dl_ref[i, :] * cp_ref[i - 1, :]
        m = jnp.where(m == 0, eps, m)
        cp_ref[i, :] = du_ref[i, :] / m
        x_ref[i, :] = (b_ref[i, :] - dl_ref[i, :] * x_ref[i - 1, :]) / m
        return 0

    lax.fori_loop(1, n, fwd, 0)

    # back substitution (in place)
    def bwd(j, _):
        i = n - 2 - j
        x_ref[i, :] = x_ref[i, :] - cp_ref[i, :] * x_ref[i + 1, :]
        return 0

    lax.fori_loop(0, n - 1, bwd, 0)


def tridiag_solve_pallas(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray,
                         b: jnp.ndarray, *, tile: int = 512,
                         eps: float = 0.0, interpret: bool = False
                         ) -> jnp.ndarray:
    """Raw kernel entry (no AD): solve K independent tridiagonal systems.

    All inputs ``(*B, n)`` (diagonals may broadcast against b's batch);
    batch dims flatten into the lane dimension.  ``dl[..., 0]`` and
    ``du[..., -1]`` are ignored.
    """
    from jax.experimental import pallas as pl

    # compiled Pallas needs a TPU; elsewhere run the interpreter so the
    # same code path works (slowly) on CPU for tests
    interpret = interpret or jax.default_backend() != "tpu"

    n = b.shape[-1]
    batch = jnp.broadcast_shapes(dl.shape[:-1], d.shape[:-1],
                                 du.shape[:-1], b.shape[:-1])
    K = math.prod(batch) if batch else 1

    def to_panel(a):
        a = jnp.broadcast_to(a, (*batch, n)).reshape(K, n)
        return jnp.moveaxis(a, 0, -1)  # (n, K)

    dlp, dp, dup, bp = map(to_panel, (dl, d, du, b))
    # VMEM budget: 4 double-buffered inputs + 1 double-buffered output
    # + 1 scratch = 11 (n, tk) planes must fit the ~16MB scoped limit
    # (measured OOM at n=1024, tk=512: 24MB requested)
    itemsize = jnp.dtype(b.dtype).itemsize
    budget = 10 * 1024 * 1024
    tk_max = max(128, (budget // (11 * n * itemsize)) // 128 * 128)
    tk = min(tile, K, tk_max)
    # pad K to a tile multiple; padded columns solve d=1 systems (harmless)
    Kpad = ((K + tk - 1) // tk) * tk
    if Kpad != K:
        padw = ((0, 0), (0, Kpad - K))
        dlp = jnp.pad(dlp, padw)
        dup = jnp.pad(dup, padw)
        bp = jnp.pad(bp, padw)
        dp = jnp.pad(dp, padw, constant_values=1.0)

    if eps == 0.0:
        eps = float(jnp.finfo(b.dtype).tiny)

    try:
        from jax.experimental.pallas import tpu as pltpu
        memspace = pltpu.VMEM
        scratch = [pltpu.VMEM((n, tk), bp.dtype)]
    except ImportError:  # pragma: no cover
        memspace = None
        scratch = [jax.ShapeDtypeStruct((n, tk), bp.dtype)]

    def spec():
        kwargs = {"index_map": lambda i: (0, i)}
        if memspace is not None:
            kwargs["memory_space"] = memspace
        return pl.BlockSpec((n, tk), **kwargs)

    kernel = functools.partial(_thomas_kernel, n=n, eps=eps)
    x = pl.pallas_call(
        kernel,
        grid=(Kpad // tk,),
        in_specs=[spec(), spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((n, Kpad), bp.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(dlp, dp, dup, bp)
    x = jnp.moveaxis(x[:, :K], -1, 0).reshape(*batch, n)
    return x


def tridiag_solve(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray,
                  b: jnp.ndarray, *, use_pallas: bool = True,
                  interpret: bool = False) -> jnp.ndarray:
    """Differentiable batched tridiagonal solve ``T x = b``.

    Gradients (any order) to b and to the diagonals via
    ``lax.custom_linear_solve``; the transpose solve swaps dl/du (shifted
    by one: T^T has sub-diagonal du[:-1] and super-diagonal dl[1:]).
    """
    if not use_pallas:
        # XLA reference path, shaped like spline_ks_tridiag's usage
        from jax.lax.linalg import tridiagonal_solve as _xla_tri

        batch = jnp.broadcast_shapes(dl.shape[:-1], d.shape[:-1],
                                     du.shape[:-1], b.shape[:-1])
        if batch:
            flat = lambda a: jnp.broadcast_to(a, (*batch, b.shape[-1])
                                              ).reshape(-1, b.shape[-1])
            sol = jax.vmap(lambda L, D, U, B: _xla_tri(
                L.at[0].set(0.0), D, U.at[-1].set(0.0), B[:, None])[:, 0])(
                flat(dl), flat(d), flat(du), flat(b))
            return sol.reshape(*batch, b.shape[-1])
        return _xla_tri(dl.at[0].set(0.0), d, du.at[-1].set(0.0),
                        b[:, None])[:, 0]

    def matvec(x):
        return tridiag_matvec(dl, d, du, x)

    def solve_fn(_, bb):
        return tridiag_solve_pallas(dl, d, du, bb, interpret=interpret)

    def transpose_solve_fn(_, bb):
        # T^T: sub-diag_i = du_{i-1}, super-diag_i = dl_{i+1}
        dlT = jnp.concatenate([jnp.zeros_like(du[..., :1]), du[..., :-1]],
                              axis=-1)
        duT = jnp.concatenate([dl[..., 1:], jnp.zeros_like(dl[..., :1])],
                              axis=-1)
        return tridiag_solve_pallas(dlT, d, duT, bb, interpret=interpret)

    return lax.custom_linear_solve(matvec, b, solve_fn,
                                   transpose_solve=transpose_solve_fn)
