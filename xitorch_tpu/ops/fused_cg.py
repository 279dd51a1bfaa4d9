"""Pallas TPU kernel: fused conjugate-gradient solve for explicit batched A.

The XLA while_loop CG (xitorch_tpu/_impls/linalg/solve.py:cg) re-reads the
(n, n) matrix from HBM on every iteration — the solve is HBM-bandwidth
bound.  This kernel pins each batch element's A in VMEM once and runs the
entire CG iteration on-chip: per-iteration traffic drops from O(n^2) HBM
reads to zero, with the matvec on the MXU.  Grid = batch; fits matrices up
to n ≈ 1500 (f32) in the ~16 MB VMEM budget.

Used automatically by ``xitorch_tpu.linalg.solve(..., method="fused_cg")``
(falls back to the XLA path when shapes/dtypes do not fit).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["fused_cg_dense", "fits_fused_cg"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16MB


def fits_fused_cg(n: int, ncols: int, dtype) -> bool:
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if jnp.dtype(dtype) == jnp.float64:
        return False  # TPU has no native f64
    need = itemsize * (n * n + 8 * n * ncols)
    return need <= _VMEM_BUDGET


def _cg_kernel(a_ref, b_ref, x_ref, *, max_niter: int, rtol: float,
               atol: float, eps: float):
    A = a_ref[0]  # (n, n)
    b = b_ref[0]  # (n, nc)
    f32 = jnp.float32
    bnorm = jnp.sqrt(jnp.sum(b * b, axis=0, keepdims=True))  # (1, nc)
    stop = jnp.maximum(rtol * bnorm, atol)

    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = r0
    rr0 = jnp.sum(r0 * r0, axis=0, keepdims=True)  # (1, nc)

    def cond(state):
        k, x, r, p, rr = state
        resid_rel = jnp.max(jnp.sqrt(rr) / stop)
        return jnp.logical_and(k < max_niter, resid_rel >= 1.0)

    def body(state):
        k, x, r, p, rr = state
        # HIGHEST precision: the MXU's default bf16 multiply caps the
        # achievable residual at ~1e-2; CG needs true f32 matvecs
        Ap = jnp.dot(A, p, preferred_element_type=f32,
                     precision=jax.lax.Precision.HIGHEST).astype(b.dtype)
        pAp = jnp.sum(p * Ap, axis=0, keepdims=True)
        alpha = rr / jnp.where(pAp == 0, eps, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = jnp.sum(r * r, axis=0, keepdims=True)
        beta = rr_new / jnp.where(rr == 0, eps, rr)
        p = r + beta * p
        return (k + 1, x, r, p, rr_new)

    out = lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), x0, r0, p0, rr0))
    x_ref[0] = out[1]


def fused_cg_dense(Amat: jnp.ndarray, B: jnp.ndarray,
                   rtol: float = 1e-6, atol: float = 1e-8,
                   max_niter: Optional[int] = None,
                   eps: float = 1e-12,
                   interpret: bool = False) -> jnp.ndarray:
    """Solve A X = B for hermitian-posdef dense A (*batch, n, n), B
    (*batch, n, nc), entirely in VMEM per batch element."""
    from jax.experimental import pallas as pl

    n = Amat.shape[-1]
    nc = B.shape[-1]
    if max_niter is None:
        max_niter = int(1.5 * n)
    batch = jnp.broadcast_shapes(Amat.shape[:-2], B.shape[:-2])
    nb = math.prod(batch) if batch else 1
    A3 = jnp.broadcast_to(Amat, (*batch, n, n)).reshape(nb, n, n)
    B3 = jnp.broadcast_to(B, (*batch, n, nc)).reshape(nb, n, nc)

    try:
        from jax.experimental.pallas import tpu as pltpu
        memspace = pltpu.VMEM
    except ImportError:  # pragma: no cover
        memspace = None

    kernel = functools.partial(_cg_kernel, max_niter=max_niter,
                               rtol=rtol, atol=atol, eps=eps)

    def spec(block):
        kwargs = {"index_map": lambda i: (i, 0, 0)}
        if memspace is not None:
            kwargs["memory_space"] = memspace
        return pl.BlockSpec(block, **kwargs)

    x = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec((1, n, n)), spec((1, n, nc))],
        out_specs=spec((1, n, nc)),
        out_shape=jax.ShapeDtypeStruct((nb, n, nc), B3.dtype),
        interpret=interpret,
    )(A3, B3)
    return x.reshape(*batch, n, nc)
