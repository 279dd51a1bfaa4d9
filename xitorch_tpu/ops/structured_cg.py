"""Pallas TPU kernel: VMEM-resident CG for structured matrix-free operators.

The headline solve workload (BASELINE config 3) is a hermitian operator
``A = diag(d) + tridiagonal coupling + V V^T`` applied matrix-free.  The
XLA while_loop CG is bandwidth-bound on its *elementwise* ops: every
iteration streams ~10 (B, n) arrays through HBM (carry state in/out plus
the matvec intermediates), ~40 MB per iteration at B=512, n=1024 — the
MXU never matters, HBM does.  This kernel keeps the entire CG state (x,
r, p) and the operator data (d, couplings, V) in VMEM for a tile of
batch elements and runs the whole solve on-chip: per-iteration HBM
traffic is zero.

Everything is VPU elementwise/reduction work in f32, so there is no
bf16 precision cliff (cf. the MXU precision note in CLAUDE.md).

Structure supported: ``A x = d*x + cl*shift+(x) + cu*shift-(x) + V (V^T x)``
with d (*B, n), couplings given full-length (cl[...,0] = cu[...,-1] = 0),
V (*B, n, r).  The public entry is
``xitorch_tpu.linalg.solve(A, B, method="structured_cg")`` with a
:class:`xitorch_tpu.TridiagLowRankOperator` (falls back to the XLA cg
for any other operator/backend/dtype).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["structured_cg_pallas", "fits_structured_cg"]

_VMEM_BUDGET = 10 * 1024 * 1024


def _tile_batch(n: int, nb: int, r: int, itemsize: int) -> int:
    """Largest multiple-of-8 batch tile fitting the VMEM budget.

    Planes of (Kt, n): inputs d, b double-buffered (4), band planes
    double-buffered (4*nb: lower+upper), V planes double-buffered (2r),
    output x double-buffered (2), scratch r/p (2).
    """
    planes = 4 + 4 * nb + 2 * r + 2 + 2
    kt = _VMEM_BUDGET // (planes * n * itemsize)
    return max(8, (kt // 8) * 8)


def fits_structured_cg(n: int, r: int, dtype, nb: int = 1) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),):
        return False
    # one batch element must fit with the minimum tile of 8
    planes = 4 + 4 * nb + 2 * r + 2 + 2
    return planes * n * 8 * jnp.dtype(dtype).itemsize <= _VMEM_BUDGET


def _cg_kernel(d_ref, bl_ref, bu_ref, V_ref, b_ref, x_ref, it_ref, res_ref,
               r_scr, p_scr, *, offsets, max_niter: int, rtol: float,
               atol: float, eps: float, interpret: bool):
    d = d_ref[:]          # (Kt, n)
    b = b_ref[:]
    n = d.shape[1]

    def roll(v, shift):
        # circular shift along lanes; wrapped elements are killed by the
        # zero-padded band entries (bl[..., k, :o] == bu[..., k, n-o:] == 0).
        # pltpu.roll requires a non-negative shift: -o == n - o circularly
        if interpret:
            return jnp.roll(v, shift, axis=1)
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.roll(v, shift % n, 1)

    def matvec(p):
        y = d * p
        for k, o in enumerate(offsets):
            y = y + bl_ref[:, k, :] * roll(p, o)    # y[i] += bl_i p_{i-o}
            y = y + bu_ref[:, k, :] * roll(p, -o)   # y[i] += bu_i p_{i+o}
        V = V_ref[:]      # (Kt, r, n)
        vt = jnp.sum(V * p[:, None, :], axis=2, keepdims=True)  # (Kt, r, 1)
        y = y + jnp.sum(V * vt, axis=1)
        return y

    bnorm2 = jnp.sum(b * b, axis=1, keepdims=True)           # (Kt, 1)
    stop2 = jnp.maximum(rtol * rtol * bnorm2, atol * atol)

    x_ref[:] = jnp.zeros_like(b)
    r_scr[:] = b
    p_scr[:] = b
    rr0 = bnorm2

    def cond(state):
        k, rr = state
        # iterate to HALF the tolerance (0.25 on the squared norms): the
        # loop stops on the CG *recurrence* residual, which rounding lets
        # drift above the measured residual; the margin keeps the honest
        # measured-residual info check (linalg/solve.py) from flagging a
        # solve the recurrence believed had just converged
        return jnp.logical_and(k < max_niter, jnp.max(rr / stop2) >= 0.25)

    def body(state):
        k, rr = state
        p = p_scr[:]
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=1, keepdims=True)
        alpha = rr / jnp.where(pAp == 0, eps, pAp)
        x_ref[:] = x_ref[:] + alpha * p
        rnew = r_scr[:] - alpha * Ap
        r_scr[:] = rnew
        rr_new = jnp.sum(rnew * rnew, axis=1, keepdims=True)
        beta = rr_new / jnp.where(rr == 0, eps, rr)
        p_scr[:] = rnew + beta * p
        return (k + 1, rr_new)

    k, rr = lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), rr0))
    it_ref[:] = jnp.broadcast_to(k.astype(jnp.float32), it_ref.shape)
    res_ref[:] = jnp.sqrt(rr)


def structured_cg_pallas(d: jnp.ndarray, bl: jnp.ndarray, bu: jnp.ndarray,
                         V: jnp.ndarray, b: jnp.ndarray,
                         offsets: Tuple[int, ...] = (1,),
                         rtol: float = 1e-6, atol: float = 1e-8,
                         max_niter: Optional[int] = None,
                         eps: float = 1e-30,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw kernel entry (no AD): CG-solve ``A x = b`` for
    ``A = diag(d) + sum_k band_k + V V^T`` per batch element.

    ``offsets`` is a static tuple of band offsets (o >= 1); ``bl``/``bu``
    hold the lower/upper band couplings as full-length planes, shape
    (*B, n) for the single-band case offsets=(1,) or (*B, nb, n) for
    nb > 1 bands, with ``bl[..., k, :o_k] == bu[..., k, n-o_k:] == 0``.
    d, b are (*B, n); V is (*B, n, r).  Returns ``(x, iterations, resid)``
    with iterations/resid of shape (*B,) (iterations is tile-uniform: the
    max over the tile the element landed in).
    """
    from jax.experimental import pallas as pl

    interpret = interpret or jax.default_backend() != "tpu"

    n = b.shape[-1]
    nb = len(offsets)
    if bl.ndim == d.ndim and nb == 1:  # single-band convenience layout
        bl = bl[..., None, :]
        bu = bu[..., None, :]
    if max_niter is None:
        max_niter = min(2 * n, 400)
    batch = jnp.broadcast_shapes(d.shape[:-1], bl.shape[:-2], bu.shape[:-2],
                                 V.shape[:-2], b.shape[:-1])
    K = math.prod(batch) if batch else 1
    r = V.shape[-1]

    def flat2(a):
        return jnp.broadcast_to(a, (*batch, n)).reshape(K, n)

    def flat3(a):
        return jnp.broadcast_to(a, (*batch, nb, n)).reshape(K, nb, n)

    dd, bf = map(flat2, (d, b))
    blf, buf = map(flat3, (bl, bu))
    # V as (K, r, n): r in sublanes, n in lanes
    Vf = jnp.moveaxis(jnp.broadcast_to(V, (*batch, n, r)).reshape(K, n, r),
                      -1, -2)

    kt = _tile_batch(n, nb, r, jnp.dtype(b.dtype).itemsize)
    kt = min(kt, max(8, ((K + 7) // 8) * 8))
    Kpad = ((K + kt - 1) // kt) * kt
    if Kpad != K:
        pw = Kpad - K
        dd = jnp.pad(dd, ((0, pw), (0, 0)), constant_values=1.0)
        blf = jnp.pad(blf, ((0, pw), (0, 0), (0, 0)))
        buf = jnp.pad(buf, ((0, pw), (0, 0), (0, 0)))
        bf = jnp.pad(bf, ((0, pw), (0, 0)))
        Vf = jnp.pad(Vf, ((0, pw), (0, 0), (0, 0)))

    try:
        from jax.experimental.pallas import tpu as pltpu
        memspace = pltpu.VMEM
        scratch = [pltpu.VMEM((kt, n), bf.dtype) for _ in range(2)]
    except ImportError:  # pragma: no cover
        memspace = None
        scratch = [jax.ShapeDtypeStruct((kt, n), bf.dtype)] * 2

    def spec2(block):
        kwargs = {"index_map": (lambda i: (i, 0)) if len(block) == 2
                  else (lambda i: (i, 0, 0))}
        if memspace is not None:
            kwargs["memory_space"] = memspace
        return pl.BlockSpec(block, **kwargs)

    kernel = functools.partial(_cg_kernel, offsets=tuple(offsets),
                               max_niter=max_niter, rtol=rtol,
                               atol=atol, eps=eps, interpret=interpret)
    x, it, res = pl.pallas_call(
        kernel,
        grid=(Kpad // kt,),
        in_specs=[spec2((kt, n)), spec2((kt, nb, n)), spec2((kt, nb, n)),
                  spec2((kt, r, n)), spec2((kt, n))],
        out_specs=(spec2((kt, n)), spec2((kt, 1)), spec2((kt, 1))),
        out_shape=(jax.ShapeDtypeStruct((Kpad, n), bf.dtype),
                   jax.ShapeDtypeStruct((Kpad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Kpad, 1), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(dd, blf, buf, Vf, bf)
    x = x[:K].reshape(*batch, n)
    it = it[:K, 0].reshape(batch)
    res = res[:K, 0].reshape(batch)
    return x, it, res
