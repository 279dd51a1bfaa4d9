"""Decompose the DC-warmed jacobi_eigh time at BASELINE config 2 shapes
(B=64, n=256 Wishart): where do the ~64 ms go, and is the per-program
max-over-stack sweep exit the bottleneck?

Stages (JSON lines):
1. component times: DC alone, guard alone, sweep kernel alone on the
   warm panel and on the cold panel (amortized, in-program reps)
2. per-matrix sweep counts (m=1, one matrix per grid program) warm vs
   cold — the distribution tells whether heterogeneous convergence makes
   every m=8 program pay the max over its stack
3. sorted-vs-unsorted A/B at m=8: order the batch by a cheap XLA-side
   convergence predictor (max leftover cos^2 of the warm panel) so
   programs get homogeneous sweep needs; time both

Run alone on the chip (tunnel serializes concurrent processes).
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import importlib

# xitorch_tpu.ops re-exports the jacobi_eigh FUNCTION under the module's
# name, so `import ... as JE` would bind the function — load the module
JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

HI = jax.lax.Precision.HIGHEST
B, N = 64, 256


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(f, *args, k=8, rep=3):
    """Amortized seconds per call: k in-program reps minus 1-rep dispatch."""
    def repn(nk):
        @jax.jit
        def g(*a):
            def body(s, i):
                out = f(*[x + 0.0 * s if isinstance(x, jnp.ndarray)
                          and x.dtype.kind == "f" else x for x in a])
                leaves = jax.tree_util.tree_leaves(out)
                return s + jnp.sum(leaves[0].astype(jnp.float32) if
                                   leaves[0].dtype.kind != "f"
                                   else leaves[0]).astype(jnp.float32), None
            s, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                            jnp.arange(nk))
            return s
        return g

    def t(fn):
        float(fn(*args))
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = t(repn(1))
    tK = t(repn(k))
    return max((tK - t1) / (k - 1), 1e-9)


def shift(a):
    """The jacobi_eigh PSD shift (same formula)."""
    absa = jnp.abs(a)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, axis=-1) - jnp.diagonal(absa, axis1=-2, axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = jnp.maximum(-lower, 0.0) + 0.01 * frob + 1e-30
    return a + sigma[:, None, None] * jnp.eye(a.shape[-1], dtype=a.dtype)


def panel_max_cos2(g):
    """XLA-side convergence predictor: per-matrix max off-diag cos^2 of
    the panel rows."""
    nrm = jnp.sum(g * g, axis=-1)
    gram = jnp.einsum("bik,bjk->bij", g, g, precision=HI)
    den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-30)
    r = gram * gram / den
    n = g.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.max(jnp.where(eye, 0.0, r), axis=(-2, -1))


def main():
    emit(backend=jax.default_backend())
    key = jax.random.PRNGKey(1256)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / N ** 0.5
    mats = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(N, dtype=jnp.float32)
    a_shift = jax.jit(shift)(mats)
    levels = max(3, math.ceil(math.log2(N)))
    tol = float(jnp.finfo(jnp.float32).eps) * 4.0 * math.sqrt(N)

    dc = jax.jit(lambda x: dc_precondition_tpu(x, levels=levels, min_seg=2))
    g0 = dc(a_shift)
    g_in, bad = JE._guard_warm_start(a_shift, g0)
    emit(stage="guard", n_flagged=int(jnp.sum(bad)))

    # 1. component times
    t_dc = timed(lambda x: dc_precondition_tpu(x, levels=levels, min_seg=2),
                 a_shift)
    t_guard = timed(lambda x, g: JE._guard_warm_start(x, g)[0], a_shift, g0)
    t_warm = timed(lambda g: JE._pallas_g_panel(g, 18, tol, False, False),
                   g_in)
    t_cold = timed(lambda g: JE._pallas_g_panel(g, 18, tol, False, False),
                   a_shift)
    emit(stage="components", dc_ms=t_dc * 1e3, guard_ms=t_guard * 1e3,
         sweep_warm_ms=t_warm * 1e3, sweep_cold_ms=t_cold * 1e3)

    # 2. per-matrix sweep counts (m=1)
    old_cap = JE._M_CAP
    JE._M_CAP = 1
    try:
        _, sw_warm = jax.jit(lambda g: JE._pallas_g_panel(
            g, 18, tol, False, False, return_sweeps=True))(g_in)
        _, sw_cold = jax.jit(lambda g: JE._pallas_g_panel(
            g, 18, tol, False, False, return_sweeps=True))(a_shift)
    finally:
        JE._M_CAP = old_cap
    for name, sw in [("warm", sw_warm), ("cold", sw_cold)]:
        sw = np.asarray(sw)
        emit(stage="sweep_dist", panel=name, min=int(sw.min()),
             med=float(np.median(sw)), max=int(sw.max()),
             hist={str(v): int((sw == v).sum()) for v in np.unique(sw)})

    # 2b. m=8 program sweep counts, unsorted (what the default path pays)
    _, sw8 = jax.jit(lambda g: JE._pallas_g_panel(
        g, 18, tol, False, False, return_sweeps=True))(g_in)
    emit(stage="sweep_m8_unsorted", sweeps=[int(x) for x in np.asarray(sw8)])

    # 3. sorted A/B at m=8
    pred = jax.jit(panel_max_cos2)(g_in)
    order = jnp.argsort(pred)
    g_sorted = jnp.take(g_in, order, axis=0)
    t_sorted = timed(lambda g: JE._pallas_g_panel(g, 18, tol, False, False),
                     g_sorted)
    _, sw8s = jax.jit(lambda g: JE._pallas_g_panel(
        g, 18, tol, False, False, return_sweeps=True))(g_sorted)
    emit(stage="sorted_ab", sweep_warm_unsorted_ms=t_warm * 1e3,
         sweep_warm_sorted_ms=t_sorted * 1e3,
         sweeps_sorted=[int(x) for x in np.asarray(sw8s)],
         pred_min=float(pred.min()), pred_med=float(jnp.median(pred)),
         pred_max=float(pred.max()))


if __name__ == "__main__":
    main()
