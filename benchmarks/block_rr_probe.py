"""Grid probe for the DC + block-RR + rotational-correction pipeline at
BASELINE config 2 (B=64, n=256 Wishart): per-stage times, post-pipeline
true max cos^2 (f64, host), finisher sweep counts, end-to-end estimate.
Decides the production pipeline in jacobi_eigh.

Configs: (min_seg, levels, rr_width, correct_passes).  rr_width=0 turns
the block-RR off; correct_passes=0 turns the rotational correction off.

Run alone on the chip (the tunnel serializes concurrent processes).
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import importlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
LAB = importlib.import_module("xitorch_tpu.ops._finisher_lab")
DK = importlib.import_module("xitorch_tpu.ops.dc_kernel")

HI = jax.lax.Precision.HIGHEST
B, N = 64, 256


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(f, *args, k=8, rep=3):
    def repn(nk):
        @jax.jit
        def g(*a):
            def body(s, i):
                out = f(*[x + 0.0 * s if isinstance(x, jnp.ndarray)
                          and x.dtype.kind == "f" else x for x in a])
                leaves = jax.tree_util.tree_leaves(out)
                lead = leaves[0]
                return s + jnp.sum(lead.astype(jnp.float32)).astype(
                    jnp.float32), None
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
    absa = jnp.abs(a)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, axis=-1) - jnp.diagonal(absa, axis1=-2, axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = jnp.maximum(-lower, 0.0) + 0.01 * frob + 1e-30
    return a + sigma[:, None, None] * jnp.eye(a.shape[-1], dtype=a.dtype)


def f64_maxcos2(g):
    g = np.asarray(g, np.float64)
    nrm = (g * g).sum(-1)
    gram = np.einsum("bik,bjk->bij", g, g)
    den = np.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-300)
    r = gram * gram / den
    np.einsum("bii->bi", r)[:] = 0.0
    return r.max((-2, -1))


def main():
    emit(backend=jax.default_backend())
    key = jax.random.PRNGKey(1256)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / N ** 0.5
    mats = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(N, dtype=jnp.float32)
    a_shift = jax.jit(shift)(mats)
    tol = float(jnp.finfo(jnp.float32).eps) * 4.0 * math.sqrt(N)
    emit(tol2=tol * tol)

    # (min_seg, levels, local_w, emax_x100, passes); local_w > 0 uses the
    # windowed Hestenes phase (_windowed_local), local_w < 0 uses the
    # Gram-windowed solve (_gram_windowed, |w|); override via argv JSON
    grid = [(2, 8, 16, 10, 1),
            (2, 8, 16, 30, 2),
            (2, 8, 32, 30, 2),
            (2, 8, 32, 30, 1),
            (16, 4, 16, 30, 2),
            (2, 8, 16, 30, 0),
            (2, 8, 0, 30, 2)]
    if len(sys.argv) > 1:
        grid = [tuple(c) for c in json.loads(sys.argv[1])]

    t_panel_cold = None
    for min_seg, levels, w, emx, passes in grid:
        def pipe(x, _ms=min_seg, _lv=levels, _w=w, _p=passes,
                 _e=emx / 100.0):
            g0 = DK.dc_precondition_tpu(x, levels=_lv, min_seg=_ms)
            if _w > 0:
                g0 = LAB._windowed_local(g0, tol, False, width=_w)
            elif _w < 0:
                g0 = LAB._gram_windowed(g0, tol, False, width=-_w)
            if _p:
                g0 = JE._rot_correct(g0, passes=_p, emax=_e)
            g_in, bad = JE._guard_warm_start(x, g0)
            perm = jnp.argsort(bad.astype(jnp.int32), stable=True)
            return jnp.take(g_in, perm, axis=0), jnp.sum(bad)

        warm, nbad = jax.jit(pipe)(a_shift)
        cos2 = f64_maxcos2(warm)
        _, sw = jax.jit(lambda g: JE._pallas_g_panel(
            g, 18, tol, False, False, return_sweeps=True))(warm)
        sw = np.asarray(sw)
        t_pipe = timed(lambda x: pipe(x)[0], a_shift)
        t_warm = timed(lambda g: JE._pallas_g_panel(
            g, 18, tol, False, False), warm)
        if t_panel_cold is None:
            t_panel_cold = timed(lambda g: JE._pallas_g_panel(
                g, 18, tol, False, False), a_shift)
            emit(stage="cold", panel_ms=round(t_panel_cold * 1e3, 2))
        total = (t_pipe + t_warm) * 1e3
        qs = np.percentile(cos2, [50, 90, 100]).tolist()
        emit(min_seg=min_seg, levels=levels, local_w=w, emax=emx / 100.0,
             passes=passes,
             n_flagged=int(nbad), sweeps=[int(x) for x in sw],
             cos2_q50_90_max=[float(f"{v:.3g}") for v in qs],
             pipe_ms=round(t_pipe * 1e3, 2),
             warm_ms=round(t_warm * 1e3, 2),
             total_ms=round(total, 2),
             est_decomps_s=round(B / (total / 1e3), 1))


if __name__ == "__main__":
    main()
