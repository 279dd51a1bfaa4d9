"""Probe for the exact-angle parallel-Jacobi warm chain at BASELINE
config 2 (B=64, n=256 Wishart):

    DC(min_seg, levels) -> _angle_correct(pre) -> guard ->
    order programs by (bad, entering cos^2) -> sweep kernel at a
    RELAXED exit tol -> _angle_correct(post, light) restores quality.

The relaxed exit makes fully-corrected programs cost only the MXU
Gram gauge (0 sweeps); the post pass crushes the looser leftover
mixing quadratically back below the strict-tol grade.  Reports
per-stage times, per-program executed sweeps, f64 mixing quantiles
after each stage, and the end-to-end estimate.

Config tuples: (min_seg, levels, pre_passes, exit_tol2_exp, post_passes)
with exit tol^2 = 10**-exit_tol2_exp (0 -> the strict default
4*eps*sqrt(n)).  Override the grid via argv JSON.

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


def f64_cos2max(g):
    g = np.asarray(g, np.float64)
    nrm = (g * g).sum(-1)
    gram = np.einsum("bik,bjk->bij", g, g)
    den = np.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-300)
    r = gram * gram / den
    np.einsum("bii->bi", r)[:] = 0.0
    return r.max((-2, -1))


def cos2max_each(g):
    gram = jnp.matmul(g, jnp.swapaxes(g, -2, -1), precision=HI)
    nrm = jnp.diagonal(gram, axis1=-2, axis2=-1)
    den = jnp.maximum(nrm[:, :, None] * nrm[:, None, :],
                      jnp.asarray(1e-30, g.dtype))
    r = gram * gram / den
    n = g.shape[-1]
    offdiag = 1.0 - jnp.eye(n, dtype=g.dtype)
    return jnp.max(r * offdiag, axis=(-2, -1))


def main():
    # DC Newton-Schulz schedule trims (the single-shot kernel reads the
    # module constants at trace time): XT_DC_SIGN_Q / XT_DC_POLAR_Q
    for env, attr in [("XT_DC_SIGN_Q", "_N_QUINTIC_SIGN"),
                      ("XT_DC_POLAR_Q", "_N_QUINTIC_POLAR"),
                      ("XT_DC_SIGN_C", "_N_CUBIC_SIGN"),
                      ("XT_DC_POLAR_C", "_N_CUBIC_POLAR")]:
        v = os.environ.get(env)
        if v is not None:
            setattr(DK, attr, int(v))
            emit(override=attr, value=int(v))
    emit(backend=jax.default_backend())
    key = jax.random.PRNGKey(1256)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / N ** 0.5
    mats = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(N, dtype=jnp.float32)
    a_shift = jax.jit(shift)(mats)
    tol_strict = float(jnp.finfo(jnp.float32).eps) * 4.0 * math.sqrt(N)
    emit(tol2_strict=tol_strict * tol_strict)

    # (min_seg, levels, match_passes, drop_passes, exit_exp, post, m_cap)
    grid = [(2, 8, 6, 2, 8, 1, 8),
            (2, 8, 6, 2, 8, 1, 4),
            (2, 8, 4, 2, 8, 1, 4),
            (2, 8, 6, 2, 2, 0, 8),
            (2, 8, 0, 0, 0, 0, 8)]
    if len(sys.argv) > 1:
        grid = [tuple(c) for c in json.loads(sys.argv[1])]

    t_panel_cold = None
    for min_seg, levels, mp, dp, texp, post, mcap in grid:
        tol_exit = tol_strict if texp == 0 else math.sqrt(10.0 ** -texp)

        def pipe(x, _ms=min_seg, _lv=levels, _m=mp, _d=dp):
            g0 = DK.dc_precondition_tpu(x, levels=_lv, min_seg=_ms)
            if _m:
                g0 = LAB._match_correct(g0, passes=_m)
            if _d:
                g0 = LAB._angle_correct(g0, passes=_d, mode="drop")
            g_in, bad = JE._guard_warm_start(x, g0)
            score = jnp.where(bad, jnp.asarray(1e9, jnp.float32),
                              cos2max_each(g_in))
            perm = jnp.argsort(score)
            return jnp.take(g_in, perm, axis=0), jnp.sum(bad)

        def postfn(g, _q=post):
            return LAB._angle_correct(g, passes=_q, ns_steps=2,
                                     mode="drop", theta_max=0.05)

        warm, nbad = jax.jit(pipe)(a_shift)
        cos2_in = f64_cos2max(warm)
        gt, sw = jax.jit(lambda g, _t=tol_exit, _mc=mcap: JE._pallas_g_panel(
            g, 18, _t, False, False, return_sweeps=True, m_cap=_mc))(warm)
        cos2_kout = f64_cos2max(gt)
        sw = np.asarray(sw)
        cos2_post = cos2_kout
        t_post = 0.0
        if post:
            gp = jax.jit(postfn)(gt)
            cos2_post = f64_cos2max(gp)
            t_post = timed(postfn, gt)
        t_pipe = timed(lambda x: pipe(x)[0], a_shift)
        t_warm = timed(lambda g, _t=tol_exit, _mc=mcap: JE._pallas_g_panel(
            g, 18, _t, False, False, m_cap=_mc), warm)
        if t_panel_cold is None:
            t_panel_cold = timed(lambda g: JE._pallas_g_panel(
                g, 18, tol_strict, False, False), a_shift)
            emit(stage="cold", panel_ms=round(t_panel_cold * 1e3, 2))
        total = (t_pipe + t_warm + t_post) * 1e3

        def q(v):
            return [float(f"{x:.3g}") for x in
                    np.percentile(v, [50, 90, 100])]
        emit(min_seg=min_seg, levels=levels, mp=mp, dp=dp, exit_exp=texp,
             post=post, m_cap=mcap, n_flagged=int(nbad),
             sweeps=[int(x) for x in sw],
             cos2_in=q(cos2_in), cos2_kernel_out=q(cos2_kout),
             cos2_final=q(cos2_post),
             pipe_ms=round(t_pipe * 1e3, 2),
             warm_ms=round(t_warm * 1e3, 2),
             post_ms=round(t_post * 1e3, 2),
             total_ms=round(total, 2),
             est_decomps_s=round(B / (total / 1e3), 1))


if __name__ == "__main__":
    main()
