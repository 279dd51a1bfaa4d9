"""Deflation decision probe (VERDICT r3 item 1): measure the component
costs that decide whether a DC-deflated eigh (small-leaf solves instead of
warm-started full-n sweeps) can reach the 35.7 ms/batch config-2 target.

Stages (JSON lines, B=64 n=256 f32 Wishart):
1. DC alone at levels in {1, 2, 3, 8} (single-shot kernel, min_seg=2) —
   is the deep DC or the finisher the dominant cost?
2. cold sweep kernel alone + executed sweep counts
3. warm sweep after DC(d)+_rot_correct for d in {2, 3, 8}: time + sweeps
4. leaf-solve candidates: the sweep kernel on (B*nb, bs, bs) Gram blocks
   for bs in {64, 128} (the deflated leaf shape) + on (B, 128, 256) row
   slices (the no-Gram leaf shape) — which leaf geometry is cheap?

Run ALONE on the chip (the tunnel serializes concurrent processes).
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
from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

HI = jax.lax.Precision.HIGHEST
B, N = 64, 256
K = 8


def mats():
    k = jax.random.PRNGKey(2026)
    w = jax.random.normal(k, (B, N, N), jnp.float32) / math.sqrt(N)
    a = jnp.matmul(w, jnp.swapaxes(w, -1, -2), precision=HI)
    return a + 0.05 * jnp.eye(N, dtype=jnp.float32)


def shift(a):
    absa = jnp.abs(a)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, axis=-1) - jnp.diagonal(absa, axis1=-2, axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = jnp.maximum(-lower, 0.0) + 0.01 * frob + 1e-30
    return a + sigma[:, None, None] * jnp.eye(N, dtype=a.dtype)


def amortized_ms(fn, x, rep=3):
    """fn must be a jitted callable taking (x, nk) static-K scan count.
    Returns marginal ms per call."""
    f1 = jax.jit(lambda m: fn(m, 1))
    fK = jax.jit(lambda m: fn(m, K))
    float(f1(x)); float(fK(x))
    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(x)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return max((t(fK) - t(f1)) / (K - 1), 1e-9) * 1e3


def scan_wrap(body):
    def fn(m, nk):
        def b(s, k):
            out = body(m + (k * 0.0))
            return s + jnp.sum(out), None
        s, _ = lax.scan(b, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s
    return fn


def main():
    a = mats()
    ash = shift(a)
    tol = float(jnp.finfo(jnp.float32).eps) * 4.0 * math.sqrt(N)

    # 1. DC alone per depth
    for lv in (1, 2, 3, 8):
        ms = amortized_ms(scan_wrap(
            lambda m, lv=lv: dc_precondition_tpu(m, levels=lv, min_seg=2)),
            ash)
        print(json.dumps({"stage": "dc_alone", "levels": lv,
                          "ms_per_batch": round(ms, 2)}), flush=True)

    # 2. cold sweep alone + sweep counts
    ms = amortized_ms(scan_wrap(
        lambda m: JE._pallas_g_panel(m, 18, tol, False, False)), ash)
    _, sw = jax.jit(lambda m: JE._pallas_g_panel(
        m, 18, tol, False, False, return_sweeps=True))(ash)
    print(json.dumps({"stage": "cold_sweep", "ms_per_batch": round(ms, 2),
                      "sweeps": np.asarray(sw).tolist()}), flush=True)

    # 3. warm sweep after DC(d) + rot_correct (time the FULL warm chain
    #    and the sweep-only part; also executed sweep counts)
    for lv in (2, 3, 8):
        def warm_chain(m, lv=lv):
            g0 = dc_precondition_tpu(m, levels=lv, min_seg=2)
            g0 = JE._rot_correct(g0)
            g, _ = JE._guard_warm_start(m, g0)
            return JE._pallas_g_panel(g, 18, tol, False, False)
        ms = amortized_ms(scan_wrap(warm_chain), ash)
        g0 = jax.jit(lambda m, lv=lv: JE._guard_warm_start(
            m, JE._rot_correct(dc_precondition_tpu(
                m, levels=lv, min_seg=2)))[0])(ash)
        ms_sweep = amortized_ms(scan_wrap(
            lambda m: JE._pallas_g_panel(m, 18, tol, False, False)), g0)
        _, sw = jax.jit(lambda m: JE._pallas_g_panel(
            m, 18, tol, False, False, return_sweeps=True))(g0)
        print(json.dumps({"stage": "warm_chain", "levels": lv,
                          "ms_per_batch": round(ms, 2),
                          "ms_sweep_only": round(ms_sweep, 2),
                          "sweeps": np.asarray(sw).tolist()}), flush=True)

    # 4. leaf-solve geometry costs (cold, representative of a deflated
    #    leaf): Gram blocks (B*nb, bs, bs) and row slices (B*2, 128, N)
    for bs in (64, 128):
        nb = N // bs
        blocks = ash.reshape(B, nb, bs, nb, bs)
        blocks = jnp.swapaxes(blocks, 2, 3)[
            :, jnp.arange(nb), jnp.arange(nb)]      # (B, nb, bs, bs)
        blocks = blocks.reshape(B * nb, bs, bs)
        blocks = shift_small(blocks, bs)
        ms = amortized_ms(scan_wrap(
            lambda m: JE._pallas_g_panel(m, 18,
                                         4.0 * float(jnp.finfo(jnp.float32).eps)
                                         * math.sqrt(bs), False, False)),
            blocks)
        _, sw = jax.jit(lambda m: JE._pallas_g_panel(
            m, 18, 4.0 * float(jnp.finfo(jnp.float32).eps) * math.sqrt(bs),
            False, False, return_sweeps=True))(blocks)
        print(json.dumps({"stage": "leaf_gram", "bs": bs,
                          "n_leaves": B * nb,
                          "ms_per_batch": round(ms, 2),
                          "sweeps_mean": float(np.mean(np.asarray(sw)))}),
              flush=True)

    rows = ash[:, :128, :]                           # (B, 128, N) slice
    ms = amortized_ms(scan_wrap(
        lambda m: JE._pallas_g_panel(m, 18, tol, False, False)), rows)
    print(json.dumps({"stage": "leaf_rows", "shape": [B, 128, N],
                      "ms_per_batch": round(ms, 2)}), flush=True)


def shift_small(blocks, bs):
    absa = jnp.abs(blocks)
    diag = jnp.diagonal(blocks, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, axis=-1) - jnp.diagonal(absa, axis1=-2,
                                                   axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = jnp.maximum(-lower, 0.0) + 0.01 * frob + 1e-30
    return blocks + sigma[:, None, None] * jnp.eye(bs, dtype=blocks.dtype)


if __name__ == "__main__":
    main()
