"""End-to-end deflated-eigh chip probe (VERDICT r3/r4 item 1 closure).

Measures at config-2 (B=64, n=256, f32 Wishart SPD):
* amortized ms/batch of jacobi_eigh under {cold, warm DC, deflated}
* finisher sweep counts on the deflated panel + guard bad-rate
* quality of the deflated output vs an f64 host oracle

Round-4 pipeline: DC(levels=2, refine=1) -> segment-aligned masked
window solves -> boundary windows -> rot_correct -> guard -> finisher
(measured 0 finisher sweeps on CPU, vs 8-10 cold).

Target: <= 35.7 ms/batch (config-2 exacteig >= 1,792 decomps/s = 10x the
CPU torch reference).  Run ALONE on the chip (the tunnel serializes).
"""
import importlib
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

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")

HI = jax.lax.Precision.HIGHEST
B, N, K = 64, 256, 8


def mats(clustered=False):
    rng = np.random.default_rng(2026)
    w = rng.standard_normal((B, N, N)).astype(np.float32) / math.sqrt(N)
    a = w @ np.swapaxes(w, -1, -2) + 0.05 * np.eye(N, dtype=np.float32)
    if clustered:
        for i in range(0, B, 4):
            q, _ = np.linalg.qr(rng.standard_normal((N, N)))
            lam = np.sort(np.concatenate(
                [np.linspace(0.1, 1, N - 24), np.full(24, 0.55)]))
            a[i] = ((q * lam) @ q.T).astype(np.float32)
    return jnp.asarray(a.astype(np.float32))


def amortized_ms(make_fn, x, rep=3):
    f1 = jax.jit(lambda m: make_fn(m, 1))
    fK = jax.jit(lambda m: make_fn(m, K))
    float(f1(x)); float(fK(x))

    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(fK) - t(f1)) / (K - 1), 1e-9) * 1e3


def scan_wrap(body):
    def fn(m, nk):
        def b(s, k):
            lam, V = body(m + (k * 0.0))
            return s + jnp.sum(lam) + jnp.sum(V[..., 0]), None
        s, _ = lax.scan(b, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s
    return fn


def quality(a, lam, V):
    a64 = np.asarray(a, np.float64)
    lam = np.asarray(lam, np.float64)
    V = np.asarray(V, np.float64)
    lam0 = np.linalg.eigvalsh(a64)
    scale = np.abs(lam0).max()
    r = a64 @ V - V * lam[:, None, :]
    colres = (np.linalg.norm(r, axis=1)
              / np.linalg.norm(a64, axis=(1, 2))[:, None]).max()
    orth = max(np.linalg.norm(V[i].T @ V[i] - np.eye(V.shape[-1]))
               for i in range(V.shape[0]))
    return dict(lam_err=float(np.abs(lam - lam0).max() / scale),
                colres=float(colres), orth=float(orth))


def main():
    dev = jax.devices()[0].platform
    print(json.dumps({"backend": dev}), flush=True)
    a = mats()
    ac = mats(clustered=True)

    # --- timing: cold / warm / deflated
    variants = [
        ("cold", dict(precondition=False, deflate=False)),
        ("warm_dc", dict(precondition=True, deflate=False)),
        ("deflate", dict(deflate=True)),
    ]
    for tag, kw in variants:
        ms = amortized_ms(scan_wrap(lambda m, kw=kw: JE.jacobi_eigh(m, **kw)), a)
        print(json.dumps({"stage": tag, "ms_per_batch": round(ms, 2),
                          "decomps_per_s": round(B / ms * 1e3, 1)}),
              flush=True)

    # --- finisher sweep counts + guard rate on the deflated panel
    def panel_stats(x):
        n = x.shape[-1]
        dt = x.dtype
        absa = jnp.abs(x)
        diag = jnp.diagonal(x, axis1=-2, axis2=-1)
        offsum = jnp.sum(absa, axis=-1) - diag
        lower = jnp.min(diag - offsum, axis=-1)
        frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
        sigma = jnp.maximum(-lower, 0.0) + 0.01 * frob + 1e-30
        ash = x + sigma[:, None, None] * jnp.eye(n, dtype=dt)
        from xitorch_tpu.ops import _finisher_lab as LAB
        g0 = LAB.deflated_panel(ash, max_sweeps=18, interpret=False)
        g0 = JE._rot_correct(g0)
        g_in, bad = JE._guard_warm_start(ash, g0)
        perm = jnp.argsort(bad.astype(jnp.int32), stable=True)
        tol = float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(n)
        gt, sweeps = JE._pallas_g_panel(jnp.take(g_in, perm, axis=0), 18,
                                        tol, False, False,
                                        return_sweeps=True)
        return jnp.sum(bad), sweeps

    for tag, x in (("wishart", a), ("clustered", ac)):
        nbad, sweeps = jax.jit(panel_stats)(x)
        print(json.dumps({"stage": "finisher_stats", "batch": tag,
                          "n_bad": int(nbad),
                          "sweeps": np.asarray(sweeps).tolist()}),
              flush=True)

    # --- quality on chip (vs f64 host oracle)
    for tag, x in (("wishart", a), ("clustered", ac)):
        lam, V = jax.jit(lambda m: JE.jacobi_eigh(m, deflate=True))(x)
        q = quality(x, lam, V)
        q.update({"stage": "quality", "batch": tag})
        print(json.dumps(q), flush=True)


if __name__ == "__main__":
    main()
