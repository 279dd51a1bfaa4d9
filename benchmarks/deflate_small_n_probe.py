"""Small-n single-matrix eigh deflation probe (VERDICT r3 item 8).

The round-3 symeig grid accepted 2.25-4.5x at n in {100, 350} on a
physics argument (the time is the length-(n-1) sequential rotation
dependency chain, chip >99% idle) — but a split was never probed there.
This probe times single-matrix (B=1) jacobi_eigh {cold, warm DC,
deflated} at n in {100, 350}: the deflated path halves the rotation
chain per leaf sweep AND stacks the leaves into one fuller program.

Adoption rule from the VERDICT: adopt only if >= 1.5x at both sizes.
Run ALONE on the chip.
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

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")

K = 16


def mats(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((1, n, n)).astype(np.float32) / math.sqrt(n)
    a = w @ np.swapaxes(w, -1, -2) + 0.05 * np.eye(n, dtype=np.float32)
    return jnp.asarray(a)


def amortized_ms(body, x, rep=3):
    def run_k(m, nk):
        def b(s, k):
            lam, V = body(m + (k * 0.0))
            return s + jnp.sum(lam) + jnp.sum(V[..., 0]), None
        s, _ = lax.scan(b, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s

    f1 = jax.jit(lambda m: run_k(m, 1))
    fK = jax.jit(lambda m: run_k(m, K))
    float(f1(x)); float(fK(x))

    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(fK) - t(f1)) / (K - 1), 1e-9) * 1e3


def quality(a, lam, V):
    a64 = np.asarray(a, np.float64)[0]
    lam = np.asarray(lam, np.float64)[0]
    V = np.asarray(V, np.float64)[0]
    lam0 = np.linalg.eigvalsh(a64)
    r = a64 @ V - V * lam[None, :]
    return dict(
        lam_err=float(np.abs(lam - lam0).max() / np.abs(lam0).max()),
        colres=float(np.linalg.norm(r, axis=0).max()
                     / np.linalg.norm(a64)),
        orth=float(np.linalg.norm(V.T @ V - np.eye(V.shape[-1]))))


def main():
    print(json.dumps({"backend": jax.devices()[0].platform}), flush=True)
    variants = [
        ("cold", dict(precondition=False, deflate=False)),
        ("warm_dc", dict(precondition=True, deflate=False)),
        ("deflate", dict(deflate=True)),
    ]
    for n in (100, 350):
        a = mats(n)
        for tag, kw in variants:
            try:
                ms = amortized_ms(
                    lambda m, kw=kw: JE.jacobi_eigh(m, **kw), a)
                lam, V = jax.jit(
                    lambda m, kw=kw: JE.jacobi_eigh(m, **kw))(a)
                q = quality(a, lam, V)
            except Exception as e:  # noqa: BLE001 — probe records failures
                print(json.dumps({"n": n, "variant": tag,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            out = {"n": n, "variant": tag, "ms": round(ms, 3)}
            out.update({k: float("%.3g" % v) for k, v in q.items()})
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
