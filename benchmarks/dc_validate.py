"""Hardware validation of the DC-preconditioned Jacobi eigh (VERDICT r2
item 1): run on the real TPU, alone (the axon tunnel serializes
concurrent processes — CLAUDE.md).

Three stages, each printing JSON lines:

1. G-invariant floors: the relative ||G0^T G0 - A_shift^2||_F of the DC
   warm panel, per matrix, across n in {256, 512, 640, 768} and three
   spectrum families (Wishart bulk, tight clusters straddling splits,
   scaled identity).  This pins the healthy floor the runtime guard's
   _GUARD_RTOL must sit above, and verifies the rank-safety blend holds
   the invariant at n=704/768 where the pre-fix kernel measurably broke
   it (1e-5..1e-3 vs the 8e-7 healthy floor).
2. Guard behavior: fraction of healthy matrices that would fall back at
   the current _GUARD_RTOL (must be 0).
3. Throughput: jacobi_eigh warm (precondition=True) vs cold vs XLA eigh,
   amortized in-program reps, at (B, n) in {(64, 256), (16, 512),
   (8, 700)} + quality vs the f64 oracle.

Run: python benchmarks/dc_validate.py [--sizes 256,512,640,768]
"""
import argparse
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

from xitorch_tpu.ops.jacobi_eigh import _GUARD_RTOL, jacobi_eigh

HI = jax.lax.Precision.HIGHEST


def _families(key, B, n):
    """Three (B, n, n) f32 symmetric families exercising the DC failure
    surface: random bulk, clustered spectra (soft projectors), near-flat
    spectra (maximally ambiguous splits)."""
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (B, n, n), jnp.float32) / n ** 0.5
    wishart = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(n, dtype=jnp.float32)

    # clustered: thirds at 1.0, 1.0+1e-4, and a spread tail
    w = jnp.concatenate([jnp.full((n // 3,), 1.0),
                         jnp.full((n // 3,), 1.0 + 1e-4),
                         jnp.linspace(1.5, 2.5, n - 2 * (n // 3))])
    q, _ = jnp.linalg.qr(jax.random.normal(k2, (B, n, n), jnp.float32))
    clustered = jnp.einsum("bij,j,bkj->bik", q, w, q)
    clustered = 0.5 * (clustered + jnp.swapaxes(clustered, -1, -2))

    # near-flat: identity + tiny symmetric noise
    e = jax.random.normal(k3, (B, n, n), jnp.float32) * 1e-3
    flat = jnp.eye(n, dtype=jnp.float32) + 0.5 * (e + jnp.swapaxes(e, -1, -2))
    return {"wishart": wishart, "clustered": clustered, "flat": flat}


def _shift_like_jacobi(a):
    """The same Gershgorin PSD shift jacobi_eigh applies before the DC."""
    absa = jnp.abs(a)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, axis=-1) - jnp.diagonal(absa, axis1=-2, axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = jnp.maximum(-lower, 0.0) + 0.01 * frob + 1e-30
    return a + sigma[:, None, None] * jnp.eye(a.shape[-1],
                                              dtype=jnp.float32)


def stage1_invariant(sizes):
    from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

    worst_healthy = 0.0
    for n in sizes:
        B = 16 if n <= 512 else 8
        fams = _families(jax.random.PRNGKey(n), B, n)
        for name, mats in fams.items():
            a_shift = _shift_like_jacobi(mats)
            levels = max(3, math.ceil(math.log2(n)))

            @jax.jit
            def ginv(a_shift):
                g0 = dc_precondition_tpu(a_shift, levels=levels, min_seg=2)
                gtg = jnp.matmul(jnp.swapaxes(g0, -2, -1), g0, precision=HI)
                a2 = jnp.matmul(a_shift, a_shift, precision=HI)
                num = jnp.sqrt(jnp.sum((gtg - a2) ** 2, axis=(-2, -1)))
                den = jnp.sqrt(jnp.sum(a2 * a2, axis=(-2, -1)))
                return num / den

            rel = np.asarray(ginv(a_shift))
            # "healthy" excludes the matrices the guard flags (those ARE
            # the rank-deficiency failures the guard exists for); the
            # summary's job is to show the guard threshold sits well
            # above the healthy noise floor
            healthy = rel[rel <= _GUARD_RTOL]
            if healthy.size:
                worst_healthy = max(worst_healthy, float(healthy.max()))
            print(json.dumps({
                "stage": "g_invariant", "n": n, "family": name,
                "rel_max": float(rel.max()), "rel_med": float(np.median(rel)),
                "guard_rtol": _GUARD_RTOL,
                "would_fall_back": int((rel > _GUARD_RTOL).sum()),
            }), flush=True)
    print(json.dumps({"stage": "g_invariant_summary",
                      "worst_healthy": worst_healthy,
                      "guard_rtol": _GUARD_RTOL,
                      "headroom": _GUARD_RTOL / max(worst_healthy, 1e-12)}),
          flush=True)


def _timed_amortized(fn, mats, k, rep=3):
    """Amortized decomps/s: k in-program reps minus the 1-rep dispatch."""
    def repn(nk):
        @jax.jit
        def g(m):
            def body(s, i):
                lam, V = fn(m + 0.0 * s)
                return s + jnp.sum(lam), None
            s, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                            jnp.arange(nk))
            return s
        return g

    def t(f):
        tc0 = time.perf_counter()
        float(f(mats))
        compile_s = time.perf_counter() - tc0
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(mats))
            ts.append(time.perf_counter() - t0)
        return min(ts), compile_s

    t1, c1 = t(repn(1))
    tK, cK = t(repn(k))
    per = max((tK - t1) / (k - 1), 1e-9)
    return mats.shape[0] / per, c1 + cK


def stage3_throughput(points):
    for (B, n, k) in points:
        key = jax.random.PRNGKey(1000 + n)
        a = jax.random.normal(key, (B, n, n), jnp.float32) / n ** 0.5
        mats = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(n,
                                                         dtype=jnp.float32)
        lam0 = np.linalg.eigvalsh(np.asarray(mats, np.float64))

        for name, fn in [
            ("warm", lambda m: jacobi_eigh(m, precondition=True)),
            ("cold", lambda m: jacobi_eigh(m, precondition=False)),
            ("xla_eigh", lambda m: jnp.linalg.eigh(m)),
        ]:
            if name == "warm" and not (192 <= n):
                continue
            try:
                dps, compile_s = _timed_amortized(fn, mats, k)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"stage": "throughput", "B": B, "n": n,
                                  "method": name,
                                  "error": "%s: %s" % (type(exc).__name__,
                                                       exc)}),
                      flush=True)
                continue
            lam, V = jax.jit(fn)(mats)
            lam_err = float(jnp.max(jnp.abs(lam - lam0)))
            R = jnp.einsum("bij,bjk->bik", mats, V, precision=HI) \
                - V * lam[:, None, :]
            resid = float(jnp.max(jnp.abs(R)))
            orth = float(jnp.max(jnp.abs(
                jnp.einsum("bji,bjk->bik", V, V, precision=HI)
                - jnp.eye(n))))
            print(json.dumps({
                "stage": "throughput", "B": B, "n": n, "method": name,
                "decomps_per_sec": round(dps, 1),
                "compile_s": round(compile_s, 1),
                "lam_err": lam_err, "resid": resid, "orth": orth,
            }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="256,512,640,768")
    p.add_argument("--skip-invariant", action="store_true")
    p.add_argument("--skip-throughput", action="store_true")
    args = p.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    sizes = [int(s) for s in args.sizes.split(",") if s]
    if not args.skip_invariant:
        stage1_invariant(sizes)
    if not args.skip_throughput:
        stage3_throughput([(64, 256, 8), (16, 512, 4), (8, 700, 4)])


if __name__ == "__main__":
    main()
