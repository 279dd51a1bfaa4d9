"""Complex-hermitian eigh on the chip (VERDICT r3 item 6): measure the
batched c64 decomposition through the public symeig path — the Pallas
complex-pair Jacobi kernel inside its validated window (n <= 512) and the
XLA eigh fallback beyond it — and record where the fallback takes over
and at what relative cost.

Lines (JSON): batched (64, 256, 256) c64 exacteig with the kernel ON and
OFF (ops.jacobi_eigh.ENABLED), one n=700 batched point (always the XLA
fallback), and the reference torch CPU number for the same matrices.

Run alone on the chip: python benchmarks/bench_complex_eigh.py [--with-ref]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

_maybe_force_cpu()

import importlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import symeig

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")

K, NEIG = 8, 8


def herm(key, b, n):
    k1, k2 = jax.random.split(key)
    a = (jax.random.normal(k1, (b, n, n), jnp.float32)
         + 1j * jax.random.normal(k2, (b, n, n), jnp.float32)
         ).astype(jnp.complex64) / math.sqrt(n)
    return (a + jnp.swapaxes(a, -1, -2).conj()) / 2


def timed_pair(body, mats, rep=3):
    def run_k(m, nk):
        def b(s, k):
            evals, _ = body(m + (k * 0.0))
            return s + jnp.sum(evals), None
        s, _ = lax.scan(b, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s

    f1 = jax.jit(lambda m: run_k(m, 1))
    fK = jax.jit(lambda m: run_k(m, K))
    float(f1(mats)); float(fK(mats))

    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(mats))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(fK) - t(f1)) / (K - 1), 1e-9)


def measure(b, n, kernel_on):
    mats = herm(jax.random.PRNGKey(n), b, n)
    old = JE.ENABLED
    JE.ENABLED = kernel_on
    try:
        def body(m):
            A = LinearOperator.m(m, is_hermitian=True)
            return symeig(A, NEIG, "lowest", method="exacteig")

        # accuracy gate vs the f64 numpy oracle before timing
        evals, evecs = jax.jit(body)(mats)
        oracle = np.linalg.eigvalsh(np.asarray(mats, np.complex128)
                                    )[:, :NEIG]
        scale = float(np.max(np.abs(oracle))) + 1e-30
        err = float(np.max(np.abs(np.asarray(evals) - oracle))) / scale
        assert err < 5e-5, "c64 eigh err %g (b=%d n=%d)" % (err, b, n)
        per = timed_pair(body, mats)
        print(json.dumps({
            "metric": "batched c64 symeig exacteig decomps/sec",
            "B": b, "n": n,
            "path": "jacobi-complex-kernel" if kernel_on and
                    JE.use_jacobi_for(mats) else "xla-eigh",
            "value": round(b / per, 1), "acc_err_rel": err}), flush=True)
    finally:
        JE.ENABLED = old


def ref_cpu(b, n):
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch as xtr  # noqa: F401 (used via xtr.linalg below)
    import xitorch.linalg  # noqa: F401
    torch.set_num_threads(1)
    mats = np.asarray(herm(jax.random.PRNGKey(n), b, n))
    t_m = torch.tensor(mats, dtype=torch.complex64)

    def run():
        A = xtr.LinearOperator.m(t_m, is_hermitian=True)
        return xtr.linalg.symeig(A, NEIG, "lowest", method="exacteig")

    run()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    print(json.dumps({"metric": "REF c64 symeig exacteig decomps/sec",
                      "B": b, "n": n,
                      "value": round(b / min(ts), 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-ref", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    measure(64, 256, kernel_on=True)     # complex-pair kernel window
    measure(64, 256, kernel_on=False)    # XLA eigh, same matrices
    measure(8, 700, kernel_on=True)      # past the window: XLA fallback
    if args.with_ref:
        ref_cpu(64, 256)
        ref_cpu(8, 700)


if __name__ == "__main__":
    main()
