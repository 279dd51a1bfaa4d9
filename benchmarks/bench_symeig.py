"""BASELINE config 2: batched dense symeig, 64 x (256x256) SPD operators,
neig=8 lowest — exacteig vs davidson, amortized chip throughput.

Reference CPU-xitorch on this image (same matrices, f32, single thread):
exacteig 179.2 decomps/sec, davidson 11.5 decomps/sec (see BASELINE.md).

Run: python benchmarks/bench_symeig.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

import jax
import jax.numpy as jnp
from jax import lax

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import symeig

B, N, NEIG, K = 64, 256, 8, 8



def main():
    _maybe_force_cpu()
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / (N ** 0.5)
    mats = a @ jnp.swapaxes(a, -2, -1) + 2 * jnp.eye(N, dtype=jnp.float32)

    def run_k(mats, method, nk, **opts):
        def body(s, k):
            m = mats + (k * 0.0)  # defeat loop-invariant hoisting
            A = LinearOperator.m(m, is_hermitian=True)
            evals, evecs = symeig(A, NEIG, "lowest", method=method, **opts)
            return s + jnp.sum(evals), None

        s, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s

    # convergence is a hard requirement while benchmarking (reference
    # policy, benchmarks/benchmarks_solve.py:61-65) — checked from the
    # solver's info struct before timing
    def assert_converged(method, opts):
        if method == "exacteig":
            return
        A = LinearOperator.m(mats, is_hermitian=True)
        out = jax.jit(lambda: symeig(A, NEIG, "lowest", method=method,
                                     return_info=True, **opts))()
        info = out[2]
        assert float(info["converged"]) == 1.0, (
            "benchmark %s did not converge: resid=%g after %d iterations"
            % (method, float(info["resid"]), int(info["iterations"])))

    # min_eps 1e-3: the batch spectra contain near-degenerate clusters
    # (8th/9th gaps ~1e-4), so tighter f32 residuals are unreachable and a
    # tighter setting just measures max_niter
    for method, opts in [("exacteig", {}),
                         ("chebfsi", {"min_eps": 1e-3, "max_niter": 40,
                                      "nguess": 32, "degree": 24}),
                         # davidson is iteration-count bound on this bulk
                         # spectrum (the reason chebfsi exists); give it the
                         # budget it needs to pass the convergence gate
                         ("davidson", {"min_eps": 2e-3, "max_niter": 800})]:
        assert_converged(method, opts)
        f1 = jax.jit(lambda m: run_k(m, method, 1, **opts))
        fK = jax.jit(lambda m: run_k(m, method, K, **opts))
        float(f1(mats))
        float(fK(mats))

        def timed(f, rep=3):
            ts = []
            for _ in range(rep):
                t0 = time.perf_counter()
                float(f(mats))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tK = timed(f1), timed(fK)
        per = max((tK - t1) / (K - 1), 1e-9)
        print(json.dumps({
            "metric": "batched symeig (%s) eigendecomps/sec, B=%d n=%d neig=%d"
                      % (method, B, N, NEIG),
            "value": round(B / per, 1),
            "unit": "decomps/sec",
        }))


if __name__ == "__main__":
    main()
