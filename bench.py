"""Benchmark: BASELINE config 3 — batched matrix-free CG solve.

Operator: A = diag(d) + tridiagonal coupling + rank-4 term (hermitian,
diagonally dominant), batch 512, n = 1024, ncols = 1, float32, rtol 1e-6.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

Measurement notes:
* K batch-solves (fresh rhs each) run inside ONE jitted program and the
  wall time is divided by K — this measures chip throughput rather than the
  ~30 ms host<->device round-trip latency of this image's TPU tunnel
  (which `block_until_ready` does not reliably await; a scalar host fetch
  inside the timed region forces completion).
* vs_baseline compares against the reference CPU-xitorch measured on this
  image (same operator, shapes, tolerances, float32, torch single-thread):
  1375.35 solves/sec — see BASELINE.md.  Override with env XT_BASELINE.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

BASELINE_SOLVES_PER_SEC = float(os.environ.get("XT_BASELINE", "1375.35"))
BATCH = int(os.environ.get("XT_BENCH_BATCH", "512"))
N = int(os.environ.get("XT_BENCH_N", "1024"))
K = int(os.environ.get("XT_BENCH_K", "16"))


def main():
    from xitorch_tpu import LinearOperator
    from xitorch_tpu.linalg import solve

    class Op(LinearOperator):
        def __init__(self, d, c, V):
            n = d.shape[-1]
            super().__init__(shape=(*d.shape[:-1], n, n), is_hermitian=True,
                             dtype=d.dtype)
            self.d = d
            self.c = c
            self.V = V

        def _getparamnames(self, prefix=""):
            return [prefix + "d", prefix + "c", prefix + "V"]

        def _mv(self, x):
            y = self.d * x
            pad = [(0, 0)] * (x.ndim - 1)
            y = y + jnp.pad(self.c * x[..., 1:], pad + [(0, 1)])
            y = y + jnp.pad(self.c * x[..., :-1], pad + [(1, 0)])
            vtx = jnp.einsum("...nk,...n->...k", self.V, x)
            return y + jnp.einsum("...nk,...k->...n", self.V, vtx)

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    d = 4.0 + 2.0 * jax.random.uniform(k1, (BATCH, N), dtype=dtype)
    c = jnp.asarray(1.0, dtype=dtype)
    V = jax.random.normal(k2, (BATCH, N, 4), dtype=dtype) / (N ** 0.5)
    seed = jax.random.PRNGKey(7)

    method = os.environ.get("XT_BENCH_METHOD", "cg_ir")

    def one_solve(A, b):
        if method == "cg_ir":
            # mixed-precision iterative refinement: bf16 inner CG + f32
            # residual correction (same final residual quality as f32 CG)
            return solve(A, b, method="cg_ir", posdef=True, rtol=1e-6,
                         atol=1e-8, inner_rtol=5e-2, inner_max_niter=60)
        return solve(A, b, method=method, posdef=True,
                     rtol=1e-6, atol=1e-8, max_niter=200)

    def run_k(d, c, V, seed, nk):
        A = Op(d, c, V)

        def body(s, k):
            b = jax.random.normal(jax.random.fold_in(seed, k), (BATCH, N, 1), dtype)
            x = one_solve(A, b)
            return s + jnp.sum(x), None

        s, _ = lax.scan(body, jnp.asarray(0.0, dtype), jnp.arange(nk))
        return s

    run1 = jax.jit(lambda d, c, V, seed: run_k(d, c, V, seed, 1))
    runK = jax.jit(lambda d, c, V, seed: run_k(d, c, V, seed, K))

    # correctness gate (convergence required, as in the reference benchmarks)
    A = Op(d, c, V)
    b0 = jax.random.normal(jax.random.fold_in(seed, 0), (BATCH, N, 1), dtype)
    x0 = one_solve(A, b0)
    resid = float(jnp.max(jnp.linalg.norm(A.mm(x0) - b0, axis=-2)))
    assert resid < 5e-4, "benchmark solve did not converge: resid=%g" % resid

    def timed(f, rep=5):
        float(f(d, c, V, seed))  # compile + warmup (host fetch forces sync)
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(d, c, V, seed))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timed(run1)
    tK = timed(runK)
    # marginal per-batch-solve time with the fixed dispatch cost removed
    per_solve = max((tK - t1) / (K - 1), 1e-9) if K > 1 else t1
    solves_per_sec = BATCH / per_solve

    print(json.dumps({
        "metric": "batched matrix-free solves/sec (%s), amortized over %d "
                  "solves (B=%d, n=%d, f32, residual gate 5e-4)" % (method, K, BATCH, N),
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
