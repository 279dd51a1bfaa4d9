"""Benchmark: BASELINE config 3 — batched matrix-free CG solve.

Operator: A = diag(d) + tridiagonal coupling + rank-4 term (hermitian,
diagonally dominant), batch 512, n = 1024, ncols = 1, float32, rtol 1e-6.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

vs_baseline compares against the reference CPU-xitorch measured on this
image (same operator, shapes, tolerances, float32, torch single-thread):
1375.35 solves/sec — see BASELINE.md.  Override with env XT_BASELINE.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_SOLVES_PER_SEC = float(os.environ.get("XT_BASELINE", "1375.35"))
BATCH = int(os.environ.get("XT_BENCH_BATCH", "512"))
N = int(os.environ.get("XT_BENCH_N", "1024"))


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
    b = jax.random.normal(k3, (BATCH, N, 1), dtype=dtype)

    @jax.jit
    def run(d, c, V, b):
        A = Op(d, c, V)
        return solve(A, b, method="cg", posdef=True,
                     rtol=1e-6, atol=1e-8, max_niter=200)

    x = run(d, c, V, b)
    x.block_until_ready()  # compile + warmup

    # correctness gate (convergence required, as in the reference benchmarks)
    A = Op(d, c, V)
    resid = float(jnp.max(jnp.linalg.norm(A.mm(x) - b, axis=-2)))
    assert resid < 5e-4, "benchmark solve did not converge: resid=%g" % resid

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run(d, c, V, b).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    solves_per_sec = BATCH / best

    print(json.dumps({
        "metric": "batched matrix-free CG solves/sec (B=%d, n=%d, f32, rtol=1e-6)"
                  % (BATCH, N),
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
