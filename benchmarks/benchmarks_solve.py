"""Benchmark grid: solve / symeig across hermiticity x eigenvalue-range x
size — the reference's asv suites (benchmarks/benchmarks_solve.py:10-59)
rebuilt as a plain script.  Convergence failures are hard errors (reference
:61-65).

Run: python benchmarks/benchmarks_solve.py [--quick]
Prints one JSON line per grid point.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import solve, symeig
from xitorch_tpu.utils.tensor import create_random_square_matrix


def timeit(f, *args, rep=3):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    sizes = [100, 350] if args.quick else [100, 350, 700]
    eigranges = [(-1.0, 1.0), (0.0, 1.0)] if args.quick else \
        [(-1.0, 1.0), (0.0, 1.0), (0.2, 1.0), (0.5, 1.0)]
    ncols = 50

    for is_hermitian in (True, False):
        for (lo, hi) in eigranges:
            for n in sizes:
                mat = create_random_square_matrix(
                    n, is_hermitian=is_hermitian, min_eival=lo, max_eival=hi,
                    minabs_eival=0.1, seed=12, dtype=dtype)
                A = LinearOperator.m(mat, is_hermitian=is_hermitian)
                B = jax.random.normal(jax.random.PRNGKey(0), (n, ncols), dtype)

                @jax.jit
                def dosolve(mat, B):
                    Aop = LinearOperator.m(mat, is_hermitian=is_hermitian)
                    # bicgstab handles indefinite systems directly: skip the
                    # posdef probe (which would square the conditioning via
                    # the normal-equation fallback)
                    return solve(Aop, B, method="cg" if is_hermitian else "bicgstab",
                                 posdef=None if is_hermitian else True,
                                 rtol=1e-5, atol=1e-7, max_niter=8 * n)

                x = dosolve(mat, B)
                resid = float(jnp.max(jnp.linalg.norm(A.mm(x) - B, axis=-2)))
                # convergence gate scales with the dtype's conditioning floor:
                # the non-normal grid matrices reach kappa ~ 1e6 at n=350,
                # which caps f32 residuals near kappa*eps*|B| regardless of
                # solver (verified against f32 exactsolve)
                gate = 1e-2 * n * (1.0 if dtype == jnp.float64 else 5.0)
                assert resid < gate, \
                    "solve did not converge (n=%d herm=%s range=%s resid=%g)" % (
                        n, is_hermitian, (lo, hi), resid)
                t = timeit(dosolve, mat, B)
                print(json.dumps({"suite": "solve", "hermitian": is_hermitian,
                                  "eigrange": [lo, hi], "n": n,
                                  "time_s": round(t, 5)}))

                if is_hermitian:
                    @jax.jit
                    def doeig(mat):
                        Aop = LinearOperator.m(mat, is_hermitian=True)
                        return symeig(Aop, 10, "lowest")

                    t = timeit(doeig, mat)
                    print(json.dumps({"suite": "symeig", "hermitian": True,
                                      "eigrange": [lo, hi], "n": n,
                                      "time_s": round(t, 5)}))


if __name__ == "__main__":
    main()
