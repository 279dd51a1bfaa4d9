"""Kronecker-sum direct solve vs iterative CG: 2-D Laplacian + potential.

Problem: (L1 (x) I + I (x) L2 + c*I) X = B on a 128x128 tensor grid
(N = 16,384) — the textbook separable elliptic solve.  ``kron_direct``
runs two 128-point eigh's (the Pallas Jacobi kernel on TPU) + four basis
matmuls; matrix-free CG must iterate O(sqrt(kappa)) ~ O(n) times at ~2N
reads per iteration.  The reference cannot express operator structure at
all (its solve sees only a matvec closure), so this measures the
capability gap, not just kernel speed: same operator via xitorch-CPU CG
is the baseline.

Run: python benchmarks/bench_kron.py [--cpu] [--no-ref]
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

N1 = N2 = 128
NCOLS = 4
K = 8



def lap1d(n, dtype):
    d = 2.0 * jnp.ones(n, dtype)
    off = -jnp.ones(n - 1, dtype)
    return (jnp.diag(d) + jnp.diag(off, 1) + jnp.diag(off, -1)
            + 0.05 * jnp.eye(n, dtype=dtype))  # shifted: SPD


def main():
    _maybe_force_cpu()
    from xitorch_tpu import KronSumOperator
    from xitorch_tpu.linalg import solve

    platform = jax.devices()[0].platform
    dt = jnp.float32
    L1 = lap1d(N1, dt)
    L2 = lap1d(N2, dt)
    op = KronSumOperator(L1, L2, is_hermitian=True)
    B = jax.random.normal(jax.random.PRNGKey(0), (N1 * N2, NCOLS), dt)

    def run_k(Bm, method, nk, **opts):
        def body(s, i):
            x = solve(op, Bm + 0.0 * s, method=method, **opts)
            return s + jnp.sum(x), None
        s, _ = lax.scan(body, jnp.asarray(0.0, dt), jnp.arange(nk))
        return s

    def timed(f, args):
        float(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = {"metric": "2D Laplacian solve (N=%d, ncols=%d, f32, backend=%s), "
                     "amortized over %d calls" % (N1 * N2, NCOLS, platform, K),
           "unit": "solves/sec"}
    for method, opts in [("kron_direct", {}),
                         ("cg", {"rtol": 1e-5, "atol": 1e-6,
                                 "max_niter": 600})]:
        f1 = jax.jit(lambda Bm: run_k(Bm, method, 1, **opts))
        fK = jax.jit(lambda Bm: run_k(Bm, method, K, **opts))
        t1, tK = timed(f1, (B,)), timed(fK, (B,))
        per = max((tK - t1) / (K - 1), 1e-9)
        x = solve(op, B, method=method, **opts)
        with jax.default_matmul_precision("highest"):
            resid = float(jnp.max(jnp.abs(op.mm(x) - B)))
        out[method + "_solves_per_sec"] = round(1.0 / per, 2)
        out[method + "_max_resid"] = resid

    if "--no-ref" not in sys.argv:
        try:
            out["ref_cg_solves_per_sec"] = _ref_measure()
            out["vs_ref"] = round(out["kron_direct_solves_per_sec"]
                                  / out["ref_cg_solves_per_sec"], 1)
        except Exception as e:  # pragma: no cover
            out["ref_error"] = str(e)[:120]
    print(json.dumps(out), flush=True)


def _ref_measure():
    """Reference xitorch CPU: same operator as a matvec-only
    LinearOperator (no structure escape hatch exists there)."""
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    import xitorch
    from xitorch.linalg import solve as ref_solve

    torch.set_num_threads(1)
    L1_t = torch.tensor(np.asarray(lap1d(N1, jnp.float32)))
    L2_t = torch.tensor(np.asarray(lap1d(N2, jnp.float32)))
    B_t = torch.randn(N1 * N2, NCOLS)

    class KronSum(xitorch.LinearOperator):
        def __init__(self):
            super().__init__(shape=(N1 * N2, N1 * N2), is_hermitian=True,
                             dtype=torch.float32)

        def _getparamnames(self, prefix=""):
            return []

        def _mv(self, x):
            X = x.reshape(*x.shape[:-1], N1, N2)
            Y = torch.einsum("ij,...jk->...ik", L1_t, X) \
                + torch.einsum("...jk,lk->...jl", X, L2_t)
            return Y.reshape(*x.shape)

    A = KronSum()
    with torch.no_grad():
        t0 = time.perf_counter()
        ref_solve(A, B_t, method="cg", rtol=1e-5, atol=1e-6, max_niter=600)
        dt = time.perf_counter() - t0
    return round(1.0 / dt, 3)


if __name__ == "__main__":
    main()
