"""TPU perf-regression gate (VERDICT round-1 item 8, TPU half).

CI has no TPU, so the chip-side counterpart of ``tests/test_perf_floors.py``
is this script: it re-measures a few representative amortized TPU workloads
and fails (exit 1) if any exceeds its committed ceiling in
``benchmarks/perf_floors.json`` (keys prefixed ``tpu_``).  Convergence
warnings are errors, per the reference benchmark policy
(/root/reference/benchmarks/benchmarks_solve.py:61-65).

Timing follows the CLAUDE.md tunnel rule: amortize K calls inside one
jitted program and force a scalar host fetch — single-dispatch timings
measure the ~30 ms tunnel round trip, not the chip.

Run:        python benchmarks/check_tpu_floors.py
Re-baseline: python benchmarks/check_tpu_floors.py --update
            (writes measured_s and ceiling_s = 3x measured back to the json)
"""
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _common import maybe_force_cpu  # noqa: E402

maybe_force_cpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import xitorch_tpu as xt  # noqa: E402
from xitorch_tpu.linalg import solve, symeig  # noqa: E402
from xitorch_tpu.utils.exceptions import ConvergenceWarning  # noqa: E402

_FLOORS = os.path.join(os.path.dirname(__file__), "perf_floors.json")
_K = 20  # amortization factor: calls fused per timed dispatch


def _amortized(make_fn, rep=3):
    """min over reps of (time of K fused calls)/K, execution forced by a
    scalar host fetch."""
    fn = jax.jit(make_fn(_K))
    float(fn())  # compile + warm
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        float(fn())
        ts.append((time.perf_counter() - t0) / _K)
    return min(ts)


def bench_structured_cg():
    """Headline-shaped structured solve, smaller B to keep the gate fast."""
    from xitorch_tpu import TridiagLowRankOperator
    B, n = 128, 1024
    rng = np.random.default_rng(0)
    d = jnp.asarray(3.0 + rng.random((B, n)), jnp.float32)
    c = jnp.asarray(0.5 * rng.standard_normal((B, n - 1)), jnp.float32)
    A = TridiagLowRankOperator(d, c)
    b = jnp.asarray(rng.standard_normal((B, n, 1)), jnp.float32)

    def make(K):
        def run():
            acc = 0.0
            x = b
            for _ in range(K):
                x = solve(A, x / jnp.linalg.norm(x), method="structured_cg",
                          rtol=1e-5, atol=1e-7)
                acc = acc + jnp.sum(x)
            return acc
        return run
    return make


def bench_jacobi_eigh():
    """Dense batched eigh on the Pallas Jacobi path (config-2 shape)."""
    B, n = 64, 256
    rng = np.random.default_rng(1)
    a = rng.standard_normal((B, n, n))
    mats = jnp.asarray((a + np.swapaxes(a, -1, -2)) / 2, jnp.float32)

    def make(K):
        def run():
            # serialize through acc: identical repeated calls would be
            # CSE'd by XLA into one, under-reporting K-fold
            acc = jnp.asarray(0.0, jnp.float32)
            for _ in range(K):
                Ai = xt.LinearOperator.m(mats + acc * 1e-30,
                                         is_hermitian=True)
                lam, _ = symeig(Ai, n, "lowest", method="exacteig")
                acc = acc + jnp.sum(lam)
            return acc
        return run
    return make


_BENCHES = {
    "tpu_structured_cg_b128_n1024": bench_structured_cg,
    "tpu_exacteig_b64_n256": bench_jacobi_eigh,
}


def main():
    update = "--update" in sys.argv
    print("backend:", jax.devices()[0].platform, flush=True)
    with open(_FLOORS) as f:
        floors = json.load(f)

    failed = []
    for key, maker in _BENCHES.items():
        with warnings.catch_warnings():
            warnings.simplefilter("error", ConvergenceWarning)
            t = _amortized(maker())
        entry = floors.get(key)
        if update or entry is None:
            floors[key] = {"measured_s": round(t, 6),
                           "ceiling_s": round(3 * t, 6)}
            print("[BASELINED] %s: %.4f ms (ceiling %.4f ms)"
                  % (key, 1e3 * t, 3e3 * t), flush=True)
        else:
            ok = t < entry["ceiling_s"]
            print("[%s] %s: %.4f ms vs ceiling %.4f ms"
                  % ("OK" if ok else "FAIL", key, 1e3 * t,
                     1e3 * entry["ceiling_s"]), flush=True)
            if not ok:
                failed.append(key)

    if update or any(k not in floors for k in _BENCHES):
        with open(_FLOORS, "w") as f:
            json.dump(floors, f, indent=1)
            f.write("\n")

    if failed:
        raise SystemExit("TPU perf regression: %s" % ", ".join(failed))
    print("all TPU floors hold")


if __name__ == "__main__":
    main()
