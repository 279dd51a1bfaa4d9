"""Pallas vs XLA: batched tridiagonal (Thomas) solve on TPU.

The cubic-spline construction (reference
/root/reference/xitorch/_impls/interpolate/interp_1d.py:296-405) reduces
to K independent tridiagonal systems.  Two TPU lowerings compete:

* ``tridiag_solve_pallas`` (xitorch_tpu/ops/tridiag.py) — one VMEM-resident
  Thomas sweep per (n, tile) panel, systems in the lane dimension;
* XLA ``lax.linalg.tridiagonal_solve`` vmapped over systems.

Run: python benchmarks/bench_tridiag.py [--cpu]
Prints one JSON line per (K, n) point with both times and the speedup.
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

from xitorch_tpu.ops.tridiag import tridiag_solve_pallas



def make_systems(K, n, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # diagonally dominant: spline-like systems (d ~ 4, off-diag ~ 1)
    d = 4.0 + jax.random.uniform(k1, (K, n), jnp.float32)
    dl = jax.random.uniform(k2, (K, n), jnp.float32)
    du = jax.random.uniform(k3, (K, n), jnp.float32)
    b = jax.random.normal(k4, (K, n), jnp.float32)
    return dl, d, du, b


def xla_solve(dl, d, du, b):
    from jax.lax.linalg import tridiagonal_solve as tri

    return jax.vmap(lambda L, D, U, B: tri(
        L.at[0].set(0.0), D, U.at[-1].set(0.0), B[:, None])[:, 0])(
        dl, d, du, b)


def timed(f, args, rep=5):
    float(jnp.sum(f(*args)))  # compile + warmup, host fetch forces sync
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    _maybe_force_cpu()
    platform = jax.devices()[0].platform
    key = jax.random.PRNGKey(0)
    for K, n in [(2048, 256), (4096, 512), (8192, 1024)]:
        # small problems need many reps for the marginal cost to rise above
        # the ~30 ms tunnel round-trip noise (K=2048,n=256 measured 0.0s
        # at 32 reps -> target ~256 reps there)
        REPS = max(32, (128 * 1024 * 1024) // (K * n))
        dl, d, du, b = make_systems(K, n, key)
        f_pal = jax.jit(lambda dl, d, du, b: tridiag_solve_pallas(dl, d, du, b))
        f_xla = jax.jit(xla_solve)

        # correctness gate: both lowerings agree
        xp = f_pal(dl, d, du, b)
        xx = f_xla(dl, d, du, b)
        err = float(jnp.max(jnp.abs(xp - xx)))
        assert err < 1e-4, "pallas vs xla mismatch: %g" % err

        # marginal-cost methodology (see bench.py): the host<->device
        # round trip of this image's TPU tunnel is ~30 ms — time 1 rep and
        # REPS reps inside jit and difference out the fixed dispatch cost
        def repn(f, nrep):
            def g(dl, d, du, b):
                s = jnp.asarray(0.0, jnp.float32)
                for i in range(nrep):
                    s = s + jnp.sum(f(dl, d + 0.0 * s, du, b))
                return s
            return jax.jit(g)

        def marginal(f):
            t1 = timed(repn(f, 1), (dl, d, du, b))
            tN = timed(repn(f, REPS), (dl, d, du, b))
            return max((tN - t1) / (REPS - 1), 1e-9)

        t_pal = marginal(f_pal)
        t_xla = marginal(f_xla)
        print(json.dumps({
            "metric": "batched tridiag solve (K=%d, n=%d, f32, backend=%s), "
                      "amortized over %d calls" % (K, n, platform, REPS),
            "pallas_s": round(t_pal, 6),
            "xla_s": round(t_xla, 6),
            "speedup_pallas_vs_xla": round(t_xla / t_pal, 2),
            "max_abs_err": err,
        }), flush=True)


if __name__ == "__main__":
    main()
