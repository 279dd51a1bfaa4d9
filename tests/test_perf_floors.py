"""Performance-regression gates (VERDICT round-1 item 8).

The committed ``benchmarks/perf_floors.json`` holds wall-clock ceilings for
a few representative CPU workloads, set at ~5x the time measured on the
reference machine — loose enough to absorb CI hardware variance, tight
enough that a genuinely large regression (an accidental O(n) blowup, a
lost jit cache, a solver suddenly burning its whole iteration budget)
fails the suite.  Convergence warnings are treated as errors, the
reference benchmark policy (/root/reference/benchmarks/benchmarks_solve.py:61-65).

The TPU counterpart is ``benchmarks/check_tpu_floors.py`` (a script, since
CI has no TPU): it re-measures the amortized grid floors on the chip.
"""
import json
import os
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import solve, symeig
from xitorch_tpu.integrate import solve_ivp
from xitorch_tpu.utils.exceptions import ConvergenceWarning

_FLOORS = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "perf_floors.json")


def _floors():
    with open(_FLOORS) as f:
        return json.load(f)


def _timeit(f, rep=3):
    f()  # compile
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _check(key, run):
    ceiling = _floors()[key]["ceiling_s"]
    with warnings.catch_warnings():
        # convergence-as-error: a run that only meets the clock by
        # abandoning convergence must fail (reference benchmark policy)
        warnings.simplefilter("error", ConvergenceWarning)
        t = _timeit(run)
    assert t < ceiling, (
        "perf regression on %r: %.4fs vs committed ceiling %.4fs "
        "(~5x the reference-machine time; see benchmarks/perf_floors.json)"
        % (key, t, ceiling))


def test_perf_floor_solve_cg_batched():
    rng = np.random.default_rng(0)
    n, B, nc = 256, 16, 4
    d = jnp.asarray(3.0 + rng.random((B, n)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, n, 2)) / np.sqrt(n), jnp.float32)
    mat = d[..., None] * jnp.eye(n, dtype=jnp.float32) \
        + jnp.einsum("bnr,bmr->bnm", v, v)
    A = LinearOperator.m(mat, is_hermitian=True)
    b = jnp.asarray(rng.standard_normal((B, n, nc)), jnp.float32)
    fn = jax.jit(lambda: solve(A, b, method="cg", rtol=1e-6, atol=1e-8,
                               posdef=True))
    _check("solve_cg_b16_n256_f32", fn)


def test_perf_floor_symeig_exacteig_batched():
    rng = np.random.default_rng(1)
    n, B = 128, 16
    a = rng.standard_normal((B, n, n))
    mat = jnp.asarray((a + np.swapaxes(a, -1, -2)) / 2 + n * np.eye(n),
                      jnp.float32)
    A = LinearOperator.m(mat, is_hermitian=True)
    fn = jax.jit(lambda: symeig(A, 8, "lowest", method="exacteig"))
    _check("symeig_exacteig_b16_n128_f32", fn)


def test_perf_floor_ivp_rk45_vmapped():
    rng = np.random.default_rng(2)
    B, n = 32, 8
    y0 = jnp.asarray(rng.standard_normal((B, n)))
    ts = jnp.linspace(0.0, 2.0, 16)

    def fcn(t, y, a):
        return -a * y + 0.1 * jnp.sin(t)

    a = jnp.asarray(0.7)
    fn = jax.jit(lambda: jax.vmap(
        lambda y: solve_ivp(fcn, ts, y, params=(a,), method="rk45",
                            rtol=1e-6, atol=1e-8))(y0))
    _check("ivp_rk45_vmap_b32", fn)


@pytest.mark.parametrize("key", ["solve_cg_b16_n256_f32",
                                 "symeig_exacteig_b16_n128_f32",
                                 "ivp_rk45_vmap_b32"])
def test_perf_floor_entries_exist(key):
    e = _floors()[key]
    assert e["ceiling_s"] > 0 and "measured_s" in e
