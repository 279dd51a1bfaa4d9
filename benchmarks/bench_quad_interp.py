"""TPU throughput for the last three unmeasured functionals (VERDICT r3
item 5): quad (leggauss + tanhsinh), Interp1D (cspline batch eval), SQuad
(cspline integrate) — amortized chip numbers vs the torch reference on CPU
(same workloads, single thread), the bench_symeig methodology.

Workloads (f32 on TPU, f64 on the CPU reference — each side's native
precision; accuracy gates vs f64 oracles run BEFORE timing):
* quad:    E = int_0^2 exp(-a x^2) cos(b x) dx, batch 4096 (a, b) pairs,
           leggauss n=64 / tanhsinh n=61.  Metric: integrals/sec.
* interp:  cspline Interp1D with 512 curves on 1000 shared knots,
           evaluated at 2048 query points.  Metric: curve-evals/sec
           (one curve x 2048 queries = 1 eval).
* squad:   SQuad(x).integrate over 512 sampled curves on 1000 points.
           Metric: integrations/sec.

Run: python benchmarks/bench_quad_interp.py [--suite quad|interp|squad|all]
     [--with-ref] [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

_maybe_force_cpu()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xitorch_tpu.integrate import quad, SQuad
from xitorch_tpu.interpolate import Interp1D

K = 8           # interp/squad amortization chain length
KQ = 2048       # quad: the batched integral is ~microseconds on chip, so
# the marginal chain must be long enough to rise above tunnel timing
# noise (K=8 measured a clamped 0-second marginal)
NB_QUAD = 4096
NCURVE, NKNOT, NQ = 512, 1000, 2048


def _timed_pair(f1, fK, *args, rep=3, kk=K):
    float(f1(*args))
    float(fK(*args))

    def timed(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((timed(fK) - timed(f1)) / (kk - 1), 1e-9)


def _emit(metric, count, per):
    print(json.dumps({"metric": metric, "value": round(count / per, 1),
                      "unit": metric.split()[-1]}), flush=True)


def _scan(body, x, kk=K):
    def fn(m, nk):
        def b(s, k):
            return s + jnp.sum(body(m + (k * 0.0))), None
        s, _ = lax.scan(b, jnp.asarray(0.0, m.dtype), jnp.arange(nk))
        return s
    return (jax.jit(lambda m: fn(m, 1)), jax.jit(lambda m: fn(m, kk)),
            kk)


def _quad_oracle(a, b):
    # dense leggauss at n=512 f64 as the oracle
    t, w = np.polynomial.legendre.leggauss(512)
    x = (t + 1.0)                      # [0, 2]
    return ((np.exp(-a[:, None] * x[None] ** 2)
             * np.cos(b[:, None] * x[None])) * w[None]).sum(-1)


def suite_quad(dt):
    rng = np.random.default_rng(5)
    ab = np.stack([rng.uniform(0.3, 2.0, NB_QUAD),
                   rng.uniform(0.0, 3.0, NB_QUAD)], axis=-1)
    oracle = _quad_oracle(ab[:, 0], ab[:, 1])
    abj = jnp.asarray(ab, dt)

    def fcn(x, a, b):
        return jnp.exp(-a * x ** 2) * jnp.cos(b * x)

    for method, n in (("leggauss", 64), ("tanhsinh", 61)):
        def body(p, method=method, n=n):
            return quad(fcn, jnp.asarray(0.0, dt), jnp.asarray(2.0, dt),
                        params=(p[:, 0], p[:, 1]), method=method, n=n)
        out = jax.jit(body)(abj)
        err = float(np.max(np.abs(np.asarray(out, np.float64) - oracle)))
        assert err < 2e-5, "quad %s err %g" % (method, err)
        f1, fK, kk = _scan(body, abj, kk=KQ)
        per = _timed_pair(f1, fK, abj, kk=kk)
        _emit("batched quad (%s, n=%d) B=%d integrals/sec"
              % (method, n, NB_QUAD), NB_QUAD, per)


def _interp_data(dt):
    rng = np.random.default_rng(6)
    # nonuniform but with spacing bounded below: bare uniform draws give
    # ~1e-6 min gaps at 1000 knots, which makes the f32 spline tridiag
    # ill-conditioned on TPU (measured 0.5 abs err); jittered-uniform
    # keeps min spacing >= 0.5/NKNOT — a realistic sampling grid
    x = (np.arange(NKNOT) + 0.25 * rng.uniform(-1, 1, NKNOT)) / NKNOT
    x = np.sort(x); x[0], x[-1] = 0.0, 1.0
    y = np.cumsum(rng.standard_normal((NCURVE, NKNOT)), axis=-1) / 30.0
    xq = np.linspace(0.001, 0.999, NQ)
    return (jnp.asarray(x, dt), jnp.asarray(y, dt), jnp.asarray(xq, dt),
            x, y, xq)


def suite_interp(dt):
    xj, yj, xqj, x, y, xq = _interp_data(dt)

    def body(yy):
        return Interp1D(xj, yy, method="cspline")(xqj)

    # oracle: scipy f64 cubic spline with our cspline DEFAULT bc
    # (not-a-knot, matching the reference Interp1D default)
    out = np.asarray(jax.jit(body)(yj), np.float64)
    from scipy.interpolate import CubicSpline
    ref = CubicSpline(x, y[:16].T, bc_type="not-a-knot")(xq).T
    err = float(np.max(np.abs(out[:16] - ref)))
    assert err < 2e-4 * max(1.0, float(np.max(np.abs(ref)))), err
    f1, fK, kk = _scan(body, yj)
    per = _timed_pair(f1, fK, yj, kk=kk)
    _emit("Interp1D cspline %d curves x %d knots x %d queries "
          "curve-evals/sec" % (NCURVE, NKNOT, NQ), NCURVE, per)


def suite_squad(dt):
    xj, yj, _, x, y, _ = _interp_data(dt)
    sq = SQuad(xj, method="cspline")

    def body(yy):
        return sq.integrate(yy)

    out = np.asarray(jax.jit(body)(yj), np.float64)
    from scipy.interpolate import CubicSpline
    ref = CubicSpline(x, y[:16].T, bc_type="natural").integrate(x[0], x[-1])
    err = float(np.max(np.abs(out[:16] - ref)))
    assert err < 2e-4 * max(1.0, float(np.max(np.abs(ref)))), err
    # SQuad.integrate is a single weighted reduction — like quad it
    # needs the long amortization chain to rise above tunnel noise
    f1, fK, kk = _scan(body, yj, kk=KQ)
    per = _timed_pair(f1, fK, yj, kk=kk)
    _emit("SQuad cspline %d curves x %d samples integrations/sec"
          % (NCURVE, NKNOT), NCURVE, per)


def _ref(suites):
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch.integrate as xint
    import xitorch.interpolate as xinterp
    torch.set_num_threads(1)

    def timeit(f, rep=2):
        f()
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
        return min(ts)

    if "quad" in suites:
        rng = np.random.default_rng(5)
        a = torch.tensor(rng.uniform(0.3, 2.0, NB_QUAD))
        b = torch.tensor(rng.uniform(0.0, 3.0, NB_QUAD))

        def fcn(x, a, b):
            return torch.exp(-a * x ** 2) * torch.cos(b * x)

        per = timeit(lambda: xint.quad(
            fcn, torch.tensor(0.0, dtype=torch.float64),
            torch.tensor(2.0, dtype=torch.float64), params=(a, b),
            method="leggauss", n=64))
        _emit("REF quad (leggauss, n=64) B=%d integrals/sec" % NB_QUAD,
              NB_QUAD, per)
    if "interp" in suites or "squad" in suites:
        rng = np.random.default_rng(6)
        x = np.sort(rng.uniform(0, 1, NKNOT)); x[0], x[-1] = 0.0, 1.0
        y = np.cumsum(rng.standard_normal((NCURVE, NKNOT)), axis=-1) / 30.0
        xq = np.linspace(0.001, 0.999, NQ)
        xt_, yt, xqt = (torch.tensor(v) for v in (x, y, xq))
        if "interp" in suites:
            per = timeit(lambda: xinterp.Interp1D(
                xt_, yt, method="cspline")(xqt))
            _emit("REF Interp1D cspline %d curves x %d knots x %d queries "
                  "curve-evals/sec" % (NCURVE, NKNOT, NQ), NCURVE, per)
        if "squad" in suites:
            sq = xint.SQuad(xt_, method="cspline")
            per = timeit(lambda: sq.integrate(yt))
            _emit("REF SQuad cspline %d curves x %d samples "
                  "integrations/sec" % (NCURVE, NKNOT), NCURVE, per)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all",
                    choices=["quad", "interp", "squad", "all"])
    ap.add_argument("--with-ref", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    suites = (["quad", "interp", "squad"] if args.suite == "all"
              else [args.suite])
    if jax.default_backend() != "tpu":
        jax.config.update("jax_enable_x64", True)
    dt = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    print(json.dumps({"backend": jax.default_backend(),
                      "dtype": str(dt.__name__)}), flush=True)
    for s in suites:
        {"quad": suite_quad, "interp": suite_interp,
         "squad": suite_squad}[s](dt)
    if args.with_ref:
        _ref(suites)


if __name__ == "__main__":
    main()
