"""Benchmark: BASELINE config 3 — batched matrix-free CG solve.

Operator: A = diag(d) + tridiagonal coupling + rank-4 term (hermitian,
diagonally dominant), batch 512, n = 1024, ncols = 1, float32, rtol 1e-6
(a TridiagLowRankOperator; on TPU the headline method is the fused Pallas
structured CG whose state and operator data stay VMEM-resident —
ops/structured_cg.py; cg_ir elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

Robustness (round-2 contract): `python bench.py` never crashes without
emitting that line.  The parent process imports no JAX; it (1) probes the
TPU tunnel in a subprocess under a hard timeout, (2) runs the measurement
in a subprocess (retrying TPU once), and (3) falls back to a CPU-labeled
measurement if the tunnel is down — the round-1 failure mode was rc=1 with
no parseable output when the axon backend could not initialize.

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
import subprocess
import sys
import time

BASELINE_SOLVES_PER_SEC = float(os.environ.get("XT_BASELINE", "1375.35"))
PROBE_TIMEOUT = int(os.environ.get("XT_BENCH_PROBE_TIMEOUT", "300"))
MEASURE_TIMEOUT = int(os.environ.get("XT_BENCH_MEASURE_TIMEOUT", "600"))


def _fallback_line(note):
    return {
        "metric": "batched matrix-free solves/sec (benchmark failed: %s)" % note,
        "value": 0.0,
        "unit": "solves/sec",
        "vs_baseline": 0.0,
    }


def probe():
    """Child: touch the default backend with a tiny op; print its platform."""
    import jax
    import jax.numpy as jnp

    x = float(jnp.sum(jnp.ones((128, 128), jnp.float32)))
    assert x == 128.0 * 128.0
    print("PROBE_OK %s" % jax.devices()[0].platform, flush=True)


def measure(backend):
    """Child: run the actual benchmark on `backend` ('default' or 'cpu')."""
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        # CPU fallback: smaller sizes so the run fits the watchdog budget
        # while keeping the same operator/tolerances (honest, labeled).
        batch = int(os.environ.get("XT_BENCH_BATCH", "64"))
        k = int(os.environ.get("XT_BENCH_K", "4"))
        rep = 2
    else:
        batch = int(os.environ.get("XT_BENCH_BATCH", "512"))
        # K=256 starts past the noise wall (each adaptive escalation
        # recompiles runK: 20-60 s through the tunnel)
        k = int(os.environ.get("XT_BENCH_K", "256"))
        rep = 5
    n = int(os.environ.get("XT_BENCH_N", "1024"))

    import jax.numpy as jnp
    from jax import lax

    from xitorch_tpu import TridiagLowRankOperator
    from xitorch_tpu.linalg import solve

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    d = 4.0 + 2.0 * jax.random.uniform(k1, (batch, n), dtype=dtype)
    c = jnp.asarray(1.0, dtype=dtype)
    V = jax.random.normal(k2, (batch, n, 4), dtype=dtype) / (n ** 0.5)
    seed = jax.random.PRNGKey(7)

    # TPU headline: the fused Pallas structured CG (whole solve state +
    # operator data VMEM-resident; measured 1.95M solves/s vs cg_ir's
    # 396k on one v5e).  CPU fallback keeps cg_ir (the structured kernel
    # is TPU-only and would silently fall back to plain cg there).
    default_method = "structured_cg" if backend != "cpu" else "cg_ir"
    method = os.environ.get("XT_BENCH_METHOD", default_method)

    def one_solve(A, b):
        if method == "structured_cg":
            # fused Pallas kernel (ops/structured_cg.py): zero HBM traffic
            # per CG iteration
            return solve(A, b, method="structured_cg", rtol=1e-6, atol=1e-8)
        if method == "cg_ir":
            # mixed-precision iterative refinement: bf16 inner CG + f32
            # residual correction (same final residual quality as f32 CG)
            return solve(A, b, method="cg_ir", posdef=True, rtol=1e-6,
                         atol=1e-8, inner_rtol=5e-2, inner_max_niter=60)
        return solve(A, b, method=method, posdef=True,
                     rtol=1e-6, atol=1e-8, max_niter=200)

    def run_k(d, c, V, seed, nk):
        A = TridiagLowRankOperator(d, c, V)

        def body(s, kk):
            b = jax.random.normal(jax.random.fold_in(seed, kk),
                                  (batch, n, 1), dtype)
            x = one_solve(A, b)
            return s + jnp.sum(x), None

        s, _ = lax.scan(body, jnp.asarray(0.0, dtype), jnp.arange(nk))
        return s

    run1 = jax.jit(lambda d, c, V, seed: run_k(d, c, V, seed, 1))
    k_max = int(os.environ.get("XT_BENCH_K_MAX",
                               "16" if backend == "cpu" else "1024"))

    # correctness gate (convergence required, as in the reference benchmarks)
    A = TridiagLowRankOperator(d, c, V)
    b0 = jax.random.normal(jax.random.fold_in(seed, 0), (batch, n, 1), dtype)
    x0 = one_solve(A, b0)
    resid = float(jnp.max(jnp.linalg.norm(A.mm(x0) - b0, axis=-2)))
    assert resid < 5e-4, "benchmark solve did not converge: resid=%g" % resid

    def timed(f):
        float(f(d, c, V, seed))  # compile + warmup (host fetch forces sync)
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(d, c, V, seed))
            ts.append(time.perf_counter() - t0)
        return ts

    t1s = sorted(timed(run1))
    noise = t1s[-1] - t1s[0]

    # adaptive K: the amortized marginal (tK - t1) must clearly dominate
    # the tunnel/rep noise or the division below measures noise, not the
    # chip.  Hardware lesson (r3): K=16 structured_cg batch-solves fit
    # inside ONE ~30 ms tunnel round trip, the marginal went negative,
    # and the old 1e-9 clamp emitted a nonsense 5e11 solves/s headline.
    while True:
        runK = jax.jit(lambda d, c, V, seed: run_k(d, c, V, seed, k))
        tKs = sorted(timed(runK))
        marginal_best = tKs[0] - t1s[0]
        if marginal_best > max(4.0 * noise, 0.2 * t1s[0]) or k >= k_max:
            break
        k = min(4 * k, k_max)

    def per_solve(tK):
        # marginal per-batch-solve time; min(t1) is the fixed dispatch
        # cost (the tightest observation of it — t1 outlier reps would
        # otherwise make the marginal negative).  The tK/(4k) floor
        # bounds the claim at 4x the raw end-to-end throughput even if
        # the marginal collapses into noise despite the adaptation.
        if k <= 1:
            return tK
        return max((tK - t1s[0]) / (k - 1), tK / (4.0 * k))

    # headline = best-of-reps (chip capability); median + spread ride
    # along so cross-round swings are attributable to tunnel weather vs
    # real regressions (BENCH_r01 2.96M vs r02 1.62M was unexplainable
    # from a single best-of number)
    solves_per_sec = batch / per_solve(tKs[0])
    solves_med = batch / per_solve(tKs[len(tKs) // 2])
    spread_pct = 100.0 * (tKs[-1] - tKs[0]) / tKs[0]

    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": "batched matrix-free solves/sec (%s, backend=%s), amortized "
                  "over %d solves (B=%d, n=%d, f32, residual gate 5e-4)"
                  % (method, platform, k, batch, n),
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
        "value_median": round(solves_med, 2),
        "spread_pct": round(spread_pct, 1),
        "reps_t1_s": [round(t, 5) for t in t1s],
        "reps_tK_s": [round(t, 5) for t in tKs],
    }), flush=True)


def _run_child(args, timeout):
    """Run `python bench.py <args>` and return (rc, stdout) — rc None on
    timeout."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        res = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                             cwd=here, timeout=timeout,
                             stdout=subprocess.PIPE, stderr=sys.stderr)
        return res.returncode, res.stdout.decode("utf-8", "replace")
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode("utf-8", "replace")
        return None, out


def _extract_json(stdout):
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
                if "value" in obj:
                    return obj
            except ValueError:
                pass
    return None


def _probe_said_tpu(out):
    """Parse the PROBE_OK line itself (not the last stdout token — other
    libraries may print after it)."""
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("PROBE_OK"):
            return "cpu" not in line
    return False


def orchestrate():
    # total budget: always leave room to emit a line before any external
    # driver watchdog fires (round-1 failure mode: rc=124, no output)
    t_start = time.time()
    total_budget = int(os.environ.get("XT_BENCH_TOTAL_BUDGET", "1500"))
    cpu_reserve = 320  # CPU fallback (~60 s healthy) + teardown margin

    def remaining():
        return total_budget - (time.time() - t_start)

    # 1. probe the default (TPU tunnel) backend; one retry — transient
    # tunnel latency spikes (or host load) can push the first probe past
    # its budget while the chip itself is healthy
    tpu_ok = False
    for _ in range(2):
        if remaining() < cpu_reserve + 30:
            break
        budget = min(PROBE_TIMEOUT, remaining() - cpu_reserve)
        rc, out = _run_child(["--probe"], budget)
        tpu_ok = rc == 0 and _probe_said_tpu(out)
        if tpu_ok:
            break

    result = None
    if tpu_ok:
        for _ in range(2):  # retry TPU measurement once
            if remaining() < cpu_reserve + 30:
                break
            budget = min(MEASURE_TIMEOUT, remaining() - cpu_reserve)
            rc, out = _run_child(["--measure", "default"], budget)
            # accept a completed JSON line even from a child that printed
            # it and then hung in teardown (the tunnel's signature move)
            result = _extract_json(out)
            if result is not None:
                break
    if result is None:
        rc, out = _run_child(["--measure", "cpu"],
                             max(60, min(300, remaining() - 20)))
        result = _extract_json(out)
        if result is not None:
            # the CPU fallback runs a smaller config (batch 64 vs 512) —
            # flag it so cross-round vs_baseline comparisons don't
            # silently mix incomparable measurements
            result["fallback"] = "cpu"
    if result is None:
        result = _fallback_line("TPU tunnel and CPU fallback both failed")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        probe()
    elif "--measure" in sys.argv:
        measure(sys.argv[sys.argv.index("--measure") + 1])
    else:
        orchestrate()
