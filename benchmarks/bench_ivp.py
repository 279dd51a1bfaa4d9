"""solve_ivp throughput: batched adaptive RK45 trajectories (config 4).

Workload: B independent damped-driven oscillators with per-trajectory
stiffness, integrated over 64 output times with rk45.  Ours vmaps the
adaptive stepper (per-trajectory accept/reject — a capability the
reference lacks: its adaptive loop is Python-sequential with one global
step size, reference solve_ivp.py:34-35 documents no-vmap).  The
reference comparison integrates the same physics as one batched torch
system (its error norm couples the batch, so easy trajectories are
dragged to the stiffest one's step size — that IS its batched semantics).

Run: python benchmarks/bench_ivp.py [--cpu] [--no-ref]
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

B = int(os.environ.get("XT_IVP_BATCH", "512"))
M = int(os.environ.get("XT_IVP_MASSES", "32"))  # oscillators per chain
NT = 64
K = 8



def f_osc(t, y, w):
    # y = (x, v) of an M-mass coupled chain; per-trajectory stiffness w.
    # Workload shape: 2*M state dims per trajectory so both sides run a
    # real vector field, not a scalar toy.
    x, v = y[..., 0, :], y[..., 1, :]
    lap = 2.0 * x
    lap = lap - jnp.concatenate([x[..., 1:], jnp.zeros_like(x[..., :1])], -1)
    lap = lap - jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], -1)
    a = -(w[..., None] ** 2) * x - 0.5 * lap - 0.1 * v + jnp.sin(t)
    return jnp.stack([v, a], axis=-2)


def main():
    _maybe_force_cpu()
    from xitorch_tpu.integrate import solve_ivp

    platform = jax.devices()[0].platform
    ts = jnp.linspace(0.0, 6.0, NT)
    ws = 1.0 + 1.0 * jax.random.uniform(jax.random.PRNGKey(0), (B,),
                                        jnp.float32)
    y0 = jnp.stack([jnp.ones((B, M), jnp.float32),
                    jnp.zeros((B, M), jnp.float32)], axis=-2)

    one = lambda y0, w: solve_ivp(f_osc, ts, y0, params=(w,), method="rk45",
                                  rtol=1e-6, atol=1e-8)
    batched = jax.vmap(one)

    def run_k(y0, ws, nk):
        def body(s, k):
            sol = batched(y0 + 0.0 * s, ws)
            return s + jnp.sum(sol[-1]), None
        s, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s

    f1 = jax.jit(lambda y0, ws: run_k(y0, ws, 1))
    fK = jax.jit(lambda y0, ws: run_k(y0, ws, K))

    # accuracy gate vs a tighter-tolerance integration of one trajectory
    # (f32 forward over a 6s horizon: 1e-3 agreement is the honest bar)
    sol = batched(y0, ws)
    ref0 = solve_ivp(f_osc, ts, y0[0], params=(ws[0],), method="rk45",
                     rtol=1e-8, atol=1e-10)
    err = float(jnp.max(jnp.abs(sol[0] - ref0)))
    assert err < 1e-3, "rk45 accuracy gate failed: %g" % err

    def timed(f, rep=3):
        float(f(y0, ws))
        out = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(y0, ws))
            out.append(time.perf_counter() - t0)
        return min(out)

    t1, tK = timed(f1), timed(fK)
    per = max((tK - t1) / (K - 1), 1e-9)
    result = {
        "metric": "batched rk45 trajectories/sec (B=%d chains of %d masses, "
                  "nt=%d, backend=%s, per-trajectory adaptive steps, "
                  "amortized over %d calls)" % (B, M, NT, platform, K),
        "value": round(B / per, 1),
        "unit": "trajectories/sec",
    }

    if "--no-ref" not in sys.argv:
        try:
            result["ref_trajectories_per_sec"] = _ref_measure(ws)
            result["vs_ref"] = round(result["value"]
                                     / result["ref_trajectories_per_sec"], 1)
        except Exception as e:  # pragma: no cover
            result["ref_error"] = str(e)[:120]
    print(json.dumps(result), flush=True)


def _ref_measure(ws):
    """Reference CPU xitorch: same physics as ONE batched torch system."""
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    from xitorch.integrate import solve_ivp as ivp_ref

    torch.set_num_threads(1)
    ts_t = torch.linspace(0.0, 6.0, NT, dtype=torch.float32)
    w_t = torch.tensor(np.asarray(ws), dtype=torch.float32)
    y0_t = torch.stack([torch.ones(B, M), torch.zeros(B, M)], dim=-2)

    def f_t(t, y, w):
        x, v = y[..., 0, :], y[..., 1, :]
        lap = 2.0 * x
        lap = lap - torch.cat([x[..., 1:], torch.zeros_like(x[..., :1])], -1)
        lap = lap - torch.cat([torch.zeros_like(x[..., :1]), x[..., :-1]], -1)
        a = -(w[..., None] ** 2) * x - 0.5 * lap - 0.1 * v + torch.sin(t)
        return torch.stack([v, a], dim=-2)

    with torch.no_grad():
        t0 = time.perf_counter()
        ivp_ref(f_t, ts_t, y0_t, params=(w_t,), method="rk45",
                rtol=1e-6, atol=1e-8)
        dt = time.perf_counter() - t0
    return round(B / dt, 1)


if __name__ == "__main__":
    main()
