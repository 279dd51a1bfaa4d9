"""Model-level benchmark: DEQ training step (equilibrium forward + implicit
backward + adam) on TPU, amortized chip throughput in samples/sec.

Run: python benchmarks/bench_deq.py
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



def main():
    _maybe_force_cpu()
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
    }))


if __name__ == "__main__":
    main()
