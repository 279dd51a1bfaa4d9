"""Deep Equilibrium model on a toy regression task.

The layer's forward pass is xitorch_tpu.optimize.equilibrium (Anderson
acceleration); training gradients flow through the fixed point via the
implicit function theorem — O(1) solver-memory backward, any order.

Run: python examples/03-deep-equilibrium/main.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))

import jax

if _os.environ.get("XT_CPU") == "1":  # run on CPU when the TPU tunnel is down
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from xitorch_tpu.models.deq import init_deq, deq_loss


def main():
    key = jax.random.PRNGKey(0)
    d_in, hidden, d_out, batch = 8, 32, 1, 128
    params = init_deq(key, d_in, hidden, d_out)

    # toy data: y = sin(w.x)
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    w = jax.random.normal(kw, (d_in,))
    x = jax.random.normal(kx, (batch, d_in))
    y = jnp.sin(x @ w)[:, None]

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(deq_loss)(
            params, x, y,
            solver_kwargs={"maxiter": 60, "msize": 6, "f_tol": 1e-5})
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for i in range(120):
        params, opt_state, loss = step(params, opt_state)
        if i % 30 == 0:
            print("iter %4d: loss %.5f" % (i, float(loss)))
    print("final loss: %.5f" % float(deq_loss(params, x, y)))


if __name__ == "__main__":
    main()
