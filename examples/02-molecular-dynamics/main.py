"""Molecular dynamics with differentiable trajectories.

TPU-native port of the reference example (examples/02-molecular-dynamics/
main.py:1-125): integrate an N-body gravitational system with
``solve_ivp`` and optimize the initial velocities so the final
configuration matches a target — gradients flow through the whole
trajectory.

Run: python examples/02-molecular-dynamics/main.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))

import jax

if _os.environ.get("XT_CPU") == "1":  # run on CPU when the TPU tunnel is down
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from xitorch_tpu.integrate import solve_ivp


def dydt(t, state, masses):
    """state: {"pos": (n,2), "vel": (n,2)}; pairwise gravity."""
    pos, vel = state["pos"], state["vel"]
    disp = pos[None, :, :] - pos[:, None, :]          # (n, n, 2) r_j - r_i
    dist3 = (jnp.sum(disp ** 2, axis=-1) + 1e-6) ** 1.5
    acc = jnp.sum(masses[None, :, None] * disp / dist3[..., None], axis=1)
    return {"pos": vel, "vel": acc}


def trajectory(v0, pos0, masses, ts):
    y0 = {"pos": pos0, "vel": v0}
    return solve_ivp(dydt, ts, y0, params=(masses,), method="rk45",
                     atol=1e-8, rtol=1e-7)


def main():
    n = 4
    key = jax.random.PRNGKey(0)
    pos0 = jax.random.normal(key, (n, 2)) * 1.5
    masses = jnp.ones((n,))
    ts = jnp.linspace(0.0, 2.0, 20)
    target = jnp.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])

    def loss_fn(v0):
        yt = trajectory(v0, pos0, masses, ts)
        return jnp.mean((yt["pos"][-1] - target) ** 2)

    v0 = jnp.zeros((n, 2))
    optimizer = optax.adam(0.1)
    opt_state = optimizer.init(v0)

    @jax.jit
    def step(v0, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(v0)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(v0, updates), opt_state, loss

    for i in range(60):
        v0, opt_state, loss = step(v0, opt_state)
        if i % 10 == 0:
            print("iter %3d: loss %.6f" % (i, float(loss)))
    print("final loss: %.6f" % float(loss_fn(v0)))


if __name__ == "__main__":
    main()
