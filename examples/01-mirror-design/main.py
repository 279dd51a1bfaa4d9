"""Mirror design with a rootfinder inside the training loop.

TPU-native port of the reference example (examples/01-mirror-design/
main.py:1-155): a neural network parameterizes a 1-D mirror height profile
y = h(x; θ); rays from a point source intersect the mirror (the
intersection parameter solves a nonlinear equation -> ``rootfinder``),
reflect off the local normal (from jax.grad of the surface), and the
network is trained so every reflected ray passes near a focal point.
Gradients flow through the root *implicitly*.

Run: python examples/01-mirror-design/main.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))

import jax

if _os.environ.get("XT_CPU") == "1":  # run on CPU when the TPU tunnel is down
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from xitorch_tpu.optimize import rootfinder


def init_mlp(key, sizes=(1, 32, 32, 1)):
    params = []
    for k, (a, b) in zip(jax.random.split(key, len(sizes) - 1),
                         zip(sizes[:-1], sizes[1:])):
        params.append((jax.random.normal(k, (b, a)) / a ** 0.5, jnp.zeros((b,))))
    return params


def mlp(params, x):
    h = x
    for W, b in params[:-1]:
        h = jnp.tanh(W @ h + b)
    W, b = params[-1]
    return (W @ h + b)[0]


def surface_height(params, x):
    # mirror profile around y ~ -1
    return -1.0 + 0.5 * mlp(params, jnp.asarray([x]))


def main():
    key = jax.random.PRNGKey(42)
    params = init_mlp(key)
    source = jnp.asarray([0.0, 1.0])
    focus = jnp.asarray([0.5, 1.0])
    angles = jnp.linspace(-0.45, 0.45, 16) - jnp.pi / 2  # downward fan

    def reflect_ray(params, angle):
        d = jnp.asarray([jnp.cos(angle), jnp.sin(angle)])
        flat, unflatten = ravel_pytree(params)

        # intersection: source + t d hits the surface -> root of g(t)
        def g(t, flat):
            p = unflatten(flat)
            pt = source + t * d
            return pt[1] - surface_height(p, pt[0])

        t0 = jnp.asarray(2.0)
        tstar = rootfinder(g, t0, params=(flat,), method="broyden1",
                           f_tol=1e-10, maxiter=200)
        hit = source + tstar * d

        # normal from the surface gradient
        dhdx = jax.grad(lambda x: surface_height(params, x))(hit[0])
        nvec = jnp.asarray([-dhdx, 1.0])
        nvec = nvec / jnp.linalg.norm(nvec)
        r = d - 2 * jnp.dot(d, nvec) * nvec  # reflected direction

        # distance of the focal point from the reflected ray
        to_focus = focus - hit
        perp = to_focus - jnp.dot(to_focus, r) * r
        return jnp.sum(perp ** 2)

    def loss_fn(params):
        return jnp.mean(jax.vmap(lambda a: reflect_ray(params, a))(angles))

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(100):
        params, opt_state, loss = step(params, opt_state)
        if i % 20 == 0:
            print("iter %3d: focus loss %.6f" % (i, float(loss)))
    print("final: %.6f" % float(loss))


if __name__ == "__main__":
    main()
