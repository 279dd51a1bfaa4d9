"""Deep Equilibrium (DEQ) model — the framework's flagship demonstration.

A DEQ layer's forward pass IS ``xitorch_tpu.optimize.equilibrium``: the
hidden state solves z* = tanh(z W^T + x U^T + b), and training gradients
flow through the *solution* via the implicit function theorem — exactly the
capability the reference library exists for (its DQC downstream uses the
same pattern for SCF loops).

Shardable: batch over a "dp" mesh axis, hidden dim over "tp" (annotations
only; XLA/GSPMD inserts the psum collectives over ICI).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xitorch_tpu.optimize import equilibrium

__all__ = ["DEQParams", "init_deq", "deq_forward", "deq_loss", "train_step"]


class DEQParams(NamedTuple):
    W: jnp.ndarray      # (h, h)
    U: jnp.ndarray      # (h, d)
    b: jnp.ndarray      # (h,)
    Wout: jnp.ndarray   # (o, h)
    bout: jnp.ndarray   # (o,)


def init_deq(key, d_in: int, hidden: int, d_out: int, dtype=jnp.float32) -> DEQParams:
    k1, k2, k3 = jax.random.split(key, 3)
    # spectral scaling keeps the fixed-point map contractive
    W = jax.random.normal(k1, (hidden, hidden), dtype) * (0.5 / hidden ** 0.5)
    U = jax.random.normal(k2, (hidden, d_in), dtype) * (1.0 / d_in ** 0.5)
    b = jnp.zeros((hidden,), dtype)
    Wout = jax.random.normal(k3, (d_out, hidden), dtype) * (1.0 / hidden ** 0.5)
    bout = jnp.zeros((d_out,), dtype)
    return DEQParams(W, U, b, Wout, bout)


def _cell(z, W, U, b, x):
    # z: (batch, h); x: (batch, d)
    return jnp.tanh(z @ W.T + x @ U.T + b)


def deq_forward(params: DEQParams, x: jnp.ndarray,
                solver_kwargs: Optional[dict] = None,
                shard: bool = False) -> jnp.ndarray:
    """Forward pass: solve the equilibrium and apply the readout.

    x: (batch, d_in) -> (batch, d_out).  Gradients w.r.t. params flow through
    the fixed point implicitly (O(1) solver-memory backward).
    """
    cfg = {"method": "anderson_acc", "feat_ndims": 1, "msize": 6,
           "maxiter": 80, "f_tol": 1e-4, "x_tol": 1e-6}
    if solver_kwargs:
        cfg.update(solver_kwargs)
    batch = x.shape[0]
    hidden = params.W.shape[0]
    z0 = jnp.zeros((batch, hidden), dtype=x.dtype)

    def f(z, W, U, b, x):
        zn = _cell(z, W, U, b, x)
        if shard:
            zn = jax.lax.with_sharding_constraint(zn, P("dp", "tp"))
        return zn

    zstar = equilibrium(f, z0, params=(params.W, params.U, params.b, x), **cfg)
    return zstar @ params.Wout.T + params.bout


def deq_loss(params: DEQParams, x: jnp.ndarray, y: jnp.ndarray,
             solver_kwargs: Optional[dict] = None, shard: bool = False) -> jnp.ndarray:
    pred = deq_forward(params, x, solver_kwargs=solver_kwargs, shard=shard)
    return jnp.mean((pred - y) ** 2)


def train_step(params: DEQParams, opt_state, x, y, optimizer,
               solver_kwargs: Optional[dict] = None, shard: bool = False):
    """One optimization step: implicit gradients through the DEQ solve."""
    loss, grads = jax.value_and_grad(deq_loss)(params, x, y,
                                               solver_kwargs=solver_kwargs,
                                               shard=shard)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    import optax
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
