"""Neural ODE — continuous-depth model on xitorch_tpu.integrate.solve_ivp.

The layer's forward pass integrates dz/dt = f(t, z; θ) with the adaptive
RK45 solver; training gradients flow through the trajectory (default:
exact discrete adjoint via reverse-AD through the bounded solver scan;
``adjoint="backsolve"`` gives the O(1)-memory continuous adjoint).
Together with models.deq (equilibrium) and models.scf (nested eig/fixed
point) this covers the framework's implicit-model families.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from xitorch_tpu.integrate import solve_ivp

__all__ = ["NODEParams", "init_node", "node_forward", "node_loss"]


class NODEParams(NamedTuple):
    W1: jnp.ndarray    # (h, h+1) time-conditioned input weight
    b1: jnp.ndarray    # (h,)
    W2: jnp.ndarray    # (h, h)
    b2: jnp.ndarray    # (h,)
    Win: jnp.ndarray   # (h, d_in)
    Wout: jnp.ndarray  # (o, h)
    bout: jnp.ndarray  # (o,)


def init_node(key, d_in: int, hidden: int, d_out: int, dtype=jnp.float32) -> NODEParams:
    ks = jax.random.split(key, 4)
    s = 1.0 / hidden ** 0.5
    return NODEParams(
        W1=jax.random.normal(ks[0], (hidden, hidden + 1), dtype) * s,
        b1=jnp.zeros((hidden,), dtype),
        W2=jax.random.normal(ks[1], (hidden, hidden), dtype) * s,
        b2=jnp.zeros((hidden,), dtype),
        Win=jax.random.normal(ks[2], (hidden, d_in), dtype) / d_in ** 0.5,
        Wout=jax.random.normal(ks[3], (d_out, hidden), dtype) * s,
        bout=jnp.zeros((d_out,), dtype),
    )


def _dynamics(t, z, W1, b1, W2, b2):
    # z: (batch, h); time-conditioned two-layer MLP vector field
    tcol = jnp.broadcast_to(t, (*z.shape[:-1], 1)).astype(z.dtype)
    zt = jnp.concatenate([z, tcol], axis=-1)
    h = jnp.tanh(zt @ W1.T + b1)
    return jnp.tanh(h @ W2.T + b2)


def node_forward(params: NODEParams, x: jnp.ndarray,
                 t1: float = 1.0, method: str = "rk45",
                 adjoint: str = "autodiff",
                 solver_kwargs: Optional[dict] = None) -> jnp.ndarray:
    """x (batch, d_in) -> (batch, d_out), integrating the hidden state from
    t=0 to t1."""
    cfg = {"atol": 1e-6, "rtol": 1e-5, "max_steps": 256}
    if method not in ("rk45", "rk23"):
        cfg = {}
    if solver_kwargs:
        cfg.update(solver_kwargs)
    z0 = x @ params.Win.T
    ts = jnp.asarray([0.0, t1], dtype=x.dtype)
    zt = solve_ivp(_dynamics, ts, z0,
                   params=(params.W1, params.b1, params.W2, params.b2),
                   method=method, adjoint=adjoint, **cfg)
    return zt[-1] @ params.Wout.T + params.bout


def node_loss(params: NODEParams, x: jnp.ndarray, y: jnp.ndarray,
              **kwargs) -> jnp.ndarray:
    pred = node_forward(params, x, **kwargs)
    return jnp.mean((pred - y) ** 2)
