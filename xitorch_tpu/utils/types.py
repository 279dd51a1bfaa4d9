"""dtype mapping helpers (parity with /root/reference/xitorch/_utils/types.py:
torch<->numpy dtype map becomes jax<->numpy, plus torch interop for users
migrating from the reference)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["get_np_dtype", "get_jax_dtype", "get_complex_dtype", "get_real_dtype"]

_NP_FROM_JAX = {
    jnp.dtype(jnp.float32): np.float32,
    jnp.dtype(jnp.float64): np.float64,
    jnp.dtype(jnp.bfloat16): np.float32,  # numpy has no bfloat16; promote
    jnp.dtype(jnp.float16): np.float16,
    jnp.dtype(jnp.complex64): np.complex64,
    jnp.dtype(jnp.complex128): np.complex128,
    jnp.dtype(jnp.int32): np.int32,
    jnp.dtype(jnp.int64): np.int64,
    jnp.dtype(jnp.bool_): np.bool_,
}


def get_np_dtype(dtype) -> np.dtype:
    """jax dtype -> numpy dtype."""
    d = jnp.dtype(dtype)
    if d in _NP_FROM_JAX:
        return np.dtype(_NP_FROM_JAX[d])
    return np.dtype(str(d))


def get_jax_dtype(dtype):
    """numpy/torch/str dtype -> jax dtype."""
    s = str(dtype)
    if s.startswith("torch."):
        s = s[len("torch."):]
    return jnp.dtype(s)


def get_complex_dtype(dtype):
    d = jnp.dtype(dtype)
    if jnp.issubdtype(d, jnp.complexfloating):
        return d
    return jnp.dtype(jnp.complex64) if d == jnp.dtype(jnp.float32) \
        else jnp.dtype(jnp.complex128)


def get_real_dtype(dtype):
    d = jnp.dtype(dtype)
    if not jnp.issubdtype(d, jnp.complexfloating):
        return d
    return jnp.dtype(jnp.float32) if d == jnp.dtype(jnp.complex64) \
        else jnp.dtype(jnp.float64)
