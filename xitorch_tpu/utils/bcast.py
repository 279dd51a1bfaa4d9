"""Batch-shape broadcasting helpers.

TPU-native re-implementation of the batch-dimension semantics of the
reference library (see /root/reference/xitorch/_utils/bcast.py:1-27): every
operator and solver in this framework carries arbitrary leading batch
dimensions which broadcast against each other.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

__all__ = ["normalize_bcast_dims", "get_bcasted_dims", "match_dim"]


def normalize_bcast_dims(*shapes: Sequence[int]):
    """Pad the given shapes with 1s at the front so they all have equal rank."""
    maxlen = max(len(shape) for shape in shapes)
    return [[1] * (maxlen - len(shape)) + list(shape) for shape in shapes]


def get_bcasted_dims(*shapes: Sequence[int]) -> Tuple[int, ...]:
    """Return the broadcasted shape of the given shapes."""
    return tuple(jnp.broadcast_shapes(*[tuple(s) for s in shapes]))


def match_dim(*xs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Broadcast all arrays on their leading (non-last) dimensions.

    The last dimension of each input is kept as-is; everything before it is
    broadcast to a common shape.  Used by searchsorted/gather-style kernels.
    """
    batch = get_bcasted_dims(*[x.shape[:-1] for x in xs])
    return tuple(jnp.broadcast_to(x, batch + (x.shape[-1],)) for x in xs)
