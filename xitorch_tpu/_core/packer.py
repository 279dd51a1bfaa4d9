"""Packer: structure <-> flat-array conversion.

Parity with /root/reference/xitorch/_core/packer.py, implemented on JAX
pytrees (``ravel_pytree``).  Aliasing dedup of the reference is unnecessary:
pytree leaves are positional, and JAX accumulates gradients of shared leaves
automatically.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["Packer"]


class Packer:
    """Flatten/unflatten an arbitrary pytree structure to a list of arrays or
    one flat vector.

    Example
    -------
    >>> packer = Packer({"a": jnp.ones(3), "b": (jnp.zeros(2),)})
    >>> flat = packer.get_param_tensor()
    >>> obj2 = packer.construct_from_tensor(flat * 2)
    """

    def __init__(self, obj: Any):
        self._obj = obj
        leaves, treedef = jax.tree_util.tree_flatten(obj)
        self._treedef = treedef
        self._leaves = leaves
        flat, unravel = ravel_pytree(obj)
        self._unravel = unravel
        self._numel = flat.size

    @property
    def obj(self):
        return self._obj

    def get_param_tensor_list(self) -> List[jnp.ndarray]:
        """Return the array leaves of the packed object."""
        return list(self._leaves)

    def get_param_tensor(self) -> jnp.ndarray:
        """Return all leaves flattened into a single 1D array."""
        flat, _ = ravel_pytree(self._obj)
        return flat

    def construct_from_tensor_list(self, leaves: Sequence[jnp.ndarray]) -> Any:
        """Rebuild the structure from a list of array leaves."""
        return jax.tree_util.tree_unflatten(self._treedef, list(leaves))

    def construct_from_tensor(self, flat: jnp.ndarray) -> Any:
        """Rebuild the structure from a single flat array."""
        if flat.size != self._numel:
            raise RuntimeError(
                "Packer.construct_from_tensor expects %d elements, got %d"
                % (self._numel, flat.size))
        return self._unravel(flat)
